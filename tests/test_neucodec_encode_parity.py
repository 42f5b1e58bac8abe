"""Distill-NeuCodec encoder parity vs a torch mirror (multi-scale pool first
block, snake+GRN base units, block-causal local attention with dynamic pos
bias, HuBERT semantic stack, FSQ)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

D = 8                 # distill encoder dim
FB = 2                # first-block branch channels
FC = 4                # first-block conv_1 out
HEADS = 2
DOWN_W, LOCAL_W = 8, 4
DPB_DIM = 6
FSQ_OUT = 12          # fc_sq_prior out
HH = 8                # hubert hidden
HHEADS, HL = 2, 2
HPOS_K, HPOS_G = 4, 2
HINT = 16
H_DIMS = (8, 8, 8)
H_KERNELS = (10, 4, 8)
H_STRIDES = (10, 4, 8)
SEM_OUT = 12
CBD = 8
CBS = 4 ** 8
N_PCM = 600           # pads to 640
POOLS = (1, 5, 11, 21, 45)


class Mirror:
    def __init__(self, seed=0, fan_scale=False):
        g = torch.Generator().manual_seed(seed)
        self.t = {}
        dc = "neucodec.encode.distill.codec_encoder"

        def P(name, *shape, s=0.2, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps production-width stacks O(1)
            # (fixed s at dim 512+ saturates the FSQ bound — all digits
            # 0/3, no parity signal; see the WavTokenizer full-size gate)
            if fan_scale and len(shape) >= 2 and off == 0.0:
                s = s / math.sqrt(math.prod(shape[1:]))
            self.t[name] = torch.randn(*shape, generator=g) * s + off

        for i in range(5):
            P(f"{dc}.encoder.blocks.0.blocks.{i}.1.weight", FB, 1, 7)
            P(f"{dc}.encoder.blocks.0.blocks.{i}.1.bias", FB)
        P(f"{dc}.encoder.blocks.0.conv_1.weight", FC, 5 * FB, 1)
        P(f"{dc}.encoder.blocks.0.conv_1.bias", FC)
        P(f"{dc}.encoder.blocks.0.conv_2.weight", D, FC + 1, 1)
        P(f"{dc}.encoder.blocks.0.conv_2.bias", D)

        def unit(prefix):
            P(prefix + ".dw_conv.weight", D, 1, 7)
            P(prefix + ".dw_conv.bias", D)
            P(prefix + ".pw_conv1.weight", 2 * D, D)
            P(prefix + ".pw_conv1.bias", 2 * D)
            P(prefix + ".act.alpha", 2 * D, s=0.1, off=1.0)
            P(prefix + ".grn.gamma", 2 * D, s=0.1)
            P(prefix + ".grn.beta", 2 * D, s=0.1)
            P(prefix + ".pw_conv2.weight", D, 2 * D)
            P(prefix + ".pw_conv2.bias", D)

        for b in (1, 3, 5, 7):
            unit(f"{dc}.encoder.blocks.{b}.0.module")
        unit(f"{dc}.encoder.blocks.7.1.module")
        for b in (2, 4, 6):
            P(f"{dc}.encoder.blocks.{b}.0.weight", D, D, 4)
            P(f"{dc}.encoder.blocks.{b}.0.bias", D)
        P(f"{dc}.encoder.blocks.8.weight", D, D, 3)
        P(f"{dc}.encoder.blocks.8.bias", D)

        def dpb(prefix):
            P(prefix + ".mlp.0.weight", DPB_DIM, 1)
            P(prefix + ".mlp.0.bias", DPB_DIM)
            P(prefix + ".mlp.2.weight", DPB_DIM, DPB_DIM)
            P(prefix + ".mlp.2.bias", DPB_DIM)
            P(prefix + ".mlp.4.weight", HEADS, DPB_DIM)
            P(prefix + ".mlp.4.bias", HEADS)

        def trans(prefix, depth):
            inner = HEADS * (D // 4)
            ffi = D * 4 * 2 // 3
            for li in range(depth):
                lp = f"{prefix}.layers.{li}"
                P(lp + ".0.norm.weight", D, s=0.1, off=1.0)
                P(lp + ".0.norm.bias", D)
                P(lp + ".0.to_qkv.weight", 3 * inner, D)
                P(lp + ".0.to_out.weight", D, inner)
                P(lp + ".1.0.weight", D, s=0.1, off=1.0)
                P(lp + ".1.0.bias", D)
                P(lp + ".1.1.weight", 2 * ffi, D)
                P(lp + ".1.4.weight", D, ffi)

        dpb(f"{dc}.en_encoder.down_trans.trans.dynamic_pos_bias")
        trans(f"{dc}.en_encoder.down_trans.trans", 2)
        P(f"{dc}.en_encoder.down_trans.down_layer.weight", D, D, 5)
        P(f"{dc}.en_encoder.down_trans.down_layer.bias", D)
        dpb(f"{dc}.en_encoder.local_trans.dynamic_pos_bias")
        trans(f"{dc}.en_encoder.local_trans", 3)
        P("neucodec.encode.fc_sq_prior.w", FSQ_OUT, D)
        P("neucodec.encode.fc_sq_prior.b", FSQ_OUT)

        # HuBERT
        cin = 1
        for li, (dim, k) in enumerate(zip(H_DIMS, H_KERNELS)):
            P(f"neucodec.encode.hubert.feat.conv.{li}.w", dim, cin, k)
            cin = dim
        P("neucodec.encode.hubert.feat.conv.0.gn.w", H_DIMS[0], s=0.1, off=1.0)
        P("neucodec.encode.hubert.feat.conv.0.gn.b", H_DIMS[0])
        P("neucodec.encode.hubert.feature_projection.w", HH, H_DIMS[-1])
        P("neucodec.encode.hubert.feature_projection.b", HH)
        P("neucodec.encode.hubert.encoder.pos_conv.w", HH, HH // HPOS_G, HPOS_K)
        P("neucodec.encode.hubert.encoder.pos_conv.b", HH)
        P("neucodec.encode.hubert.encoder.layer_norm.w", HH, s=0.1, off=1.0)
        P("neucodec.encode.hubert.encoder.layer_norm.b", HH)
        for li in range(HL):
            lp = f"neucodec.encode.hubert.encoder.layers.{li}"
            for n in ("q", "k", "v", "o"):
                P(f"{lp}.att.{n}.w", HH, HH)
                P(f"{lp}.att.{n}.b", HH)
            P(lp + ".ln.w", HH, s=0.1, off=1.0)
            P(lp + ".ln.b", HH)
            P(lp + ".ffn.fc1.w", HINT, HH)
            P(lp + ".ffn.fc1.b", HINT)
            P(lp + ".ffn.fc2.w", HH, HINT)
            P(lp + ".ffn.fc2.b", HH)
            P(lp + ".ffn_ln.w", HH, s=0.1, off=1.0)
            P(lp + ".ffn_ln.b", HH)
        P("neucodec.encode.semantic_encoder.initial_conv.w", SEM_OUT, HH, 3)
        P("neucodec.encode.semantic_encoder.residual.1.w", SEM_OUT, SEM_OUT, 3)
        P("neucodec.encode.semantic_encoder.residual.1.b", SEM_OUT)
        P("neucodec.encode.semantic_encoder.residual.3.w", SEM_OUT, SEM_OUT, 3)
        P("neucodec.encode.semantic_encoder.residual.3.b", SEM_OUT)
        P("neucodec.encode.semantic_encoder.final_conv.w", SEM_OUT, SEM_OUT, 3)
        P("neucodec.encode.fc_prior.w", SEM_OUT + FSQ_OUT, SEM_OUT + FSQ_OUT)
        P("neucodec.encode.fc_prior.b", SEM_OUT + FSQ_OUT)
        P("neucodec.encode.quant.project_in.w", CBD, SEM_OUT + FSQ_OUT)
        P("neucodec.encode.quant.project_in.b", CBD)

    # ------- mirror forward pieces -------

    def _unit(self, x, prefix):
        t = self.t
        h = F.conv1d(x, t[prefix + ".dw_conv.weight"], t[prefix + ".dw_conv.bias"],
                     padding=3, groups=x.shape[1])
        h = h.transpose(1, 2)
        h = h @ t[prefix + ".pw_conv1.weight"].T + t[prefix + ".pw_conv1.bias"]
        a = t[prefix + ".act.alpha"]
        h = h + torch.sin(a * h) ** 2 / (a + 1.1920929e-7)
        h = h + t[prefix + ".grn.gamma"] * h + t[prefix + ".grn.beta"]
        h = h @ t[prefix + ".pw_conv2.weight"].T + t[prefix + ".pw_conv2.bias"]
        return x + h.transpose(1, 2)

    def _dpb(self, prefix, max_dist):
        t = self.t
        d = torch.arange(max_dist, dtype=torch.float32)[:, None]
        h = F.silu(d * t[prefix + ".mlp.0.weight"][:, 0] + t[prefix + ".mlp.0.bias"])
        h = F.silu(h @ t[prefix + ".mlp.2.weight"].T + t[prefix + ".mlp.2.bias"])
        return (h @ t[prefix + ".mlp.4.weight"].T + t[prefix + ".mlp.4.bias"]).T

    def _trans(self, x, prefix, depth, window, max_dist):
        t = self.t
        T = x.shape[2]
        hd = D // 4
        inner = HEADS * hd
        ffi = D * 4 * 2 // 3
        bias = self._dpb(prefix + ".dynamic_pos_bias", max_dist)
        w_blk = max(1, max(2, window) // 2)
        mask = torch.full((HEADS, T, T), float("-inf"))
        for q in range(T):
            k_lo = max(0, q - (q % w_blk + w_blk))
            for k in range(k_lo, q + 1):
                d = q - k
                mask[:, q, k] = bias[:, d] if d < max_dist else 0.0
        x = x.transpose(1, 2)                              # [1, T, D]
        for li in range(depth):
            lp = f"{prefix}.layers.{li}"
            h = F.layer_norm(x, (D,), t[lp + ".0.norm.weight"],
                             t[lp + ".0.norm.bias"], eps=1e-5)
            qkv = h @ t[lp + ".0.to_qkv.weight"].T
            q_, k_, v_ = qkv.chunk(3, -1)
            q_ = q_.view(1, T, HEADS, hd).transpose(1, 2)
            k_ = k_.view(1, T, HEADS, hd).transpose(1, 2)
            v_ = v_.view(1, T, HEADS, hd).transpose(1, 2)
            sc = (q_ @ k_.transpose(-1, -2)) / math.sqrt(hd) + mask[None]
            a = sc.softmax(-1) @ v_
            a = a.transpose(1, 2).reshape(1, T, inner)
            x = x + a @ t[lp + ".0.to_out.weight"].T
            f = F.layer_norm(x, (D,), t[lp + ".1.0.weight"],
                             t[lp + ".1.0.bias"], eps=1e-5)
            f = f @ t[lp + ".1.1.weight"].T
            f = f[..., :ffi] * F.gelu(f[..., ffi:])
            x = x + f @ t[lp + ".1.4.weight"].T
        return x.transpose(1, 2)

    def acoustic(self, pcm):
        t = self.t
        dc = "neucodec.encode.distill.codec_encoder"
        x = torch.as_tensor(pcm).view(1, 1, -1)
        branches = []
        for i, k in enumerate(POOLS):
            h = x.abs()
            if k > 1:
                h = F.max_pool1d(h, k, stride=1, padding=k // 2)
                h = F.avg_pool1d(h, k, stride=1, padding=k // 2,
                                 count_include_pad=True)
            branches.append(F.conv1d(
                h, t[f"{dc}.encoder.blocks.0.blocks.{i}.1.weight"],
                t[f"{dc}.encoder.blocks.0.blocks.{i}.1.bias"], padding=3))
        h = torch.cat(branches, dim=1)
        h = F.conv1d(h, t[f"{dc}.encoder.blocks.0.conv_1.weight"],
                     t[f"{dc}.encoder.blocks.0.conv_1.bias"])
        h = F.gelu(h)
        h = torch.cat([h, x], dim=1)
        x = F.conv1d(h, t[f"{dc}.encoder.blocks.0.conv_2.weight"],
                     t[f"{dc}.encoder.blocks.0.conv_2.bias"])
        for i, b in enumerate((1, 3, 5)):
            x = self._unit(x, f"{dc}.encoder.blocks.{b}.0.module")
            db = (2, 4, 6)[i]
            x = F.conv1d(x, t[f"{dc}.encoder.blocks.{db}.0.weight"],
                         t[f"{dc}.encoder.blocks.{db}.0.bias"], stride=4)
        x = self._unit(x, f"{dc}.encoder.blocks.7.0.module")
        x = self._unit(x, f"{dc}.encoder.blocks.7.1.module")
        x = F.conv1d(x, t[f"{dc}.encoder.blocks.8.weight"],
                     t[f"{dc}.encoder.blocks.8.bias"], padding=1)
        x = self._trans(x, f"{dc}.en_encoder.down_trans.trans", 2,
                        DOWN_W, DOWN_W)
        x = F.conv1d(x, t[f"{dc}.en_encoder.down_trans.down_layer.weight"],
                     t[f"{dc}.en_encoder.down_trans.down_layer.bias"], stride=5)
        x = self._trans(x, f"{dc}.en_encoder.local_trans", 3, LOCAL_W, LOCAL_W)
        x = x.transpose(1, 2)
        return x @ t["neucodec.encode.fc_sq_prior.w"].T + \
            t["neucodec.encode.fc_sq_prior.b"]

    def hubert(self, sem):
        t = self.t
        h = torch.as_tensor(sem).view(1, 1, -1)
        for li, s in enumerate(H_STRIDES):
            h = F.conv1d(h, t[f"neucodec.encode.hubert.feat.conv.{li}.w"],
                         stride=s)
            if li == 0:
                h = F.group_norm(h, H_DIMS[0],
                                 t["neucodec.encode.hubert.feat.conv.0.gn.w"],
                                 t["neucodec.encode.hubert.feat.conv.0.gn.b"],
                                 eps=1e-5)
            h = F.gelu(h)
        h = h.transpose(1, 2)
        h = h @ t["neucodec.encode.hubert.feature_projection.w"].T + \
            t["neucodec.encode.hubert.feature_projection.b"]
        pos = F.conv1d(h.transpose(1, 2),
                       t["neucodec.encode.hubert.encoder.pos_conv.w"],
                       t["neucodec.encode.hubert.encoder.pos_conv.b"],
                       padding=HPOS_K // 2, groups=HPOS_G)
        if HPOS_K % 2 == 0:
            pos = pos[:, :, :-1]
        h = h + F.gelu(pos.transpose(1, 2))
        h = F.layer_norm(h, (HH,), t["neucodec.encode.hubert.encoder.layer_norm.w"],
                         t["neucodec.encode.hubert.encoder.layer_norm.b"], eps=1e-5)
        T = h.shape[1]
        hd = HH // HHEADS
        for li in range(HL):
            lp = f"neucodec.encode.hubert.encoder.layers.{li}"
            q = (h @ t[lp + ".att.q.w"].T + t[lp + ".att.q.b"]).view(1, T, HHEADS, hd).transpose(1, 2)
            k = (h @ t[lp + ".att.k.w"].T + t[lp + ".att.k.b"]).view(1, T, HHEADS, hd).transpose(1, 2)
            v = (h @ t[lp + ".att.v.w"].T + t[lp + ".att.v.b"]).view(1, T, HHEADS, hd).transpose(1, 2)
            a = F.scaled_dot_product_attention(q, k, v)
            a = a.transpose(1, 2).reshape(1, T, HH)
            h = h + (a @ t[lp + ".att.o.w"].T + t[lp + ".att.o.b"])
            h = F.layer_norm(h, (HH,), t[lp + ".ln.w"], t[lp + ".ln.b"], eps=1e-5)
            f = F.gelu(h @ t[lp + ".ffn.fc1.w"].T + t[lp + ".ffn.fc1.b"])
            h = h + (f @ t[lp + ".ffn.fc2.w"].T + t[lp + ".ffn.fc2.b"])
            h = F.layer_norm(h, (HH,), t[lp + ".ffn_ln.w"], t[lp + ".ffn_ln.b"], eps=1e-5)
        return h

    def encode(self, pcm):
        with torch.no_grad():
            n_in = len(pcm)
            pad = 320 - (n_in % 320)
            row = np.pad(pcm, (0, pad)).astype(np.float32)
            sem = np.pad(row, (160, 160))
            ac = self.acoustic(row)
            hs = self.hubert(sem)
            t = self.t
            s = F.conv1d(hs.transpose(1, 2),
                         t["neucodec.encode.semantic_encoder.initial_conv.w"],
                         padding=1)
            s = F.relu(s)
            res = s
            s = F.relu(F.conv1d(s, t["neucodec.encode.semantic_encoder.residual.1.w"],
                                t["neucodec.encode.semantic_encoder.residual.1.b"],
                                padding=1))
            s = F.conv1d(s, t["neucodec.encode.semantic_encoder.residual.3.w"],
                         t["neucodec.encode.semantic_encoder.residual.3.b"],
                         padding=1)
            s = s + res
            s = F.conv1d(s, t["neucodec.encode.semantic_encoder.final_conv.w"],
                         padding=1).transpose(1, 2)
            n = min(s.shape[1], ac.shape[1])
            h = torch.cat([s[:, :n], ac[:, :n]], dim=-1)
            h = h @ t["neucodec.encode.fc_prior.w"].T + t["neucodec.encode.fc_prior.b"]
            z = h @ t["neucodec.encode.quant.project_in.w"].T + \
                t["neucodec.encode.quant.project_in.b"]
            eps = 1e-3
            half_l = 3.0 * (1 + eps) / 2.0
            shift = math.atanh(0.5 / half_l)
            bound = lambda x: half_l * torch.tanh(x + shift) - 0.5
            zq = torch.round(bound(bound(z)))
            basis = torch.tensor([4.0 ** i for i in range(CBD)])
            return ((zq + 2.0) * basis).sum(-1)[0].long().numpy(), z[0].numpy()


@pytest.fixture(scope="module")
def tiny_distill(tmp_path_factory):
    ref = Mirror()
    path = tmp_path_factory.mktemp("dneu") / "dneu.gguf"
    w = GGUFWriter(path, "distill_neucodec")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.hop_size", 480)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", CBS)
    w.add_uint32("codec.codebook_dim", CBD)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", False)
    w.add_string("neucodec.encoder_type", "distill")
    w.add_uint32("neucodec.hubert.hidden_size", HH)
    w.add_uint32("neucodec.hubert.num_heads", HHEADS)
    w.add_uint32("neucodec.hubert.intermediate_size", HINT)
    w.add_uint32("neucodec.hubert.num_layers", HL)
    w.add_uint32("neucodec.hubert.num_conv_pos_embeddings", HPOS_K)
    w.add_uint32("neucodec.hubert.num_conv_pos_embedding_groups", HPOS_G)
    w.add_array("neucodec.hubert.conv_dim", list(H_DIMS))
    w.add_array("neucodec.hubert.conv_kernel", list(H_KERNELS))
    w.add_array("neucodec.hubert.conv_stride", list(H_STRIDES))
    w.add_uint32("neucodec.distill.heads", HEADS)
    w.add_uint32("neucodec.distill.down_window", DOWN_W)
    w.add_uint32("neucodec.distill.local_window", LOCAL_W)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_distill):
    _, ours = tiny_distill
    assert ours.arch == "distill_neucodec"
    assert ours.has_encoder and not ours.has_decoder
    assert ours.encoder_type == 1


def test_encode_parity(tiny_distill):
    ref, ours = tiny_distill
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(N_PCM) * 0.3).astype(np.float32)
    want, z_ref = ref.encode(pcm)

    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    gd = (got[:, 0][:, None] // (4 ** np.arange(CBD))) % 4
    wd = (want[:, None] // (4 ** np.arange(CBD))) % 4
    match = (gd == wd).mean()
    assert match == 1.0, f"digit match {match}\n{gd}\n{wd}\nz={z_ref}"


# ---------------------------------------------------------------------------
# Full-production-shape gate (VERDICT r4 #6). Reference-verified dims
# (reference src/models/neucodec.cpp:749-759, 1026-1049): distill encoder
# dim 512 with 6-head local attention over window 512/4 = 128 (down_trans
# depth 2, local_trans depth 3, down stride 5), fc_sq_prior 512 -> 768,
# HuBERT hidden 768 with conv feature stack 512 x 7 (kernels
# 10,3,3,3,3,2,2 / strides 5,2,2,2,2,2,2), FSQ 4^8 = 65536. FB/FC (first
# multi-scale block), DPB_DIM, and SEM_OUT are production-SCALE estimates
# (the reference reads those shapes from the checkpoint); the gate's
# purpose — surfacing full-width-only bug classes — holds either way.

FULL_DISTILL = dict(D=512, FB=32, FC=256, HEADS=6, DOWN_W=128, LOCAL_W=128,
                    DPB_DIM=128, FSQ_OUT=768, HH=768, HHEADS=12, HL=12,
                    HPOS_K=128, HPOS_G=16, HINT=3072,
                    H_DIMS=(512, 512, 512, 512, 512, 512, 512),
                    H_KERNELS=(10, 3, 3, 3, 3, 2, 2),
                    H_STRIDES=(5, 2, 2, 2, 2, 2, 2), SEM_OUT=768)
N_PCM_FULL = 3277                       # pads to 3520 (11 code frames)


@pytest.fixture(scope="module")
def full_distill(tmp_path_factory):
    """Mirror built + reference encode computed under production globals
    (the mirror reads module globals at call time), then restored."""
    import sys
    m = sys.modules[__name__]
    saved = {k: getattr(m, k) for k in FULL_DISTILL}
    for k, v in FULL_DISTILL.items():
        setattr(m, k, v)
    try:
        ref = Mirror(seed=2, fan_scale=True)
        # widen the FSQ latent so all 4 levels per digit are exercised
        # (fan-scaled project_in leaves z at ~0.2 std; bound() then uses
        # only the middle two levels — weak parity signal)
        ref.t["neucodec.encode.quant.project_in.w"] *= 8.0
        ref.t["neucodec.encode.quant.project_in.b"] *= 8.0
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(N_PCM_FULL) * 0.3).astype(np.float32)
        want, z_ref = ref.encode(pcm)

        path = tmp_path_factory.mktemp("dneu_full") / "dneu_full.gguf"
        w = GGUFWriter(path, "distill_neucodec")
        w.add_uint32("codec.sample_rate", 24000)
        w.add_uint32("codec.hop_size", 480)
        w.add_uint32("codec.n_q", 1)
        w.add_uint32("codec.codebook_size", CBS)
        w.add_uint32("codec.codebook_dim", CBD)
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", False)
        w.add_string("neucodec.encoder_type", "distill")
        w.add_uint32("neucodec.hubert.hidden_size", m.HH)
        w.add_uint32("neucodec.hubert.num_heads", m.HHEADS)
        w.add_uint32("neucodec.hubert.intermediate_size", m.HINT)
        w.add_uint32("neucodec.hubert.num_layers", m.HL)
        w.add_uint32("neucodec.hubert.num_conv_pos_embeddings", m.HPOS_K)
        w.add_uint32("neucodec.hubert.num_conv_pos_embedding_groups",
                     m.HPOS_G)
        w.add_array("neucodec.hubert.conv_dim", list(m.H_DIMS))
        w.add_array("neucodec.hubert.conv_kernel", list(m.H_KERNELS))
        w.add_array("neucodec.hubert.conv_stride", list(m.H_STRIDES))
        w.add_uint32("neucodec.distill.heads", m.HEADS)
        w.add_uint32("neucodec.distill.down_window", m.DOWN_W)
        w.add_uint32("neucodec.distill.local_window", m.LOCAL_W)
        for name, tensor in ref.t.items():
            w.add_tensor(name, tensor.numpy())
        w.write()
    finally:
        for k, v in saved.items():
            setattr(m, k, v)

    import codec_tpu

    return pcm, want, z_ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_encode_exact_or_near_boundary(full_distill):
    """FSQ digits match the mirror exactly except values provably at a
    rounding boundary (same proof as the xcodec2 full-size gate)."""
    pcm, want, z_ref, ours = full_distill
    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    gd = (got[:, 0][:, None] // (4 ** np.arange(CBD))) % 4
    wd = (want[:, None] // (4 ** np.arange(CBD))) % 4
    bad = np.argwhere(gd != wd)
    assert len(bad) <= max(2, gd.size // 50), \
        f"{len(bad)}/{gd.size} FSQ digits diverge — not boundary noise"
    if len(bad):
        z64 = z_ref.astype(np.float64)
        eps = 1e-3
        half_l = 3.0 * (1 + eps) / 2.0
        shift = math.atanh(0.5 / half_l)
        zb = half_l * np.tanh(half_l * np.tanh(z64 + shift) - 0.5 + shift) - 0.5
        for fr, d in bad:
            frac = abs(zb[fr, d] - np.floor(zb[fr, d]) - 0.5)
            assert frac < 1e-3, \
                f"frame {fr} digit {d}: |frac-0.5|={frac:.2e} — real mismatch"

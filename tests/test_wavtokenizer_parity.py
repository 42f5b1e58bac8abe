"""WavTokenizer parity vs an independent torch mirror of the original
architecture (WavTokenizer isn't in transformers; the torch modules below
follow the upstream novateur/WavTokenizer structure: EnCodec encoder with
asymmetric reflect pads + skip LSTM, single euclidean VQ, Vocos backbone
with AdaLayerNorm + diffusion pos_net, ISTFT head with "same" padding)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

DIM = 64          # backbone dim (divisible by 32 for GroupNorm)
CB_DIM = 32       # encoder latent / codebook dim
V = 64            # codebook size
N_FFT = 480
HOP = 320         # 2*4*5*8
INTER = 96
N_CNX = 2


def sconv(x, w, b, stride=1):
    k = w.shape[2]
    pt = k - stride
    t = x.shape[-1]
    extra = -(-t // stride) * stride - t
    pad_r = pt // 2
    pad_l = pt - pad_r
    x = F.pad(x, (pad_l, pad_r + extra), mode="reflect")
    return F.conv1d(x, w, b, stride=stride)


class TorchWT(nn.Module):
    def __init__(self, dim=DIM, cb_dim=CB_DIM, v=V, n_fft=N_FFT,
                 inter=INTER, n_cnx=N_CNX, fan_scale=False):
        super().__init__()
        self.dim, self.cb_dim, self.v, self.n_fft, self.inter, self.n_cnx = \
            dim, cb_dim, v, n_fft, inter, n_cnx
        g = torch.Generator().manual_seed(0)

        def W(*shape, s=0.2):
            # fan_scale: 1/sqrt(fan_in) so production-width stacks keep
            # activations O(1) — fixed s=0.2 at dim 512+ blows the encoder
            # latent to ~5e8, and f32 argmin over distances of that
            # magnitude is pure reduction-order noise (no parity signal)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            return nn.Parameter(torch.randn(*shape, generator=g) * s)

        # ---- encoder (EnCodec): model.0 conv k7, 4 stages, lstm, model.15
        ch = (cb_dim, cb_dim, cb_dim, cb_dim, cb_dim)  # keep uniform for simplicity
        self.e_c0_w, self.e_c0_b = W(cb_dim, 1, 7), W(cb_dim)
        self.stages = nn.ParameterList()
        stage_params = []
        for i in range(4):
            p = {
                "b1_w": W(cb_dim // 2, cb_dim, 3), "b1_b": W(cb_dim // 2),
                "b3_w": W(cb_dim, cb_dim // 2, 1), "b3_b": W(cb_dim),
                "sc_w": W(cb_dim, cb_dim, 1), "sc_b": W(cb_dim),
            }
            stage_params.append(p)
        self.stage_params = stage_params
        ks = (4, 8, 10, 16)
        self.dn = [{"w": W(cb_dim, cb_dim, ks[i]), "b": W(cb_dim)} for i in range(4)]
        self.lstm = [{
            "w_ih": W(4 * cb_dim, cb_dim), "w_hh": W(4 * cb_dim, cb_dim),
            "b_ih": W(4 * cb_dim), "b_hh": W(4 * cb_dim)} for _ in range(2)]
        self.e_out_w, self.e_out_b = W(cb_dim, cb_dim, 7), W(cb_dim)

        self.codebook = W(v, cb_dim, s=1.0)

        # ---- decoder
        self.embed_w, self.embed_b = W(dim, cb_dim, 7), W(dim)
        self.pos = []
        for _ in range(4):
            self.pos.append({
                "n1_w": W(dim, s=1.0), "n1_b": W(dim),
                "c1_w": W(dim, dim, 3), "c1_b": W(dim),
                "n2_w": W(dim, s=1.0), "n2_b": W(dim),
                "c2_w": W(dim, dim, 3), "c2_b": W(dim),
            })
        self.attn = {
            "n_w": W(dim, s=1.0), "n_b": W(dim),
            "q_w": W(dim, dim, 1), "q_b": W(dim),
            "k_w": W(dim, dim, 1), "k_b": W(dim),
            "v_w": W(dim, dim, 1), "v_b": W(dim),
            "o_w": W(dim, dim, 1), "o_b": W(dim),
        }
        self.gn_w, self.gn_b = W(dim, s=1.0), W(dim)
        # adanorm embedding tables (4 bandwidths; row 0 used)
        self.ada_scale = W(4, dim, s=1.0)
        self.ada_shift = W(4, dim)
        self.cnx = []
        for _ in range(n_cnx):
            self.cnx.append({
                "dw_w": W(dim, 1, 7), "dw_b": W(dim),
                "ns": W(4, dim, s=1.0), "nb": W(4, dim),
                "pw1_w": W(inter, dim), "pw1_b": W(inter),
                "pw2_w": W(dim, inter), "pw2_b": W(dim),
                "gamma": W(dim, s=1.0),
            })
        self.fln_w, self.fln_b = W(dim, s=1.0), W(dim)
        self.head_w, self.head_b = W(n_fft + 2, dim), W(n_fft + 2)

    # ---- encode ----------------------------------------------------------
    def encode(self, pcm, return_z=False):
        x = sconv(pcm, self.e_c0_w, self.e_c0_b)
        for i, stride in enumerate((2, 4, 5, 8)):
            p = self.stage_params[i]
            h = F.elu(x)
            h = sconv(h, p["b1_w"], p["b1_b"])
            h = F.elu(h)
            h = sconv(h, p["b3_w"], p["b3_b"])
            x = sconv(x, p["sc_w"], p["sc_b"]) + h
            x = F.elu(x)
            x = sconv(x, self.dn[i]["w"], self.dn[i]["b"], stride=stride)
        # lstm (2 layers, skip)
        y = x.permute(0, 2, 1)  # [B, T, C]
        inp = y
        for lw in self.lstm:
            outs = []
            h = torch.zeros(y.shape[0], self.cb_dim)
            c = torch.zeros_like(h)
            for t in range(y.shape[1]):
                gates = y[:, t] @ lw["w_ih"].T + h @ lw["w_hh"].T + lw["b_ih"] + lw["b_hh"]
                i_, f_, g_, o_ = gates.chunk(4, -1)
                c = torch.sigmoid(f_) * c + torch.sigmoid(i_) * torch.tanh(g_)
                h = torch.sigmoid(o_) * torch.tanh(c)
                outs.append(h)
            y = torch.stack(outs, 1)
        y = y + inp
        x = y.permute(0, 2, 1)
        x = F.elu(x)
        x = sconv(x, self.e_out_w, self.e_out_b)                # [B, C, T]
        z = x.permute(0, 2, 1)                                   # [B, T, C]
        if return_z:
            return z
        d2 = ((z[:, :, None, :] - self.codebook[None, None]) ** 2).sum(-1)
        return d2.argmin(-1)                                     # [B, T]

    # ---- decode ----------------------------------------------------------
    def decode(self, codes):
        x = self.codebook[codes].permute(0, 2, 1)                # [B, C, T]
        x = F.conv1d(x, self.embed_w, self.embed_b, padding=3)

        def gn(v, w, b):
            return F.group_norm(v, 32, w, b, eps=1e-6)

        def resblk(v, p):
            h = gn(v, p["n1_w"], p["n1_b"])
            h = F.silu(h)
            h = F.conv1d(h, p["c1_w"], p["c1_b"], padding=1)
            h = gn(h, p["n2_w"], p["n2_b"])
            h = F.silu(h)
            h = F.conv1d(h, p["c2_w"], p["c2_b"], padding=1)
            return v + h

        x = resblk(x, self.pos[0])
        x = resblk(x, self.pos[1])
        # attn
        a = self.attn
        h = gn(x, a["n_w"], a["n_b"])
        q = F.conv1d(h, a["q_w"], a["q_b"]).permute(0, 2, 1)
        k = F.conv1d(h, a["k_w"], a["k_b"]).permute(0, 2, 1)
        v = F.conv1d(h, a["v_w"], a["v_b"]).permute(0, 2, 1)
        w_ = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(self.dim), -1)
        ctx = (w_ @ v).permute(0, 2, 1)
        x = x + F.conv1d(ctx, a["o_w"], a["o_b"])
        x = resblk(x, self.pos[2])
        x = resblk(x, self.pos[3])
        x = gn(x, self.gn_w, self.gn_b)

        y = x.permute(0, 2, 1)                                   # [B, T, C]
        y = F.layer_norm(y, (self.dim,), eps=1e-6) * self.ada_scale[0] + self.ada_shift[0]
        for p in self.cnx:
            r = y
            h = F.conv1d(y.permute(0, 2, 1), p["dw_w"], p["dw_b"], padding=3,
                         groups=self.dim).permute(0, 2, 1)
            h = F.layer_norm(h, (self.dim,), eps=1e-6) * p["ns"][0] + p["nb"][0]
            h = h @ p["pw1_w"].T + p["pw1_b"]
            h = F.gelu(h)
            h = h @ p["pw2_w"].T + p["pw2_b"]
            y = r + h * p["gamma"]
        y = F.layer_norm(y, (self.dim,), weight=self.fln_w, bias=self.fln_b, eps=1e-6)
        head = y @ self.head_w.T + self.head_b                   # [B, T, self.n_fft+2]

        # ISTFT "same" padding
        logmag, phase = head.chunk(2, -1)
        mag = torch.clamp(torch.exp(logmag), max=1e2)
        S = mag * torch.exp(1j * phase)
        frames = torch.fft.irfft(S, self.n_fft, dim=-1)
        win = torch.hann_window(self.n_fft)
        frames = frames * win
        T = frames.shape[1]
        out = torch.zeros(frames.shape[0], (T - 1) * HOP + self.n_fft)
        env = torch.zeros_like(out)
        for t in range(T):
            out[:, t * HOP:t * HOP + self.n_fft] += frames[:, t]
            env[:, t * HOP:t * HOP + self.n_fft] += win ** 2
        out = out / env.clamp(min=1e-11)
        pad = (self.n_fft - HOP) // 2
        if pad > 0:
            out = out[:, pad:-pad]
        return out

    # ---- GGUF-source state dict (original WavTokenizer naming) -----------
    def source_state_dict(self):
        sd = {}
        enc = "feature_extractor.encodec.encoder.model"
        sd[f"{enc}.0.conv.conv.weight"] = self.e_c0_w
        sd[f"{enc}.0.conv.conv.bias"] = self.e_c0_b
        for i, mi in enumerate((1, 4, 7, 10)):
            p = self.stage_params[i]
            sd[f"{enc}.{mi}.block.1.conv.conv.weight"] = p["b1_w"]
            sd[f"{enc}.{mi}.block.1.conv.conv.bias"] = p["b1_b"]
            sd[f"{enc}.{mi}.block.3.conv.conv.weight"] = p["b3_w"]
            sd[f"{enc}.{mi}.block.3.conv.conv.bias"] = p["b3_b"]
            sd[f"{enc}.{mi}.shortcut.conv.conv.weight"] = p["sc_w"]
            sd[f"{enc}.{mi}.shortcut.conv.conv.bias"] = p["sc_b"]
            sd[f"{enc}.{mi + 2}.conv.conv.weight"] = self.dn[i]["w"]
            sd[f"{enc}.{mi + 2}.conv.conv.bias"] = self.dn[i]["b"]
        for li, lw in enumerate(self.lstm):
            for nm, t in (("weight_ih", lw["w_ih"]), ("weight_hh", lw["w_hh"]),
                          ("bias_ih", lw["b_ih"]), ("bias_hh", lw["b_hh"])):
                sd[f"{enc}.13.lstm.{nm}_l{li}"] = t
        sd[f"{enc}.15.conv.conv.weight"] = self.e_out_w
        sd[f"{enc}.15.conv.conv.bias"] = self.e_out_b
        sd["feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed"] = self.codebook

        sd["backbone.embed.weight"] = self.embed_w
        sd["backbone.embed.bias"] = self.embed_b
        pos_ids = (0, 1, 3, 4)
        for pi, p in zip(pos_ids, self.pos):
            pre = f"backbone.pos_net.{pi}"
            sd[f"{pre}.norm1.weight"] = p["n1_w"]
            sd[f"{pre}.norm1.bias"] = p["n1_b"]
            sd[f"{pre}.conv1.weight"] = p["c1_w"]
            sd[f"{pre}.conv1.bias"] = p["c1_b"]
            sd[f"{pre}.norm2.weight"] = p["n2_w"]
            sd[f"{pre}.norm2.bias"] = p["n2_b"]
            sd[f"{pre}.conv2.weight"] = p["c2_w"]
            sd[f"{pre}.conv2.bias"] = p["c2_b"]
        a = self.attn
        sd["backbone.pos_net.2.norm.weight"] = a["n_w"]
        sd["backbone.pos_net.2.norm.bias"] = a["n_b"]
        for k, n in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "proj_out")):
            sd[f"backbone.pos_net.2.{n}.weight"] = a[f"{k}_w"]
            sd[f"backbone.pos_net.2.{n}.bias"] = a[f"{k}_b"]
        sd["backbone.pos_net.5.weight"] = self.gn_w
        sd["backbone.pos_net.5.bias"] = self.gn_b
        sd["backbone.norm.scale.weight"] = self.ada_scale
        sd["backbone.norm.shift.weight"] = self.ada_shift
        for ci, p in enumerate(self.cnx):
            pre = f"backbone.convnext.{ci}"
            sd[f"{pre}.dwconv.weight"] = p["dw_w"]
            sd[f"{pre}.dwconv.bias"] = p["dw_b"]
            sd[f"{pre}.norm.scale.weight"] = p["ns"]
            sd[f"{pre}.norm.shift.weight"] = p["nb"]
            sd[f"{pre}.pwconv1.weight"] = p["pw1_w"]
            sd[f"{pre}.pwconv1.bias"] = p["pw1_b"]
            sd[f"{pre}.pwconv2.weight"] = p["pw2_w"]
            sd[f"{pre}.pwconv2.bias"] = p["pw2_b"]
            sd[f"{pre}.gamma"] = p["gamma"]
        sd["backbone.final_layer_norm.weight"] = self.fln_w
        sd["backbone.final_layer_norm.bias"] = self.fln_b
        sd["head.out.weight"] = self.head_w
        sd["head.out.bias"] = self.head_b
        return {k: t.detach().numpy() for k, t in sd.items()}


@pytest.fixture(scope="module")
def tiny_wt(tmp_path_factory):
    ref = TorchWT().eval()
    from codec_tpu.convert import get_converter

    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    path = tmp_path_factory.mktemp("wt") / "tiny_wt.gguf"
    c.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return ref, ours


def test_config(tiny_wt):
    ref, ours = tiny_wt
    assert ours.arch == "wavtokenizer"
    assert ours.n_q == 1
    assert ours.codebook_size == V
    assert ours.hop_size == HOP
    assert ours.has_encoder and ours.has_decoder
    assert ours.cfg.use_adanorm and ours.cfg.use_pos_net
    assert ours.cfg.n_convnext == N_CNX


def test_decode_parity(tiny_wt):
    ref, ours = tiny_wt
    rng = np.random.default_rng(0)
    t = 9
    codes = rng.integers(0, V, (1, t, 1)).astype(np.int32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes[..., 0])).numpy()[0]
    got = ours.decode(codes[0])
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    err = np.abs(got - want).max()
    assert corr > 0.9999, f"corr={corr}"
    assert err < 1e-3, f"err={err}"


def test_encode_parity(tiny_wt):
    ref, ours = tiny_wt
    rng = np.random.default_rng(1)
    n = HOP * 5 + 77
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    mismatch = int((got[:, 0] != want).sum())
    assert mismatch == 0, f"{mismatch}/{len(want)} codes differ"


# ---------------------------------------------------------------------------
# Full-production-shape gate (VERDICT r4 #6). Dims: the shipped checkpoint's
# config name encodes nq1 / codebook 4096 / vq+encoder dim 512
# (novateur/WavTokenizer WavTokenizer_small_320_24k_4096 ships
# wavtokenizer_smalldata_frame75_3s_nq1_code4096_dim512_kmeans200_attn.yaml —
# reference tests/e2e/config.json), the reference hard-codes the encoder
# LSTM at dim 512 (src/models/wavtokenizer.cpp:729), and the upstream
# VocosBackbone runs dim 768 / intermediate 2304 / 12 ConvNeXt blocks with
# an ISTFT head at n_fft 1280 = 4*hop. The round-4 Mimi full-size gate
# caught a tail-padding bug reduced dims hid — this hunts the same class
# here (lane padding at 768/2304 channels, 512-d euclid search over 4096
# entries, ISTFT "same" cropping at production n_fft).

FULL_DIM, FULL_CB_DIM, FULL_V = 768, 512, 4096
FULL_N_FFT, FULL_INTER, FULL_N_CNX = 1280, 2304, 12
T_FULL = 96


@pytest.fixture(scope="module")
def full_wt(tmp_path_factory):
    ref = TorchWT(dim=FULL_DIM, cb_dim=FULL_CB_DIM, v=FULL_V,
                  n_fft=FULL_N_FFT, inter=FULL_INTER, n_cnx=FULL_N_CNX,
                  fan_scale=True).eval()
    from codec_tpu.convert import get_converter

    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    path = tmp_path_factory.mktemp("wt_full") / "wt_full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_corr(full_wt):
    ref, ours = full_wt
    rng = np.random.default_rng(0)
    codes = rng.integers(0, FULL_V, (1, T_FULL, 1)).astype(np.int32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes[..., 0])).numpy()[0]
    got = ours.decode(codes[0])
    assert got.shape == want.shape == (T_FULL * HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    err = float(np.abs(got - want).max())
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert err < 5e-3, f"full-size decode max abs err={err}"


@pytest.mark.slow
def test_fullsize_encode_exact_or_near_tie(full_wt):
    """Codes match the mirror bit-for-bit except provable f32 near-ties
    (relative euclid-distance margin < 1e-4 in f64 at the mirror's
    latent): 512-d search over 4096 entries makes real ties rare, so a
    lane-padding/bucketing-class bug fails loudly here."""
    ref, ours = full_wt
    rng = np.random.default_rng(1)
    n = HOP * (T_FULL - 1) + 231          # non-frame-aligned tail
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
        z = ref.encode(torch.from_numpy(pcm)[None, None],
                       return_z=True)[0].double()            # [T, C]
        cb = ref.codebook.double()
    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    bad = np.where(got[:, 0] != want)[0]
    assert len(bad) <= max(2, len(want) // 50), \
        f"{len(bad)}/{len(want)} codes diverge — not tie noise"
    for fr in bad:
        d2 = ((z[int(fr), None] - cb) ** 2).sum(-1)
        margin = float((d2[int(got[fr, 0])] - d2[int(want[fr])])
                       / d2[int(want[fr])].clamp(min=1e-12))
        assert abs(margin) < 1e-4, \
            f"frame {fr}: rel margin {margin:.2e} — a real mismatch"

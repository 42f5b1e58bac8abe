"""NeuCodec / Distill-NeuCodec decode path, TPU-native.

Reference behavior: src/models/neucodec.cpp (codec_neu_build_decode:542):
single-codebook lookup → project_out → fc_post_a → embed conv k7 →
2 prior resnet blocks (GroupNorm32 eps1e-6, SiLU, conv k3) → N Vocos-ish
transformer blocks (RMSNorm eps1e-6, fused QKV no-bias, RoPE-NORMAL,
non-causal SDPA, SiLU MLP) → 2 post resnet blocks → final LN → iSTFT head
(optional baked window) → 24 kHz PCM.

Encode (distill_neucodec only — matching the reference, which returns
NOT_SUPPORTED for the base encoder_type): distill acoustic encoder
(multi-scale abs/max/avg-pool first block → ConvNeXt-ish base units with
snake+GRN → stride-4 downsamples → block-causal local-attention
transformers with dynamic position bias → stride-5 down) ‖ HuBERT semantic
stack (conv feature extractor, pos-conv, post-LN transformer) → semantic
conv encoder → concat → fc_prior → FSQ (levels [4]^8) → codes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, conv, norms, rope
from ..ops.attn import sdpa
from ..ops.istft import istft_from_head
from ..runtime.model import CodecModel, CodecError


@dataclass(frozen=True)
class NeuConfig:
    sample_rate: int = 24000
    hop_size: int = 480
    n_q: int = 1
    codebook_size: int = 65536
    codebook_dim: int = 8
    vq_dim: int = 1024
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    head_dim: int = 64
    rope_theta: float = 10000.0

    @classmethod
    def from_gguf(cls, r: GGUFReader, prefix: str = "neucodec",
                  **overrides) -> "NeuConfig":
        d = cls(**overrides)
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", d.sample_rate),
            hop_size=r.get_i32("codec.hop_size", d.hop_size),
            n_q=r.get_i32("codec.n_q", d.n_q),
            codebook_size=r.get_i32("codec.codebook_size", d.codebook_size),
            codebook_dim=r.get_i32("codec.codebook_dim", d.codebook_dim),
            vq_dim=r.get_i32(f"{prefix}.vq_dim", d.vq_dim),
            hidden_dim=r.get_i32(f"{prefix}.hidden_dim", d.hidden_dim),
            num_layers=r.get_i32(f"{prefix}.num_layers", d.num_layers),
            num_heads=r.get_i32(f"{prefix}.num_heads", d.num_heads),
            head_dim=r.get_i32(f"{prefix}.head_dim", d.head_dim),
            rope_theta=r.get_f32(f"{prefix}.rope_theta", d.rope_theta),
        )


def load_neu_params(r: GGUFReader, cfg: NeuConfig, dtype=jnp.float32,
                    prefix: str = "neucodec"):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    d = f"{prefix}.decode"
    p: Dict[str, Any] = {
        "cb": g(f"{d}.codebook"),                    # [V, cb_dim]
        "qp_w": g(f"{d}.quant.project_out.w"),
        "qp_b": g(f"{d}.quant.project_out.b"),
        "fc_w": g(f"{d}.fc_post_a.w"),
        "fc_b": g(f"{d}.fc_post_a.b"),
        "embed_w": conv.prepare_conv_weight(r.get(f"{d}.embed.w")).astype(dtype),
        "embed_b": g(f"{d}.embed.b"),
        "fln_w": g(f"{d}.final_ln.w"),
        "fln_b": g(f"{d}.final_ln.b"),
        "head_w": g(f"{d}.head.out.w"),
        "head_b": g(f"{d}.head.out.b"),
        "window": (g(f"{d}.istft.window").reshape(-1)
                   if r.has_tensor(f"{d}.istft.window") else None),
    }
    for group, n in (("prior", 2), ("post", 2)):
        blocks = []
        for li in range(n):
            pre = f"{d}.{group}.{li}"
            blocks.append({
                "n1_w": g(pre + ".norm1.w"), "n1_b": g(pre + ".norm1.b"),
                "c1_w": conv.prepare_conv_weight(r.get(pre + ".conv1.w")).astype(dtype),
                "c1_b": g(pre + ".conv1.b"),
                "n2_w": g(pre + ".norm2.w"), "n2_b": g(pre + ".norm2.b"),
                "c2_w": conv.prepare_conv_weight(r.get(pre + ".conv2.w")).astype(dtype),
                "c2_b": g(pre + ".conv2.b"),
            })
        p[group] = blocks
    layers = []
    for li in range(cfg.num_layers):
        pre = f"{d}.transformer.{li}"
        layers.append({
            "att_norm": g(pre + ".att_norm.w"), "ffn_norm": g(pre + ".ffn_norm.w"),
            "c_attn": g(pre + ".att.c_attn.w"), "c_proj": g(pre + ".att.c_proj.w"),
            "fc1": g(pre + ".mlp.fc1.w"), "fc2": g(pre + ".mlp.fc2.w"),
        })
    p["layers"] = layers
    return p


def _resnet(x, b):
    h = norms.group_norm(x, b["n1_w"], b["n1_b"], 32, 1e-6)
    h = act.silu(h)
    h = conv.conv1d(h, b["c1_w"], b["c1_b"], padding=1)
    h = norms.group_norm(h, b["n2_w"], b["n2_b"], 32, 1e-6)
    h = act.silu(h)
    h = conv.conv1d(h, b["c2_w"], b["c2_b"], padding=1)
    return x + h


def neu_decode_head_fn(params, codes: jax.Array, cfg: NeuConfig) -> jax.Array:
    """codes [B, T, 1] → head [B, T, n_fft+2]."""
    codes = jnp.clip(codes[..., 0], 0, cfg.codebook_size - 1)
    z = jnp.take(params["cb"], codes, axis=0)               # [B, T, cb_dim]
    x = z @ params["qp_w"].T + params["qp_b"]               # [B, T, vq_dim]
    x = x @ params["fc_w"].T + params["fc_b"]               # [B, T, hidden]
    x = conv.conv1d(x, params["embed_w"], params["embed_b"], padding=3)
    for b in params["prior"]:
        x = _resnet(x, b)
    bsz, t, c = x.shape
    for lw in params["layers"]:
        h = norms.rms_norm(x, lw["att_norm"], 1e-6)
        qkv = h @ lw["c_attn"].T
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bsz, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        q = rope.apply_rope(q, theta=cfg.rope_theta, neox=False)
        k = rope.apply_rope(k, theta=cfg.rope_theta, neox=False)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (cfg.head_dim ** 0.5)
        wts = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", wts, v).transpose(0, 2, 1, 3).reshape(bsz, t, c)
        x = x + ctx @ lw["c_proj"].T
        m = norms.rms_norm(x, lw["ffn_norm"], 1e-6)
        x = x + act.silu(m @ lw["fc1"].T) @ lw["fc2"].T
    for b in params["post"]:
        x = _resnet(x, b)
    x = norms.layer_norm(x, params["fln_w"], params["fln_b"], 1e-6)
    return x @ params["head_w"].T + params["head_b"]


def neu_decode_fn(params, codes: jax.Array, cfg: NeuConfig) -> jax.Array:
    head = neu_decode_head_fn(params, codes, cfg)
    return istft_from_head(head, cfg.hop_size, window=params["window"])


class NeuCodec(CodecModel):
    arch = "neucodec"
    causal_time = False

    encoder_type = 0

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = NeuConfig.from_gguf(reader)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.vq_dim
        self.has_decoder = reader.get_bool("codec.has_decoder", True)
        if self.has_decoder:
            self.params = load_neu_params(reader, self.cfg,
                                          dtype=self.compute_dtype)
        et = reader.get_str("neucodec.encoder_type", "")
        if et:
            self.encoder_type = 1 if et == "distill" else 0
        # reference: encode is implemented only for the distill encoder
        self.has_encoder = (reader.get_bool("codec.has_encoder", False)
                            and self.encoder_type == 1)
        if self.has_encoder:
            self.enc_cfg = NeuEncConfig.from_gguf(reader)
            self.enc_params = load_neu_encode_params(reader, self.enc_cfg,
                                                     dtype=self.compute_dtype)

    def _decode_impl(self, codes, n_q):
        return neu_decode_fn(self.params, codes, self.cfg)

    def encode(self, pcm, n_q: int = 0):
        """Distill encode (reference: codec_neu_encode_graph — pcm padded
        UP to the next 320 multiple, semantic input gets an extra 160-sample
        zero lead/tail)."""
        if not self.has_encoder:
            raise CodecError(f"{self.arch}: model has no encoder"
                             if self.encoder_type == 1 else
                             "NeuCodec encoder_type not supported "
                             "(only distill implemented)")
        if n_q not in (0, 1):
            raise CodecError("NeuCodec encode n_q must be 0 or 1")
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        outs = []
        for row in pcm:
            n_in = len(row)
            pad = 320 - (n_in % 320)          # reference pads even when aligned
            row_pad = np.pad(row, (0, pad))
            sem = np.pad(row_pad, (160, 160))
            fn = self._jitted(
                ("enc", len(row_pad)),
                lambda: lambda x, s: neu_encode_fn(
                    self.enc_params, x, s, self.enc_cfg,
                    self.cfg.codebook_dim))
            codes = np.asarray(jax.block_until_ready(
                fn(self._place_f(row_pad[None]), self._place_f(sem[None]))))
            outs.append(np.clip(codes[0], 0, self.codebook_size - 1))
        return outs[0] if squeeze else np.stack(outs)


class DistillNeuCodec(NeuCodec):
    arch = "distill_neucodec"
    encoder_type = 1


# =====================================================================
# Distill encoder (reference: codec_neu_build_encode, neucodec.cpp:956 —
# the reference supports encode only for encoder_type == "distill")
# =====================================================================

POOL_KERNELS = (1, 5, 11, 21, 45)


def neu_encode_name(name: str) -> str:
    """Encode-side tensors are stored under FNV-1a-64 digests (`nce.<hex>`)
    to fit the 63-char GGUF tensor-name limit (reference:
    codec_neu_encode_name, neucodec.cpp:49 / converter _enc_name)."""
    if not name.startswith("neucodec.encode."):
        return name
    h = 1469598103934665603
    for b in name.encode("utf-8"):
        h ^= b
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return f"nce.{h:016x}"


def _neu_get(r: GGUFReader, name: str):
    """Resolve a logical encode tensor: plain name first (tiny test
    fixtures), else the hashed wire name (real converted GGUFs)."""
    if r.has_tensor(name):
        return r.get(name)
    return r.get(neu_encode_name(name))
HUBERT_DEFAULT_DIM = (512, 512, 512, 512, 512, 512, 512)
HUBERT_DEFAULT_KERNEL = (10, 3, 3, 3, 3, 2, 2)
HUBERT_DEFAULT_STRIDE = (5, 2, 2, 2, 2, 2, 2)


@dataclass(frozen=True)
class NeuEncConfig:
    hubert_hidden: int = 768
    hubert_heads: int = 12
    hubert_intermediate: int = 3072
    hubert_layers: int = 12
    hubert_pos_k: int = 128
    hubert_pos_groups: int = 16
    hubert_ln_eps: float = 1e-5
    hubert_conv_dim: tuple = HUBERT_DEFAULT_DIM
    hubert_conv_kernel: tuple = HUBERT_DEFAULT_KERNEL
    hubert_conv_stride: tuple = HUBERT_DEFAULT_STRIDE
    distill_heads: int = 6
    down_window: int = 3000
    local_window: int = 600

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "NeuEncConfig":
        d = cls()
        arr = lambda k, v: tuple(r.get_arr(f"neucodec.hubert.{k}") or v)
        return cls(
            hubert_hidden=r.get_i32("neucodec.hubert.hidden_size", d.hubert_hidden),
            hubert_heads=r.get_i32("neucodec.hubert.num_heads", d.hubert_heads),
            hubert_intermediate=r.get_i32("neucodec.hubert.intermediate_size",
                                          d.hubert_intermediate),
            hubert_layers=r.get_i32("neucodec.hubert.num_layers", d.hubert_layers),
            hubert_pos_k=r.get_i32("neucodec.hubert.num_conv_pos_embeddings",
                                   d.hubert_pos_k),
            hubert_pos_groups=r.get_i32(
                "neucodec.hubert.num_conv_pos_embedding_groups", d.hubert_pos_groups),
            hubert_ln_eps=r.get_f32("neucodec.hubert.layer_norm_eps", d.hubert_ln_eps),
            hubert_conv_dim=arr("conv_dim", d.hubert_conv_dim),
            hubert_conv_kernel=arr("conv_kernel", d.hubert_conv_kernel),
            hubert_conv_stride=arr("conv_stride", d.hubert_conv_stride),
            distill_heads=r.get_i32("neucodec.distill.heads", d.distill_heads),
            down_window=r.get_i32("neucodec.distill.down_window", d.down_window),
            local_window=r.get_i32("neucodec.distill.local_window", d.local_window),
        )


def _pool1d_same(x, k: int, op: str):
    """Stride-1 pool with zero pad k//2 (PyTorch MaxPool1d / AvgPool1d with
    count_include_pad=True). x [B, T, C]; output length T - (1 - k % 2)."""
    if k == 1:
        return x
    import jax.lax as lax

    pad = k // 2
    if op == "max":
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        return lax.reduce_window(xp, -jnp.inf, lax.max, (1, k, 1), (1, 1, 1),
                                 "VALID")
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    s = lax.reduce_window(xp, 0.0, lax.add, (1, k, 1), (1, 1, 1), "VALID")
    return s / k


def _grn(x, gamma, beta):
    """distill GRN (channels-last, T=1 reduction ⇒ x + γ·x + β;
    reference codec_neu_grn_tc)."""
    return x + gamma * x + beta


def dynamic_pos_bias(p, max_dist: int) -> jax.Array:
    """3-layer SiLU MLP over integer distances → [heads, max_dist]
    (reference codec_neu_build_dynamic_pos_bias)."""
    d = jnp.arange(max_dist, dtype=jnp.float32)[:, None]       # [D, 1]
    h = jax.nn.silu(d * p["w0"][:, 0][None, :] + p["b0"])
    h = jax.nn.silu(h @ p["w1"].T + p["b1"])
    return (h @ p["w2"].T + p["b2"]).T                         # [heads, D]


def local_attn_bias(bias_hd: jax.Array, t: int, window: int) -> jax.Array:
    """Causal block-window mask + rel-pos bias → [heads, T_q, T_k]
    (reference codec_local_attn_fill_mask: key allowed iff
    q-(q%W+W) <= k <= q, W = window/2; bias index d = q-k)."""
    heads, max_dist = bias_hd.shape
    w_blk = max(1, max(2, window) // 2)
    q = jnp.arange(t)[:, None]
    k = jnp.arange(t)[None, :]
    d = q - k
    k_lo = q - (q % w_blk + w_blk)
    ok = (k <= q) & (k >= k_lo)
    bias = jnp.where(d < max_dist,
                     bias_hd[:, jnp.clip(d, 0, max_dist - 1)], 0.0)
    return jnp.where(ok[None], bias, -jnp.inf)


def _load_dpb(r: GGUFReader, prefix: str, dtype):
    g = lambda n: jnp.asarray(_neu_get(r, n)).astype(dtype)
    return {"w0": g(prefix + ".mlp.0.weight"), "b0": g(prefix + ".mlp.0.bias"),
            "w1": g(prefix + ".mlp.2.weight"), "b1": g(prefix + ".mlp.2.bias"),
            "w2": g(prefix + ".mlp.4.weight"), "b2": g(prefix + ".mlp.4.bias")}


def load_neu_encode_params(r: GGUFReader, cfg: "NeuEncConfig", dtype=jnp.float32):
    from ..ops import conv as _c

    g = lambda n: jnp.asarray(_neu_get(r, n)).astype(dtype)
    gc = lambda n: _c.prepare_conv_weight(_neu_get(r, n)).astype(dtype)
    enc = "neucodec.encode"
    dc = enc + ".distill.codec_encoder"

    def base_unit(prefix):
        return {
            "dw_w": gc(prefix + ".dw_conv.weight"), "dw_b": g(prefix + ".dw_conv.bias"),
            "pw1_w": g(prefix + ".pw_conv1.weight"), "pw1_b": g(prefix + ".pw_conv1.bias"),
            "alpha": g(prefix + ".act.alpha"),
            "grn_g": g(prefix + ".grn.gamma").reshape(-1),
            "grn_b": g(prefix + ".grn.beta").reshape(-1),
            "pw2_w": g(prefix + ".pw_conv2.weight"), "pw2_b": g(prefix + ".pw_conv2.bias"),
        }

    def local_trans(prefix, depth):
        layers = []
        for li in range(depth):
            lp = f"{prefix}.layers.{li}"
            layers.append({
                "ln_w": g(lp + ".0.norm.weight"), "ln_b": g(lp + ".0.norm.bias"),
                "qkv_w": g(lp + ".0.to_qkv.weight"),
                "out_w": g(lp + ".0.to_out.weight"),
                "ff_ln_w": g(lp + ".1.0.weight"), "ff_ln_b": g(lp + ".1.0.bias"),
                "ff_w1": g(lp + ".1.1.weight"), "ff_w2": g(lp + ".1.4.weight"),
            })
        return layers

    p: Dict[str, Any] = {
        "first_branches": [
            {"w": gc(f"{dc}.encoder.blocks.0.blocks.{i}.1.weight"),
             "b": g(f"{dc}.encoder.blocks.0.blocks.{i}.1.bias")}
            for i in range(len(POOL_KERNELS))],
        "first_conv1_w": gc(f"{dc}.encoder.blocks.0.conv_1.weight"),
        "first_conv1_b": g(f"{dc}.encoder.blocks.0.conv_1.bias"),
        "first_conv2_w": gc(f"{dc}.encoder.blocks.0.conv_2.weight"),
        "first_conv2_b": g(f"{dc}.encoder.blocks.0.conv_2.bias"),
        "units": [base_unit(f"{dc}.encoder.blocks.{b}.0.module")
                  for b in (1, 3, 5, 7)],
        "unit_7_1": base_unit(f"{dc}.encoder.blocks.7.1.module"),
        "downs": [{"w": gc(f"{dc}.encoder.blocks.{b}.0.weight"),
                   "b": g(f"{dc}.encoder.blocks.{b}.0.bias")} for b in (2, 4, 6)],
        "final_w": gc(f"{dc}.encoder.blocks.8.weight"),
        "final_b": g(f"{dc}.encoder.blocks.8.bias"),
        "down_trans": local_trans(f"{dc}.en_encoder.down_trans.trans", 2),
        "down_dpb": _load_dpb(r, f"{dc}.en_encoder.down_trans.trans.dynamic_pos_bias", dtype),
        "down_layer_w": gc(f"{dc}.en_encoder.down_trans.down_layer.weight"),
        "down_layer_b": g(f"{dc}.en_encoder.down_trans.down_layer.bias"),
        "local_trans": local_trans(f"{dc}.en_encoder.local_trans", 3),
        "local_dpb": _load_dpb(r, f"{dc}.en_encoder.local_trans.dynamic_pos_bias", dtype),
        "fc_sq_w": g(enc + ".fc_sq_prior.w"), "fc_sq_b": g(enc + ".fc_sq_prior.b"),
        "hubert_feat": [{"w": gc(f"{enc}.hubert.feat.conv.{li}.w")}
                        for li in range(len(cfg.hubert_conv_stride))],
        "hubert_gn_w": g(enc + ".hubert.feat.conv.0.gn.w"),
        "hubert_gn_b": g(enc + ".hubert.feat.conv.0.gn.b"),
        "hubert_proj_w": g(enc + ".hubert.feature_projection.w"),
        "hubert_proj_b": g(enc + ".hubert.feature_projection.b"),
        "hubert_pos_w": gc(enc + ".hubert.encoder.pos_conv.w"),
        "hubert_pos_b": g(enc + ".hubert.encoder.pos_conv.b"),
        "hubert_enc_ln_w": g(enc + ".hubert.encoder.layer_norm.w"),
        "hubert_enc_ln_b": g(enc + ".hubert.encoder.layer_norm.b"),
        "sem_init_w": gc(enc + ".semantic_encoder.initial_conv.w"),
        "sem_r1_w": gc(enc + ".semantic_encoder.residual.1.w"),
        "sem_r1_b": g(enc + ".semantic_encoder.residual.1.b"),
        "sem_r3_w": gc(enc + ".semantic_encoder.residual.3.w"),
        "sem_r3_b": g(enc + ".semantic_encoder.residual.3.b"),
        "sem_out_w": gc(enc + ".semantic_encoder.final_conv.w"),
        "fc_prior_w": g(enc + ".fc_prior.w"), "fc_prior_b": g(enc + ".fc_prior.b"),
        "proj_in_w": g(enc + ".quant.project_in.w"),
        "proj_in_b": g(enc + ".quant.project_in.b"),
    }
    layers = []
    for li in range(cfg.hubert_layers):
        lp = f"{enc}.hubert.encoder.layers.{li}"
        layers.append({k: g(f"{lp}.{n}") for k, n in (
            ("q_w", "att.q.w"), ("q_b", "att.q.b"), ("k_w", "att.k.w"),
            ("k_b", "att.k.b"), ("v_w", "att.v.w"), ("v_b", "att.v.b"),
            ("o_w", "att.o.w"), ("o_b", "att.o.b"), ("ln_w", "ln.w"),
            ("ln_b", "ln.b"), ("ff1_w", "ffn.fc1.w"), ("ff1_b", "ffn.fc1.b"),
            ("ff2_w", "ffn.fc2.w"), ("ff2_b", "ffn.fc2.b"),
            ("ffn_ln_w", "ffn_ln.w"), ("ffn_ln_b", "ffn_ln.b"))})
    p["hubert_layers"] = layers
    return p


def _base_unit_fwd(x, u):
    h = conv.conv1d(x, u["dw_w"], u["dw_b"], padding=3, groups=x.shape[-1])
    h = h @ u["pw1_w"].T + u["pw1_b"]
    h = act.snake(h, u["alpha"], eps=1.1920929e-7)
    h = _grn(h, u["grn_g"], u["grn_b"])
    h = h @ u["pw2_w"].T + u["pw2_b"]
    return x + h


def _local_trans_fwd(x, layers, bias_hd, window: int, heads: int):
    """LocalTransformer stage: LocalMHA (qkv fused no-bias, block-causal
    windowed attention with dynamic pos bias) + GEGLU FF."""
    b, t, dim = x.shape
    head_dim = dim // 4
    inner = heads * head_dim
    ff_inner = dim * 4 * 2 // 3
    mask = local_attn_bias(bias_hd, t, window)                 # [H, T, T]
    for lw in layers:
        h = norms.layer_norm(x, lw["ln_w"], lw["ln_b"], 1e-5)
        qkv = h @ lw["qkv_w"].T
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (head_dim ** -0.5) + mask[None]
        w = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, inner)
        x = x + a @ lw["out_w"].T
        f = norms.layer_norm(x, lw["ff_ln_w"], lw["ff_ln_b"], 1e-5)
        f = f @ lw["ff_w1"].T
        f1, f2 = f[..., :ff_inner], f[..., ff_inner:]
        f = f1 * act.gelu_erf(f2)
        x = x + f @ lw["ff_w2"].T
    return x


def neu_distill_acoustic_fn(params, pcm, cfg: "NeuEncConfig"):
    """pcm [B, n] (padded to a 320 multiple) → acoustic branch
    [B, n/320, fc_sq_out]."""
    x = pcm[..., None]
    # first block: 5 parallel abs→max→avg→conv branches (kernels 1..45)
    branches = []
    for k, br in zip(POOL_KERNELS, params["first_branches"]):
        h = _pool1d_same(jnp.abs(x), k, "max")
        h = _pool1d_same(h, k, "avg")
        branches.append(conv.conv1d(h, br["w"], br["b"], padding=3))
    h = jnp.concatenate(branches, axis=-1)
    h = conv.conv1d(h, params["first_conv1_w"], params["first_conv1_b"])
    h = act.gelu_erf(h)
    h = jnp.concatenate([h, x], axis=-1)
    x = conv.conv1d(h, params["first_conv2_w"], params["first_conv2_b"])

    for i in range(3):
        x = _base_unit_fwd(x, params["units"][i])
        x = conv.conv1d(x, params["downs"][i]["w"], params["downs"][i]["b"],
                        stride=4)
    x = _base_unit_fwd(x, params["units"][3])
    x = _base_unit_fwd(x, params["unit_7_1"])
    x = conv.conv1d(x, params["final_w"], params["final_b"], padding=1)

    heads = cfg.distill_heads
    down_bias = dynamic_pos_bias(params["down_dpb"], cfg.down_window)
    x = _local_trans_fwd(x, params["down_trans"], down_bias,
                         cfg.down_window, heads)
    x = conv.conv1d(x, params["down_layer_w"], params["down_layer_b"], stride=5)
    local_bias = dynamic_pos_bias(params["local_dpb"], cfg.local_window)
    x = _local_trans_fwd(x, params["local_trans"], local_bias,
                         cfg.local_window, heads)
    return x @ params["fc_sq_w"].T + params["fc_sq_b"]


def neu_hubert_fn(params, sem_pcm, cfg: "NeuEncConfig"):
    """sem_pcm [B, n_sem] → HuBERT hidden states [B, T_sem, hidden]."""
    h = sem_pcm[..., None]
    for li, (lw, stride) in enumerate(zip(params["hubert_feat"],
                                          cfg.hubert_conv_stride)):
        h = conv.conv1d(h, lw["w"], stride=stride)
        if li == 0:
            h = norms.group_norm(h, params["hubert_gn_w"],
                                 params["hubert_gn_b"],
                                 cfg.hubert_conv_dim[0], cfg.hubert_ln_eps)
        h = act.gelu_erf(h)
    h = h @ params["hubert_proj_w"].T + params["hubert_proj_b"]
    pos = conv.conv1d(h, params["hubert_pos_w"], params["hubert_pos_b"],
                      padding=cfg.hubert_pos_k // 2,
                      groups=cfg.hubert_pos_groups)
    if cfg.hubert_pos_k % 2 == 0:
        pos = pos[:, :-1]
    h = h + act.gelu_erf(pos)
    h = norms.layer_norm(h, params["hubert_enc_ln_w"],
                         params["hubert_enc_ln_b"], cfg.hubert_ln_eps)
    b, t, c = h.shape
    nh = cfg.hubert_heads
    hd = c // nh
    eps = cfg.hubert_ln_eps
    for lw in params["hubert_layers"]:
        q = (h @ lw["q_w"].T + lw["q_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = (h @ lw["k_w"].T + lw["k_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = (h @ lw["v_w"].T + lw["v_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, c)
        h = h + (a @ lw["o_w"].T + lw["o_b"])
        h = norms.layer_norm(h, lw["ln_w"], lw["ln_b"], eps)
        f = act.gelu_erf(h @ lw["ff1_w"].T + lw["ff1_b"])
        h = h + (f @ lw["ff2_w"].T + lw["ff2_b"])
        h = norms.layer_norm(h, lw["ffn_ln_w"], lw["ffn_ln_b"], eps)
    return h


def neu_encode_fn(params, pcm, sem_pcm, cfg_enc: "NeuEncConfig",
                  codebook_dim: int):
    """Distill encode: pcm [B, n_pad], sem_pcm [B, n_pad+320] →
    codes [B, T, 1] int32."""
    from .xcodec2 import fsq_quantize_x2

    ac = neu_distill_acoustic_fn(params, pcm, cfg_enc)
    hs = neu_hubert_fn(params, sem_pcm, cfg_enc)
    s = conv.conv1d(hs, params["sem_init_w"], padding=1)
    s = jax.nn.relu(s)
    res = s
    s = jax.nn.relu(conv.conv1d(s, params["sem_r1_w"], params["sem_r1_b"],
                                padding=1))
    s = conv.conv1d(s, params["sem_r3_w"], params["sem_r3_b"], padding=1)
    s = s + res
    s = conv.conv1d(s, params["sem_out_w"], padding=1)
    n = min(s.shape[1], ac.shape[1])
    h = jnp.concatenate([s[:, :n], ac[:, :n]], axis=-1)
    h = h @ params["fc_prior_w"].T + params["fc_prior_b"]
    z = h @ params["proj_in_w"].T + params["proj_in_b"]
    return fsq_quantize_x2(z, codebook_dim)[..., None]

"""NeuCodec / Distill-NeuCodec decode path, TPU-native.

Reference behavior: src/models/neucodec.cpp (codec_neu_build_decode:542):
single-codebook lookup → project_out → fc_post_a → embed conv k7 →
2 prior resnet blocks (GroupNorm32 eps1e-6, SiLU, conv k3) → N Vocos-ish
transformer blocks (RMSNorm eps1e-6, fused QKV no-bias, RoPE-NORMAL,
non-causal SDPA, SiLU MLP) → 2 post resnet blocks → final LN → iSTFT head
(optional baked window) → 24 kHz PCM.

The BigCodec/HuBERT encode branch (and the distill local-attention encoder)
is round-2 work; decode-only matches the reference e2e config for neucodec
(decode-only thresholds, tests/e2e/config.json).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, conv, norms, rope
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

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = NeuConfig.from_gguf(reader)
        self.params = load_neu_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.vq_dim
        self.has_encoder = False        # BigCodec/HuBERT encode branch: round 2
        self.has_decoder = reader.get_bool("codec.has_decoder", True)

    def _decode_impl(self, codes, n_q):
        return neu_decode_fn(self.params, codes, self.cfg)


class DistillNeuCodec(NeuCodec):
    arch = "distill_neucodec"

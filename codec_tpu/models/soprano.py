"""Soprano decoder (latent-only transformer-free vocoder), TPU-native.

Reference behavior: src/models/soprano.cpp — latent [T, latent_dim] →
linear-interp time upsample ×upscale (t_up = upscale*(T-1)+1) → 1x1 embed →
LayerNorm → ConvNeXt stack (dw_kernel, pad k/2) → final LN → head linear →
iSTFT (skip DC/Nyquist, custom window tensor, trim n_fft/2) → 32 kHz PCM.
The reference runs the interp on the host and the iSTFT on CPU; here both
are in-graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import blocks, conv, norms
from ..ops.istft import istft_from_head
from ..runtime.model import CodecModel, CodecError


@dataclass(frozen=True)
class SopranoConfig:
    sample_rate: int = 32000
    hop_size: int = 256
    n_fft: int = 1024
    latent_dim: int = 512
    decoder_dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    upscale: int = 4
    dw_kernel: int = 7

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "SopranoConfig":
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 32000),
            hop_size=r.get_i32("codec.hop_size", 256),
            n_fft=r.get_i32("codec.n_fft", 1024),
            latent_dim=r.get_i32("codec.latent_dim", 512),
            decoder_dim=r.get_i32("soprano.decoder_dim", 512),
            intermediate_dim=r.get_i32("soprano.intermediate_dim", 1536),
            num_layers=r.get_i32("soprano.num_layers", 8),
            upscale=r.get_i32("soprano.upscale", 4),
            dw_kernel=r.get_i32("soprano.dw_kernel", 7),
        )


def load_soprano_params(r: GGUFReader, cfg: SopranoConfig, dtype=jnp.float32):
    def g(name):
        return jnp.asarray(r.get(name)).astype(dtype)

    p: Dict[str, Any] = {
        "embed_w": conv.prepare_conv_weight(r.get("sop.decode.embed.w")).astype(dtype),
        "embed_b": g("sop.decode.embed.b"),
        "norm_w": g("sop.decode.norm.w"), "norm_b": g("sop.decode.norm.b"),
        "fln_w": g("sop.decode.fln.w"), "fln_b": g("sop.decode.fln.b"),
        "head_w": g("sop.decode.head.out.w"), "head_b": g("sop.decode.head.out.b"),
        "window": (jnp.asarray(r.get("sop.decode.istft.window")).reshape(-1).astype(dtype)
                   if r.has_tensor("sop.decode.istft.window") else None),
    }
    cnx = []
    for li in range(cfg.num_layers):
        pre = f"sop.decode.cnx.{li}"
        cnx.append({
            "dw_w": conv.prepare_conv_weight(r.get(pre + ".dw.w")).astype(dtype),
            "dw_b": g(pre + ".dw.b"),
            "ln_w": g(pre + ".ln.w"), "ln_b": g(pre + ".ln.b"),
            "pw1_w": g(pre + ".pw1.w"), "pw1_b": g(pre + ".pw1.b"),
            "pw2_w": g(pre + ".pw2.w"), "pw2_b": g(pre + ".pw2.b"),
            "gamma": g(pre + ".gamma"),
        })
    p["cnx"] = cnx
    return p


def soprano_upsample_linear(latent: jax.Array, upscale: int) -> jax.Array:
    """[B, T, C] → [B, upscale*(T-1)+1, C] linear interpolation
    (reference host-side loop: soprano.cpp:240-254)."""
    b, t, c = latent.shape
    t_up = upscale * (t - 1) + 1
    ti = jnp.arange(t_up)
    base = jnp.minimum(ti // upscale, t - 1)
    nxt = jnp.minimum(base + 1, t - 1)
    frac = ((ti - base * upscale) / upscale).astype(latent.dtype)
    v0 = latent[:, base]
    v1 = latent[:, nxt]
    return v0 + (v1 - v0) * frac[None, :, None]


def soprano_decode_latent_fn(params, latent: jax.Array, cfg: SopranoConfig) -> jax.Array:
    """latent [B, T, latent_dim] → pcm [B, (t_up-1)*hop]."""
    x = soprano_upsample_linear(latent, cfg.upscale)
    x = conv.conv1d(x, params["embed_w"], params["embed_b"])
    x = norms.layer_norm(x, params["norm_w"], params["norm_b"], 1e-6)
    for blk in params["cnx"]:
        x = blocks.convnext_block(x, blk)
    x = norms.layer_norm(x, params["fln_w"], params["fln_b"], 1e-6)
    head = x @ params["head_w"].T + params["head_b"]
    return istft_from_head(head, cfg.hop_size, window=params["window"],
                           skip_dc_nyquist=True)


class SopranoCodec(CodecModel):
    arch = "soprano"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = SopranoConfig.from_gguf(reader)
        self.params = load_soprano_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.latent_dim = self.cfg.latent_dim
        self.n_q = 0
        self.has_encoder = False
        self.has_decoder = True

    def _decode_impl(self, codes, n_q):
        raise CodecError("Soprano decoder does not accept token inputs; use decode_latent")

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        raise CodecError("Soprano decoder does not accept token inputs; use decode_latent")

    def decode_latent(self, latent, pcm_format: str = "f32") -> np.ndarray:
        latent = np.asarray(latent, dtype=np.float32)
        squeeze = latent.ndim == 2
        if squeeze:
            latent = latent[None]
        if latent.shape[-1] != self.cfg.latent_dim:
            raise CodecError(f"Soprano latent_dim mismatch: {latent.shape[-1]} != {self.cfg.latent_dim}")
        pcm = self._run_batched(
            ("dec_lat",),
            lambda: lambda z: soprano_decode_latent_fn(self.params, z, self.cfg),
            latent, pcm_format=pcm_format)
        return pcm[0] if squeeze else pcm

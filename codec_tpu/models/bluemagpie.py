"""BlueMagpie / VoxCPM2 AudioVAE V2 — continuous-latent VAE codec, TPU-native.

Reference behavior: src/models/bluemagpie_audiovae.cpp —
decode_latent: latent [T, 64] → depthwise+pointwise causal convs →
  6 CausalDecoderBlocks (rates 8,6,5,2,2,2; per-block scale/bias sample-rate
  conditioning baked at convert, sign-preserving Snake, causal transpose
  conv trimmed by `stride`, 3 causal residual units d=1/3/9) →
  Snake → causal conv → tanh → 48 kHz PCM.
encode: 16 kHz PCM → causal conv → 4 CausalEncoderBlocks (rates from KV) →
  fc_mu causal conv → latent mu (no codes — a VAE, n_q = 0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, conv
from ..runtime.model import CodecModel, CodecError

RES_DILATIONS = (1, 3, 9)


@dataclass(frozen=True)
class BmVaeConfig:
    sample_rate: int = 48000
    encode_sample_rate: int = 16000
    latent_dim: int = 64
    decode_hop: int = 1920
    encode_hop: int = 640
    decoder_rates: Tuple[int, ...] = (8, 6, 5, 2, 2, 2)
    encoder_rates: Tuple[int, ...] = (4, 4, 5, 8)

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "BmVaeConfig":
        dr = [int(v) for v in r.get_arr("bluemagpie.decoder_rates", [8, 6, 5, 2, 2, 2]) if int(v) > 0]
        er = [int(v) for v in r.get_arr("bluemagpie.encoder_rates", [4, 4, 5, 8]) if int(v) > 0]
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 48000),
            encode_sample_rate=r.get_i32("codec.encode_sample_rate", 16000),
            latent_dim=r.get_i32("codec.latent_dim", 64),
            decode_hop=r.get_i32("codec.decode_hop_size", 1920),
            encode_hop=r.get_i32("codec.hop_size", 640),
            decoder_rates=tuple(dr),
            encoder_rates=tuple(er),
        )


def _cw(r, base, dtype):
    w = r.get(base + ".w")
    b = r.get_or_none(base + ".b")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _ctw(r, base, dtype):
    w = r.get(base + ".w")
    b = r.get_or_none(base + ".b")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _a(r, name, dtype):
    return jnp.asarray(r.get(name)).reshape(-1).astype(dtype)


def _res_units(r, base, dtype):
    return [{
        "a1": _a(r, f"{base}.r{ri}.act1.alpha", dtype),
        "c1": _cw(r, f"{base}.r{ri}.conv1", dtype),
        "a2": _a(r, f"{base}.r{ri}.act2.alpha", dtype),
        "c2": _cw(r, f"{base}.r{ri}.conv2", dtype),
    } for ri in range(3)]


def load_bm_params(r: GGUFReader, cfg: BmVaeConfig, dtype=jnp.float32):
    p: Dict[str, Any] = {}
    if r.has_tensor("bluemagpie.dec.conv_in_dw.w"):
        p["dec_in_dw"] = _cw(r, "bluemagpie.dec.conv_in_dw", dtype)
        p["dec_in_pw"] = _cw(r, "bluemagpie.dec.conv_in_pw", dtype)
        blocks = []
        for bi in range(len(cfg.decoder_rates)):
            base = f"bluemagpie.dec.b{bi}"
            blocks.append({
                "cond_scale": _a(r, base + ".cond.scale", dtype),
                "cond_bias": _a(r, base + ".cond.bias", dtype),
                "act": _a(r, base + ".act.alpha", dtype),
                "tr": _ctw(r, base + ".convtr", dtype),
                "units": _res_units(r, base, dtype),
            })
        p["dec_blocks"] = blocks
        p["dec_act_final"] = _a(r, "bluemagpie.dec.act_final.alpha", dtype)
        p["dec_out"] = _cw(r, "bluemagpie.dec.conv_out", dtype)
    if r.has_tensor("bluemagpie.enc.conv0.w"):
        p["enc0"] = _cw(r, "bluemagpie.enc.conv0", dtype)
        eblocks = []
        for bi in range(1, len(cfg.encoder_rates) + 1):
            base = f"bluemagpie.enc.b{bi}"
            eblocks.append({
                "units": _res_units(r, base, dtype),
                "act": _a(r, base + ".act.alpha", dtype),
                "down": _cw(r, base + ".down", dtype),
            })
        p["enc_blocks"] = eblocks
        p["fc_mu"] = _cw(r, "bluemagpie.enc.fc_mu", dtype)
    return p


def _unit(x, u, dilation):
    h = act.snake(x, u["a1"])
    h = conv.conv1d_causal(h, u["c1"]["w"], u["c1"]["b"], dilation=dilation,
                           groups=x.shape[-1])
    h = act.snake(h, u["a2"])
    h = conv.conv1d(h, u["c2"]["w"], u["c2"]["b"])
    return x + h


def bm_decode_latent_fn(params, latent: jax.Array, cfg: BmVaeConfig) -> jax.Array:
    """latent [B, T, latent_dim] → pcm [B, T*decode_hop]."""
    x = conv.conv1d_causal(latent, params["dec_in_dw"]["w"], params["dec_in_dw"]["b"],
                           groups=latent.shape[-1])
    x = conv.conv1d(x, params["dec_in_pw"]["w"], params["dec_in_pw"]["b"])
    for blk, stride in zip(params["dec_blocks"], cfg.decoder_rates):
        x = x * blk["cond_scale"] + blk["cond_bias"]
        x = act.snake(x, blk["act"])
        y = conv.convtr1d(x, blk["tr"]["w"], blk["tr"]["b"], stride=stride)
        crop = 2 * ((stride + 1) // 2) - (stride % 2)
        x = y[:, : y.shape[1] - crop, :]
        for u, d in zip(blk["units"], RES_DILATIONS):
            x = _unit(x, u, d)
    x = act.snake(x, params["dec_act_final"])
    x = conv.conv1d_causal(x, params["dec_out"]["w"], params["dec_out"]["b"])
    return jnp.tanh(x[..., 0])


def bm_encode_latent_fn(params, pcm: jax.Array, cfg: BmVaeConfig) -> jax.Array:
    """pcm [B, n] → mu [B, n/encode_hop, latent_dim]."""
    x = conv.conv1d_causal(pcm[..., None], params["enc0"]["w"], params["enc0"]["b"])
    for blk, stride in zip(params["enc_blocks"], cfg.encoder_rates):
        for u, d in zip(blk["units"], RES_DILATIONS):
            x = _unit(x, u, d)
        x = act.snake(x, blk["act"])
        x = conv.conv1d_causal(x, blk["down"]["w"], blk["down"]["b"], stride=stride)
    return conv.conv1d_causal(x, params["fc_mu"]["w"], params["fc_mu"]["b"])


class BlueMagpieAudioVAE(CodecModel):
    arch = "bluemagpie_audiovae"

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = BmVaeConfig.from_gguf(reader)
        self.params = load_bm_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.encode_sample_rate = self.cfg.encode_sample_rate
        self.hop_size = self.cfg.decode_hop
        self.latent_dim = self.cfg.latent_dim
        self.n_q = 0
        self.has_encoder = "enc0" in self.params
        self.has_decoder = "dec_in_dw" in self.params

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        raise CodecError("BlueMagpie-AudioVAE is a continuous-latent codec; use decode_latent")

    def encode(self, pcm, n_q: int = 0):
        raise CodecError("BlueMagpie-AudioVAE encode produces a continuous latent; use encode_latent")

    def decode_latent(self, latent, pcm_format: str = "f32") -> np.ndarray:
        latent = np.asarray(latent, np.float32)
        squeeze = latent.ndim == 2
        if squeeze:
            latent = latent[None]
        if latent.shape[-1] != self.latent_dim:
            raise CodecError(f"latent_dim mismatch: {latent.shape[-1]} != {self.latent_dim}")
        pcm = self._run_batched(
            ("dec_lat",),
            lambda: lambda z: bm_decode_latent_fn(self.params, z, self.cfg),
            latent, pcm_format=pcm_format)
        return pcm[0] if squeeze else pcm

    def encode_latent(self, pcm) -> np.ndarray:
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        pad = (-pcm.shape[1]) % self.cfg.encode_hop
        if pad:
            pcm = np.pad(pcm, ((0, 0), (0, pad)))
        mu = self._run_batched(
            ("enc_lat",),
            lambda: lambda x: bm_encode_latent_fn(self.params, x, self.cfg),
            pcm)
        return mu[0] if squeeze else mu

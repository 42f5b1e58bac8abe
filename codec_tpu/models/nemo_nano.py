"""NeMo Nano Codec (NVIDIA FSQ codec, HiFi-GAN style), TPU-native.

Reference behavior: src/models/nemo_nano_codec.cpp — encoder: replicate-pad
convs, 5 layers of 3 parallel HiFi-GAN resblocks (k=3/7/11, dilations
1/3/5) averaged + strided downsample (rates 2,3,6,7,7); FSQ quantizer per
group (tanh compression → round → index via mixed-radix digits); decoder:
causal convs/convtrs with "half-snake" activations (first half channels
snake, second half leaky-relu 0.01), per-group codebook gather, final clamp.
Weight schema per scripts/converters/nemo_nano_codec.py (nemo.* names, FSQ
constants + per-group codebooks pre-baked).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, conv
from ..runtime.model import CodecModel

DOWN_RATES = (2, 3, 6, 7, 7)
UP_RATES = (7, 7, 6, 3, 2)
RES_KERNELS = (3, 7, 11)
RES_DILATIONS = (1, 3, 5)


@dataclass(frozen=True)
class NemoConfig:
    sample_rate: int = 22050
    hop_size: int = 1764
    n_q: int = 4
    codebook_size: int = 4032
    codebook_dim: int = 4
    latent_dim: int = 16
    down_rates: Tuple[int, ...] = DOWN_RATES
    up_rates: Tuple[int, ...] = UP_RATES

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "NemoConfig":
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 22050),
            hop_size=r.get_i32("codec.hop_size", 1764),
            n_q=r.get_i32("codec.n_q", 4),
            codebook_size=r.get_i32("codec.codebook_size", 4032),
            codebook_dim=r.get_i32("codec.codebook_dim", 4),
            latent_dim=r.get_i32("codec.latent_dim", 16),
            down_rates=tuple(r.get_arr("nemo.down_rates", list(DOWN_RATES))),
            up_rates=tuple(r.get_arr("nemo.up_rates", list(UP_RATES))),
        )


def _cw(r: GGUFReader, base: str, dtype):
    w = r.get(base + ".w")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(r.get(base + ".b")).astype(dtype), "k": w.shape[2]}


def _ctw(r: GGUFReader, base: str, dtype):
    w = r.get(base + ".w")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(r.get(base + ".b")).astype(dtype), "k": w.shape[2]}


def load_nemo_params(r: GGUFReader, cfg: NemoConfig, dtype=jnp.float32):
    p: Dict[str, Any] = {}
    p["fsq"] = {k: jnp.asarray(r.get(f"nemo.fsq.{k}")).astype(jnp.float32)
                for k in ("scale", "out_scale", "out_offset", "in_shift", "dim_base")}
    p["fsq_cb"] = [jnp.asarray(r.get(f"nemo.fsq.codebook.{g}")).astype(dtype)
                   for g in range(cfg.n_q)]

    if r.has_tensor("nemo.enc.pre.w"):
        p["enc_pre"] = _cw(r, "nemo.enc.pre", dtype)
        p["enc_post"] = _cw(r, "nemo.enc.post", dtype)
        p["enc_down"] = [_cw(r, f"nemo.enc.down.{i}", dtype) for i in range(len(cfg.down_rates))]
        p["enc_res"] = [
            [[{"in": _cw(r, f"nemo.enc.res.l{li}.b{bi}.r{ri}.in", dtype),
               "sk": _cw(r, f"nemo.enc.res.l{li}.b{bi}.r{ri}.sk", dtype)}
              for ri in range(3)] for bi in range(3)]
            for li in range(len(cfg.down_rates))]

    p["dec_pre"] = _cw(r, "nemo.dec.pre", dtype)
    p["dec_post"] = _cw(r, "nemo.dec.post", dtype)
    p["dec_post_a"] = jnp.asarray(r.get("nemo.dec.post.a")).reshape(-1).astype(dtype)
    p["dec_up"] = [_ctw(r, f"nemo.dec.up.{i}", dtype) for i in range(len(cfg.up_rates))]
    p["dec_act"] = [jnp.asarray(r.get(f"nemo.dec.act.{i}.a")).reshape(-1).astype(dtype)
                    for i in range(len(cfg.up_rates))]
    p["dec_res"] = [
        [[{"in": _cw(r, f"nemo.dec.res.l{li}.b{bi}.r{ri}.in", dtype),
           "sk": _cw(r, f"nemo.dec.res.l{li}.b{bi}.r{ri}.sk", dtype),
           "in_a": jnp.asarray(r.get(f"nemo.dec.res.l{li}.b{bi}.r{ri}.in.a")).reshape(-1).astype(dtype),
           "sk_a": jnp.asarray(r.get(f"nemo.dec.res.l{li}.b{bi}.r{ri}.sk.a")).reshape(-1).astype(dtype)}
          for ri in range(3)] for bi in range(3)]
        for li in range(len(cfg.up_rates))]
    return p


def _rep_conv(x, layer, stride=1, dilation=1, padding=0):
    """Replicate-pad symmetric conv (reference: nemo_conv1d_replicate)."""
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)), mode="edge")
    return conv.conv1d(x, layer["w"], layer["b"], stride=stride, dilation=dilation)


def _half_snake(x, alpha):
    """First half channels snake, rest leaky-relu (nemo_nano_codec.cpp:284-288).

    NOTE: matches the reference's codec_op_snake with clamped alpha."""
    c = x.shape[-1]
    half = c // 2
    left = act.snake(x[..., :half], jnp.maximum(alpha, 1e-9))
    right = act.leaky_relu(x[..., half:], 0.01)
    return jnp.concatenate([left, right], axis=-1)


def fsq_encode(x: jax.Array, fsq: Dict[str, jax.Array], n_q: int, d: int) -> jax.Array:
    """x [B, T, n_q*d] → codes [B, T, n_q] (reference: nemo.cpp:206-229)."""
    b, t, _ = x.shape
    xg = x.reshape(b, t, n_q, d).astype(jnp.float32)
    x1 = jnp.tanh(xg + fsq["in_shift"]) * fsq["out_scale"] - fsq["out_offset"]
    r = jnp.round(x1)
    idx = jnp.sum((r + fsq["scale"]) * fsq["dim_base"], axis=-1)
    return idx.astype(jnp.int32)


def nemo_decode_fn(params, codes: jax.Array, cfg: NemoConfig) -> jax.Array:
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    parts = [jnp.take(params["fsq_cb"][g], codes[..., g], axis=0)
             for g in range(cfg.n_q)]
    x = jnp.concatenate(parts, axis=-1)                     # [B, T, n_q*d]

    x = conv.conv1d_causal(x, params["dec_pre"]["w"], params["dec_pre"]["b"])
    for li, stride in enumerate(cfg.up_rates):
        x = _half_snake(x, params["dec_act"][li])
        x = conv.convtr1d_causal(x, params["dec_up"][li]["w"], params["dec_up"][li]["b"],
                                 stride=stride)
        acc = None
        for bi, k in enumerate(RES_KERNELS):
            xb = x
            for ri, dil in enumerate(RES_DILATIONS):
                u = params["dec_res"][li][bi][ri]
                h = _half_snake(xb, u["in_a"])
                h = conv.conv1d_causal(h, u["in"]["w"], u["in"]["b"], dilation=dil)
                h = _half_snake(h, u["sk_a"])
                h = conv.conv1d_causal(h, u["sk"]["w"], u["sk"]["b"])
                xb = xb + h
            acc = xb if acc is None else acc + xb
        x = acc / 3.0
    x = _half_snake(x, params["dec_post_a"])
    x = conv.conv1d_causal(x, params["dec_post"]["w"], params["dec_post"]["b"])
    return jnp.clip(x[..., 0], -1.0, 1.0)


def nemo_encode_fn(params, pcm: jax.Array, cfg: NemoConfig) -> jax.Array:
    x = pcm[..., None]
    x = _rep_conv(x, params["enc_pre"], padding=params["enc_pre"]["k"] // 2)
    for li, stride in enumerate(cfg.down_rates):
        acc = None
        for bi, k in enumerate(RES_KERNELS):
            xb = x
            for ri, dil in enumerate(RES_DILATIONS):
                u = params["enc_res"][li][bi][ri]
                h = act.leaky_relu(xb, 0.01)
                h = _rep_conv(h, u["in"], dilation=dil, padding=(k * dil - dil) // 2)
                h = act.leaky_relu(h, 0.01)
                h = _rep_conv(h, u["sk"], padding=k // 2)
                xb = xb + h
            acc = xb if acc is None else acc + xb
        x = act.leaky_relu(acc / 3.0, 0.01)
        kd = 2 * stride
        x = _rep_conv(x, params["enc_down"][li], stride=stride,
                      padding=(kd - stride + 1) // 2)
    x = act.leaky_relu(x, 0.01)
    x = _rep_conv(x, params["enc_post"], padding=params["enc_post"]["k"] // 2)
    return fsq_encode(x, params["fsq"], cfg.n_q, cfg.codebook_dim)


class NemoNanoCodec(CodecModel):
    arch = "nemo_nano_codec"
    causal_time = False         # encoder uses symmetric replicate padding

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = NemoConfig.from_gguf(reader)
        self.params = load_nemo_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.has_encoder = "enc_pre" in self.params
        self.has_decoder = True

    def _decode_impl(self, codes, n_q):
        return nemo_decode_fn(self.params, codes, self.cfg)

    def _encode_impl(self, pcm, n_q):
        return nemo_encode_fn(self.params, pcm, self.cfg)

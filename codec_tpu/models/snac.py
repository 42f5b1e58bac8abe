"""SNAC (hubertsiuzdak/snac_24khz), TPU-native.

Reference behavior: src/models/snac.cpp — encoder (WNConv + 4 blocks of
depthwise snake residual units + strided conv), 3-level multi-scale residual
VQ at time strides [4,2,1] (avg-pool → in_proj → cosine-NN vs pre-baked
L2-normalized codebook → out_proj → repeat-interleave), HiFi-GAN-style
decoder with noise blocks run as identity. Codes use the "Orpheus" packing
(src/models/snac.cpp:17-50): rectangular [T_fine, 3] where row q of level
stride s repeats each code s times; decode subsamples rows back out.

Snake here is sign-preserving (alpha can be negative in trained SNAC
weights; reference notes at snac.cpp:60-69) — ops/act.snake matches.
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

RES_DILATIONS = (1, 3, 9)


@dataclass(frozen=True)
class SnacConfig:
    sample_rate: int = 24000
    hop_size: int = 512
    pad_to: int = 2048
    n_q: int = 3
    codebook_size: int = 4096
    codebook_dim: int = 8
    latent_dim: int = 768
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    vq_strides: Tuple[int, ...] = (4, 2, 1)
    noise: bool = True

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "SnacConfig":
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=r.get_i32("codec.hop_size", 512),
            pad_to=r.get_i32("codec.pad_to", 2048),
            n_q=r.get_i32("codec.n_q", 3),
            codebook_size=r.get_i32("codec.codebook_size", 4096),
            codebook_dim=r.get_i32("codec.codebook_dim", 8),
            latent_dim=r.get_i32("codec.latent_dim", 768),
            encoder_rates=tuple(r.get_arr("snac.encoder_rates", [2, 4, 8, 8])),
            decoder_rates=tuple(r.get_arr("snac.decoder_rates", [8, 8, 4, 2])),
            vq_strides=tuple(r.get_arr("snac.vq_strides", [4, 2, 1])),
            noise=r.get_bool("snac.noise", True),
        )


def _cw(r: GGUFReader, name: str, dtype) -> Dict[str, Any]:
    w = r.get(name + ".w")
    b = r.get_or_none(name + ".b")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _ctw(r: GGUFReader, name: str, dtype) -> Dict[str, Any]:
    w = r.get(name + ".w")                    # torch convtr (in, out, k)
    b = r.get_or_none(name + ".b")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _alpha(r: GGUFReader, name: str, dtype):
    return jnp.asarray(r.get(name + ".alpha")).reshape(-1).astype(dtype)


def _res_units(r: GGUFReader, base: str, dtype):
    units = []
    for ri in range(3):
        pre = f"{base}.r{ri}"
        units.append({
            "a1": _alpha(r, pre + ".act1", dtype),
            "c1": _cw(r, pre + ".conv1", dtype),
            "a2": _alpha(r, pre + ".act2", dtype),
            "c2": _cw(r, pre + ".conv2", dtype),
        })
    return units


def load_snac_params(r: GGUFReader, cfg: SnacConfig, dtype=jnp.float32):
    p: Dict[str, Any] = {"q": []}
    for qi in range(cfg.n_q):
        base = f"snac.q.{qi}"
        p["q"].append({
            "in": _cw(r, base + ".in_proj", dtype),
            "out": _cw(r, base + ".out_proj", dtype),
            "cb": jnp.asarray(r.get(base + ".codebook")).astype(dtype),
            "cb_norm": jnp.asarray(r.get(base + ".codebook_norm")).astype(dtype),
        })

    p["dec_in_dw"] = _cw(r, "snac.dec.conv_in_dw", dtype)
    p["dec_in_pw"] = _cw(r, "snac.dec.conv_in_pw", dtype)
    dec_blocks = []
    for bi in range(len(cfg.decoder_rates)):
        base = f"snac.dec.b{bi}"
        dec_blocks.append({
            "act": _alpha(r, base + ".act", dtype),
            "tr": _ctw(r, base + ".convtr", dtype),
            "units": _res_units(r, base, dtype),
        })
    p["dec_blocks"] = dec_blocks
    p["dec_act_final"] = _alpha(r, "snac.dec.act_final", dtype)
    p["dec_final"] = _cw(r, "snac.dec.conv_final", dtype)

    if r.has_tensor("snac.enc.conv0.w"):
        p["enc0"] = _cw(r, "snac.enc.conv0", dtype)
        enc_blocks = []
        for bi in range(1, len(cfg.encoder_rates) + 1):
            base = f"snac.enc.b{bi}"
            enc_blocks.append({
                "units": _res_units(r, base, dtype),
                "act": _alpha(r, base + ".act", dtype),
                "down": _cw(r, base + ".down", dtype),
            })
        p["enc_blocks"] = enc_blocks
        p["enc_final"] = _cw(r, "snac.enc.conv_final", dtype)
    return p


def _conv(x, layer, stride=1, dilation=1, padding=0):
    # groups from runtime channels: WIO weight is [K, in/groups, out]; a
    # depthwise conv (C,1,K) and the 1→C input conv share weight shapes.
    w, b = layer["w"], layer["b"]
    groups = x.shape[-1] // w.shape[1]
    if conv.use_conv_matmul():
        if w.shape[1] == 1 and groups == x.shape[-1]:
            # depthwise: K shifted VPU FMAs — XLA's grouped-conv lowering
            # at SNAC's shapes was the round-4 perf outlier (142 ms b1,
            # 0.01% MFU; BENCH_r04); see conv1d_depthwise_shifts
            return conv.conv1d_depthwise_shifts(
                x, w, b, stride=stride, dilation=dilation, padding=padding)
        if stride == 1 and groups == 1:
            return conv.conv1d_matmul(x, w, b, dilation=dilation,
                                      padding=padding)
    return conv.conv1d(x, w, b, stride=stride, dilation=dilation,
                       padding=padding, groups=groups)


def _res_unit(x, u, dilation):
    h = act.snake(x, u["a1"])
    h = _conv(h, u["c1"], dilation=dilation, padding=((u["c1"]["k"] - 1) * dilation) // 2)
    h = act.snake(h, u["a2"])
    h = _conv(h, u["c2"])
    return x + h


def _res_units_block(x, units, to):
    """One decoder block's three res-units: the fused depthwise chain
    Pallas kernel when it applies (one HBM read+write for the whole
    chain — the two pcm-rate blocks were 24 ms of the 32 ms bf16 b1
    decode as separate XLA passes, tools/snac_bisect.py), otherwise the
    sequential per-unit path."""
    from ..ops import seanet_pallas as sp

    padded = [{k2: (_pad_layer(u[k2], to) if k2 in ("c1", "c2")
                    else _pc(u[k2], 0, to, 1.0)) for k2 in u}
              for u in units]
    c = x.shape[-1]
    k = padded[0]["c1"]["k"]
    depthwise_chain = all(
        u["c1"]["w"].shape[1] == 1 and u["c1"]["w"].shape[2] == c
        and u["c1"]["k"] == k and u["c2"]["k"] == 1
        and u["c1"]["b"] is not None and u["c2"]["b"] is not None
        for u in padded)
    if depthwise_chain and sp.use_fused_dw_chain(x.shape[1], c, k,
                                                 len(padded)):
        w1s = jnp.stack([u["c1"]["w"][:, 0, :] for u in padded])  # [N,K,C]
        b1s = jnp.stack([u["c1"]["b"] for u in padded])
        a1s = jnp.stack([u["a1"] for u in padded])
        a2s = jnp.stack([u["a2"] for u in padded])
        w2s = jnp.stack([u["c2"]["w"][0] for u in padded])        # [N,C,C]
        b2s = jnp.stack([u["c2"]["b"] for u in padded])
        return sp.snac_res_chain(x, w1s, b1s, a1s, a2s, w2s, b2s,
                                 dilations=tuple(RES_DILATIONS),
                                 t_blk=sp.pick_t_blk(c))
    for u, d in zip(padded, RES_DILATIONS):
        x = _res_unit(x, u, d)
    return x


def _repeat_interleave_t(x: jax.Array, factor: int) -> jax.Array:
    """[B, T, C] → [B, T*factor, C], each frame repeated factor times."""
    b, t, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, t, factor, c)).reshape(b, t * factor, c)


def snac_latent_from_codes(params, c_levels, cfg: SnacConfig) -> jax.Array:
    """c_levels: list of [B, T_fine/s_q] int32 per level → latent [B, T_fine, D]."""
    z = None
    for q, codes, stride in zip(params["q"], c_levels, cfg.vq_strides):
        emb = jnp.take(q["cb"], codes, axis=0)               # [B, t_q, d]
        zq = _conv(emb, q["out"])
        if stride > 1:
            zq = _repeat_interleave_t(zq, stride)
        z = zq if z is None else z + zq
    return z


def _pc(a, axis, to, value=0.0):
    return conv.pad_channels(a, axis, to, value)


def _pad_layer(layer, to, in_axis=True, out_axis=True):
    """Lane-pad a conv layer's weight/bias to 128-multiples (TPU: zero
    channels ride as exact zeros through snake/convs/residuals — the DAC
    decode stack's trick, models/dac.py::_lane_pad)."""
    w = layer["w"]
    if w.shape[1] == 1:                       # depthwise: channel = axis 2
        w = _pc(w, 2, to) if out_axis else w
    else:
        w = _pc(w, 1, to) if in_axis else w
        w = _pc(w, 2, to) if out_axis else w
    return {"w": w, "b": _pc(layer["b"], 0, to) if out_axis else layer["b"],
            "k": layer["k"]}


def snac_decode_fn(params, codes: jax.Array, cfg: SnacConfig) -> jax.Array:
    """codes: packed [B, T_fine, 3] (Orpheus layout) → pcm [B, T_fine*hop]."""
    to = conv.lane_pad()
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    c_levels = [codes[:, ::s, qi] for qi, s in enumerate(cfg.vq_strides)]
    x = snac_latent_from_codes(params, c_levels, cfg)

    x = _conv(x, _pad_layer(params["dec_in_dw"], to),
              padding=(params["dec_in_dw"]["k"] - 1) // 2)
    x = _conv(x, _pad_layer(params["dec_in_pw"], to))
    for blk, s in zip(params["dec_blocks"], cfg.decoder_rates):
        x = act.snake(x, _pc(blk["act"], 0, to, 1.0))
        pad = (s + 1) // 2
        out_pad = s % 2
        w_tr = _pc(_pc(blk["tr"]["w"], 1, to), 2, to)
        b_tr = _pc(blk["tr"]["b"], 0, to)
        if conv.use_conv_matmul():
            # sub-pixel phase matmul instead of XLA's lhs_dilation conv
            # (same form as DAC's decoder upsamples, models/dac.py)
            y = conv.convtr1d_subpixel(x, w_tr, b_tr, stride=s)
        else:
            y = conv.convtr1d(x, w_tr, b_tr, stride=s)
        # torch crop: `padding` from left, `padding - output_padding` from right
        y = y[:, pad: y.shape[1] - (pad - out_pad), :]
        x = y
        # NoiseBlock runs as identity in deterministic decode (snac.cpp:391-397)
        x = _res_units_block(x, blk["units"], to)
    x = act.snake(x, _pc(params["dec_act_final"], 0, to, 1.0))
    fin = dict(params["dec_final"], w=_pc(params["dec_final"]["w"], 1, to))
    x = _conv(x, fin, padding=(params["dec_final"]["k"] - 1) // 2)
    return jnp.tanh(x[..., 0])


def snac_encode_fn(params, pcm: jax.Array, cfg: SnacConfig) -> jax.Array:
    """pcm [B, n] (n multiple of pad_to) → packed codes [B, n/hop, 3]."""
    x = pcm[..., None]
    x = _conv(x, params["enc0"], padding=(params["enc0"]["k"] - 1) // 2)
    for blk, s in zip(params["enc_blocks"], cfg.encoder_rates):
        for u, d in zip(blk["units"], RES_DILATIONS):
            x = _res_unit(x, u, d)
        x = act.snake(x, blk["act"])
        x = _conv(x, blk["down"], stride=s, padding=(s + 1) // 2)
    x = _conv(x, params["enc_final"], padding=(params["enc_final"]["k"] - 1) // 2)

    residual = x
    packed = []
    t_lat = x.shape[1]
    for q, stride in zip(params["q"], cfg.vq_strides):
        pooled = residual
        if stride > 1:
            b, t, c = pooled.shape
            pooled = pooled.reshape(b, t // stride, stride, c).mean(axis=2)
        z = _conv(pooled, q["in"])
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        sims = jnp.einsum("btd,vd->btv", zn, q["cb_norm"],
                          preferred_element_type=jnp.float32)
        idx = jnp.argmax(sims, axis=-1).astype(jnp.int32)     # [B, t_q]
        zq = _conv(jnp.take(q["cb"], idx, axis=0), q["out"])
        if stride > 1:
            zq = _repeat_interleave_t(zq, stride)
            idx = _repeat_interleave_t(idx[..., None], stride)[..., 0]
        residual = residual - zq
        packed.append(idx)
    return jnp.stack(packed, axis=-1)                         # [B, t_lat, 3]


class SnacCodec(CodecModel):
    arch = "snac"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = SnacConfig.from_gguf(reader)
        self.params = load_snac_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.has_encoder = "enc0" in self.params
        self.has_decoder = True

    def _decode_impl(self, codes, n_q):
        return snac_decode_fn(self.params, codes, self.cfg)

    def _encode_impl(self, pcm, n_q):
        return snac_encode_fn(self.params, pcm, self.cfg)

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        codes = np.asarray(codes)
        t = codes.shape[-2]
        if t % self.cfg.vq_strides[0] != 0:
            from ..runtime.model import CodecError
            raise CodecError(f"SNAC n_frames must be a multiple of {self.cfg.vq_strides[0]}")
        return super().decode(codes, n_q=n_q, pcm_format=pcm_format)

    def encode(self, pcm, n_q: int = 0):
        # zero-padding is exact in int16 too — keep i16 input intact so
        # the base encode's half-bytes upload + in-graph /32768 applies
        pcm = np.asarray(pcm)
        if pcm.dtype != np.int16:
            pcm = np.asarray(pcm, np.float32)
        n = pcm.shape[-1]
        pad = -(-n // self.cfg.pad_to) * self.cfg.pad_to - n
        if pad:
            width = [(0, 0)] * (pcm.ndim - 1) + [(0, pad)]
            pcm = np.pad(pcm, width)
        return super().encode(pcm, n_q=n_q)

"""Pocket-Mimi (Pocket-TTS continuous-latent Mimi variant), TPU-native.

Reference behavior: src/models/pocket_mimi.cpp — continuous 32-dim latent at
12.5 Hz ↔ 24 kHz PCM.
decode: out_proj 1x1 (32→512, no bias) → dense-expanded depthwise causal
convtr ×16 → 2-layer transformer (LN/RoPE-NORMAL/LayerScale, window 250) →
SEANet decoder (causal; convtr strides 6,5,4) → PCM.
encode: SEANet encoder (strides 4,5,6) → transformer → stride-16
causal-replicate downsample (no bias) → latent mu.
Weight schema per scripts/converters/pocket_tts.py (pocket_mimi.* names;
fused in_proj split into q/k/v at convert time).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, attn, conv, norms, rope
from ..runtime.model import CodecModel, CodecError


@dataclass(frozen=True)
class PocketMimiConfig:
    sample_rate: int = 24000
    hop_size: int = 1920
    latent_dim: int = 32
    outer_dim: int = 512
    tf_layers: int = 2
    tf_heads: int = 8
    tf_head_dim: int = 64
    tf_context: int = 250
    tf_max_period: float = 10000.0
    decoder_ratios: Tuple[int, ...] = (6, 5, 4)
    encoder_ratios: Tuple[int, ...] = (4, 5, 6)
    resample_stride: int = 16
    has_encoder: bool = True
    has_decoder: bool = True

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "PocketMimiConfig":
        hop = r.get_i32("codec.hop_size", 1920)
        dec_ratios = tuple(r.get_arr("pocket_mimi.decoder_ratios", [6, 5, 4]))
        prod = int(np.prod(dec_ratios)) if dec_ratios else 0
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=hop,
            latent_dim=r.get_i32("codec.latent_dim", 32),
            outer_dim=r.get_i32("pocket_mimi.outer_dim", 512),
            tf_layers=r.get_i32("pocket_mimi.tf_layers", 2),
            tf_heads=r.get_i32("pocket_mimi.tf_heads", 8),
            tf_head_dim=r.get_i32("pocket_mimi.tf_head_dim", 64),
            tf_context=r.get_i32("pocket_mimi.tf_context", 250),
            tf_max_period=r.get_f32("pocket_mimi.tf_max_period", 10000.0),
            decoder_ratios=dec_ratios,
            encoder_ratios=tuple(r.get_arr("pocket_mimi.encoder_ratios", [4, 5, 6])),
            resample_stride=hop // prod if prod > 0 else 16,
            has_encoder=r.get_bool("codec.has_encoder", True),
            has_decoder=r.get_bool("codec.has_decoder", True),
        )


def _cw(r, base, dtype):
    w = r.get(base + ".w")
    b = r.get_or_none(base + ".b")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None}


def _ctw(r, base, dtype):
    w = r.get(base + ".w")
    b = r.get_or_none(base + ".b")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None}


def _tf_layers(r, prefix, n, dtype):
    out = []
    for li in range(n):
        p = f"{prefix}.l{li}"
        out.append({k: jnp.asarray(r.get(f"{p}.{s}")).astype(dtype) for k, s in (
            ("inln_w", "inln.w"), ("inln_b", "inln.b"),
            ("paln_w", "paln.w"), ("paln_b", "paln.b"),
            ("q_w", "attn.q_proj.w"), ("k_w", "attn.k_proj.w"),
            ("v_w", "attn.v_proj.w"), ("o_w", "attn.o_proj.w"),
            ("fc1", "mlp.fc1.w"), ("fc2", "mlp.fc2.w"),
            ("sa", "sa_ls.scale"), ("mlp", "mlp_ls.scale"))})
    return out


def load_pocket_params(r: GGUFReader, cfg: PocketMimiConfig, dtype=jnp.float32):
    p: Dict[str, Any] = {}
    if cfg.has_decoder:
        p["out_proj"] = _cw(r, "pocket_mimi.quant.out_proj", dtype)
        p["upsample"] = _ctw(r, "pocket_mimi.upsample", dtype)
        p["dtr"] = _tf_layers(r, "pocket_mimi.dtr", cfg.tf_layers, dtype)
        p["dec"] = {
            "l0": _cw(r, "pocket_mimi.dec.l0", dtype),
            "stages": [{
                "tr": _ctw(r, f"pocket_mimi.dec.l{li}", dtype),
                "c1": _cw(r, f"pocket_mimi.dec.r{si}.c1", dtype),
                "c2": _cw(r, f"pocket_mimi.dec.r{si}.c2", dtype),
            } for si, li in enumerate((2, 5, 8))],
            "l11": _cw(r, "pocket_mimi.dec.l11", dtype),
        }
    if cfg.has_encoder and r.has_tensor("pocket_mimi.enc.l0.w"):
        p["enc"] = {
            "l0": _cw(r, "pocket_mimi.enc.l0", dtype),
            "stages": [{
                "c1": _cw(r, f"pocket_mimi.enc.r{si}.c1", dtype),
                "c2": _cw(r, f"pocket_mimi.enc.r{si}.c2", dtype),
                "dn": _cw(r, f"pocket_mimi.enc.l{li}", dtype),
            } for si, li in enumerate((3, 6, 9))],
            "l11": _cw(r, "pocket_mimi.enc.l11", dtype),
        }
        p["etr"] = _tf_layers(r, "pocket_mimi.etr", cfg.tf_layers, dtype)
        p["downsample"] = {"w": conv.prepare_conv_weight(
            r.get("pocket_mimi.downsample.w")).astype(dtype), "b": None}
    return p


def _resblock(x, c1, c2):
    h = act.elu(x)
    h = conv.conv1d_causal(h, c1["w"], c1["b"])
    h = act.elu(h)
    h = conv.conv1d_causal(h, c2["w"], c2["b"])
    return x + h


def _transformer(x, layers, cfg: PocketMimiConfig):
    rope_fn = partial(rope.apply_rope, theta=cfg.tf_max_period, neox=False)
    for lw in layers:
        h = norms.layer_norm(x, lw["inln_w"], lw["inln_b"], 1e-5)
        a = attn.mha(h, lw["q_w"], lw["k_w"], lw["v_w"], lw["o_w"],
                     n_heads=cfg.tf_heads, rope_fn=rope_fn, causal=True,
                     window=cfg.tf_context if cfg.tf_context > 0 else None)
        x = x + a * lw["sa"]
        m = norms.layer_norm(x, lw["paln_w"], lw["paln_b"], 1e-5)
        m = act.gelu_erf(m @ lw["fc1"].T) @ lw["fc2"].T
        x = x + m * lw["mlp"]
    return x


def pocket_decode_latent_fn(params, latent: jax.Array, cfg: PocketMimiConfig) -> jax.Array:
    """latent [B, T, 32] → pcm [B, T*hop]."""
    x = conv.conv1d(latent, params["out_proj"]["w"], None)
    x = conv.convtr1d_causal(x, params["upsample"]["w"], None, stride=cfg.resample_stride)
    x = _transformer(x, params["dtr"], cfg)
    d = params["dec"]
    x = conv.conv1d_causal(x, d["l0"]["w"], d["l0"]["b"])
    for stage, stride in zip(d["stages"], cfg.decoder_ratios):
        x = act.elu(x)
        x = conv.convtr1d_causal(x, stage["tr"]["w"], stage["tr"]["b"], stride=stride)
        x = _resblock(x, stage["c1"], stage["c2"])
    x = act.elu(x)
    x = conv.conv1d_causal(x, d["l11"]["w"], d["l11"]["b"])
    return x[..., 0]


def pocket_encode_latent_fn(params, pcm: jax.Array, cfg: PocketMimiConfig,
                            n_valid=None) -> jax.Array:
    """pcm [B, n] → latent mu [B, ceil(n/hop), 32].

    `n_valid` (traced scalar): true sample count before the hop-multiple
    zero pad. Same per-layer padding semantics as the Mimi encoder
    (reference conv1d.cpp:179 extra_pad; see models/mimi.py
    mimi_encode_fn): zeros beyond the valid length before each strided
    conv, replicate for the final downsample's extra pad."""
    if n_valid is None:
        n_valid = pcm.shape[-1]
    v = n_valid
    e = params["enc"]
    x = conv.conv1d_causal(pcm[..., None], e["l0"]["w"], e["l0"]["b"])
    for stage, stride in zip(e["stages"], cfg.encoder_ratios):
        x = _resblock(x, stage["c1"], stage["c2"])
        x = act.elu(x)
        t = jnp.arange(x.shape[1])[None, :, None]
        x = jnp.where(t < v, x, jnp.zeros((), x.dtype))
        x = conv.conv1d_causal(x, stage["dn"]["w"], stage["dn"]["b"], stride=stride)
        v = (v + stride - 1) // stride
    x = act.elu(x)
    x = conv.conv1d_causal(x, e["l11"]["w"], e["l11"]["b"])
    x = _transformer(x, params["etr"], cfg)
    idx = jnp.minimum(jnp.arange(x.shape[1]), v - 1)
    x = jnp.take(x, idx, axis=1)
    return conv.conv1d_causal(x, params["downsample"]["w"], None,
                              stride=cfg.resample_stride, pad_mode="replicate")


class PocketMimiCodec(CodecModel):
    arch = "pocket_mimi"

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = PocketMimiConfig.from_gguf(reader)
        self.params = load_pocket_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.latent_dim = self.cfg.latent_dim
        self.n_q = 0
        self.has_encoder = "enc" in self.params
        self.has_decoder = "dec" in self.params

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        raise CodecError("Pocket-Mimi is a continuous-latent codec; use decode_latent")

    def decode_latent(self, latent, pcm_format: str = "f32") -> np.ndarray:
        latent = np.asarray(latent, dtype=np.float32)
        squeeze = latent.ndim == 2
        if squeeze:
            latent = latent[None]
        if latent.shape[-1] != self.cfg.latent_dim:
            raise CodecError(f"latent_dim mismatch: {latent.shape[-1]} != {self.cfg.latent_dim}")
        pcm = self._run_batched(
            ("dec_lat",),
            lambda: lambda z: pocket_decode_latent_fn(self.params, z, self.cfg),
            latent, pcm_format=pcm_format)
        return pcm[0] if squeeze else pcm

    def streaming_decoder(self, batch: int = 1) -> "PocketStreamingDecoder":
        """Open a latent-streaming vocoder session (chunk-exact vs
        decode_latent; realtime-TTS path)."""
        if not self.has_decoder:
            raise CodecError("pocket_mimi: model has no decoder")
        return PocketStreamingDecoder(self, batch=batch)

    def encode_latent(self, pcm) -> np.ndarray:
        """PCM → continuous latent mu (reference: codec_pocket_mimi_encode)."""
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        n = pcm.shape[1]
        pad = -(-n // self.hop_size) * self.hop_size - n
        if pad:
            pcm = np.pad(pcm, ((0, 0), (0, pad)))
        mu = self._run_batched(
            ("enc_lat",),
            lambda: lambda x, nv: pocket_encode_latent_fn(
                self.params, x, self.cfg, n_valid=nv),
            pcm, extra=(np.int32(n),))
        return mu[0] if squeeze else mu

    def encode(self, pcm, n_q: int = 0):
        raise CodecError("Pocket-Mimi encode produces a continuous latent; use encode_latent")


# ---------------------------------------------------------------------------
# Streaming (chunked) latent decode — the realtime-TTS vocoder direction:
# the FlowLM emits one 32-d latent per 80 ms frame; pushing each frame
# through this path gives time-to-first-audio of one step instead of
# waiting for the full utterance. Chunk-exact vs pocket_decode_latent_fn.
# ---------------------------------------------------------------------------

def _transformer_stream_list(x, layers, cfg: PocketMimiConfig, kv, pos0):
    """Unrolled-layer streaming attention (rope NORMAL, window tf_context).
    kv: [L, 2, B, H, W-1, D]."""
    b, tc, _ = x.shape
    w1 = kv.shape[4]
    d = cfg.tf_head_dim
    window = cfg.tf_context if cfg.tf_context > 0 else None
    qpos = pos0 + jnp.arange(tc)
    kpos = pos0 - w1 + jnp.arange(w1 + tc)
    ok = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] >= 0)
    if window:
        ok &= kpos[None, :] > qpos[:, None] - window
    mask = jnp.where(ok, 0.0, -1e30)

    new_kv = []
    for li, lw in enumerate(layers):
        h = norms.layer_norm(x, lw["inln_w"], lw["inln_b"], 1e-5)
        q = (h @ lw["q_w"].T).reshape(b, tc, cfg.tf_heads, d).transpose(0, 2, 1, 3)
        k = (h @ lw["k_w"].T).reshape(b, tc, cfg.tf_heads, d).transpose(0, 2, 1, 3)
        v = (h @ lw["v_w"].T).reshape(b, tc, cfg.tf_heads, d).transpose(0, 2, 1, 3)
        q = rope.apply_rope(q, positions=qpos, theta=cfg.tf_max_period, neox=False)
        k = rope.apply_rope(k, positions=qpos, theta=cfg.tf_max_period, neox=False)
        k_ctx = jnp.concatenate([kv[li, 0], k], axis=2)
        v_ctx = jnp.concatenate([kv[li, 1], v], axis=2)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_ctx,
                            preferred_element_type=jnp.float32)
        logits = logits * (d ** -0.5) + mask[None, None]
        wts = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v_ctx.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", wts, v_ctx)
        a = ctx.transpose(0, 2, 1, 3).reshape(b, tc, cfg.tf_heads * d) @ lw["o_w"].T
        x = x + a * lw["sa"]
        m = norms.layer_norm(x, lw["paln_w"], lw["paln_b"], 1e-5)
        m = act.gelu_erf(m @ lw["fc1"].T) @ lw["fc2"].T
        x = x + m * lw["mlp"]
        new_kv.append(jnp.stack([k_ctx[:, :, -w1:], v_ctx[:, :, -w1:]]))
    return x, jnp.stack(new_kv)


def pocket_decode_stream_init(params, cfg: PocketMimiConfig, batch: int = 1,
                              dtype=jnp.float32):
    def cst(layer, stride=1):
        k, cin = layer["w"].shape[0], layer["w"].shape[1]
        return conv.conv1d_causal_stream_init(batch, cin, k, stride, dtype=dtype)

    def tst(layer, stride):
        k, cout = layer["w"].shape[0], layer["w"].shape[2]
        return conv.convtr1d_causal_stream_init(batch, cout, k, stride, dtype=dtype)

    d = params["dec"]
    w1 = (cfg.tf_context if cfg.tf_context > 0 else 1) - 1
    return {
        "pos": jnp.zeros((), jnp.int32),
        "up": tst(params["upsample"], cfg.resample_stride),
        "kv": jnp.zeros((cfg.tf_layers, 2, batch, cfg.tf_heads, w1,
                         cfg.tf_head_dim), dtype),
        "l0": cst(d["l0"]),
        "stages": [{"tr": tst(s["tr"], st), "c1": cst(s["c1"]),
                    "c2": cst(s["c2"])}
                   for s, st in zip(d["stages"], cfg.decoder_ratios)],
        "l11": cst(d["l11"]),
    }


def pocket_decode_stream_step(params, state, latent: jax.Array,
                              cfg: PocketMimiConfig):
    """latent [B, Tc, 32] → (pcm [B, Tc*hop], new state)."""
    x = conv.conv1d(latent, params["out_proj"]["w"], None)
    ns = {"stages": []}
    x, ns["up"] = conv.convtr1d_causal_stream(
        x, params["upsample"]["w"], None, state["up"], stride=cfg.resample_stride)
    x, ns["kv"] = _transformer_stream_list(x, params["dtr"], cfg,
                                           state["kv"], state["pos"])
    ns["pos"] = state["pos"] + x.shape[1]
    d = params["dec"]
    x, ns["l0"] = conv.conv1d_causal_stream(x, d["l0"]["w"], d["l0"]["b"],
                                            state["l0"])
    for st, (stage, stride) in zip(state["stages"],
                                   zip(d["stages"], cfg.decoder_ratios)):
        nst = {}
        x = act.elu(x)
        x, nst["tr"] = conv.convtr1d_causal_stream(
            x, stage["tr"]["w"], stage["tr"]["b"], st["tr"], stride=stride)
        h = act.elu(x)
        h, nst["c1"] = conv.conv1d_causal_stream(h, stage["c1"]["w"],
                                                 stage["c1"]["b"], st["c1"])
        h = act.elu(h)
        h, nst["c2"] = conv.conv1d_causal_stream(h, stage["c2"]["w"],
                                                 stage["c2"]["b"], st["c2"])
        x = x + h
        ns["stages"].append(nst)
    x = act.elu(x)
    x, ns["l11"] = conv.conv1d_causal_stream(x, d["l11"]["w"], d["l11"]["b"],
                                             state["l11"])
    return x[..., 0], ns


class PocketStreamingDecoder:
    """Push latent frames [Tc, 32], receive PCM — the realtime-TTS vocoder
    session. Chunk-exact vs decode_latent()."""

    def __init__(self, model: "PocketMimiCodec", batch: int = 1):
        self.model = model
        self.batch = batch
        # snapshot under the trace lock: concurrent first-compiles swap
        # tracers into model.params (runtime/model.py); an unlocked read
        # from a server thread raced into TracerArrayConversionError
        with model._trace_lock:
            self._params = model.params
        self.state = pocket_decode_stream_init(self._params, model.cfg,
                                               batch, dtype=model.compute_dtype)
        cfg = model.cfg
        self._step = jax.jit(
            lambda p, s, z: pocket_decode_stream_step(p, s, z, cfg),
            donate_argnums=(1,))

    def push(self, latent) -> np.ndarray:
        latent = np.asarray(latent, np.float32)
        squeeze = latent.ndim == 2
        if squeeze:
            latent = latent[None]
        pcm, self.state = self._step(self._params, self.state,
                                     jnp.asarray(latent))
        pcm = np.asarray(pcm)
        return pcm[0] if squeeze else pcm

    def reset(self) -> None:
        self.state = pocket_decode_stream_init(
            self._params, self.model.cfg, self.batch,
            dtype=self.model.compute_dtype)

"""MOSS-Audio-Tokenizer (Nano + full), TPU-native.

Reference behavior: src/models/moss_audio.cpp — pure-Transformer codec:
alternating PatchedPretransform reshapes (time→channel folding) and causal
sliding-window Transformer blocks (fused QKV, RoPE-NORMAL interleaved,
LayerScale, tanh-GELU FFN) around a 16-level residual cosine-LFQ quantizer.
Stereo handled by channel interleaving into one mono-equivalent stream
(moss.channel_interleave). The per-block schema (patch sizes, dims, layers,
window durations, rope periods) comes entirely from GGUF metadata, so one
implementation serves Nano and the 1.6B variant.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, attn, norms, rope
from ..runtime.model import CodecModel, CodecError


@dataclass(frozen=True)
class MossModuleCfg:
    kind: int              # 0 = patch, 1 = transformer
    patch: int = 1
    in_dim: int = 0
    out_dim: int = 0
    d_model: int = 0
    n_heads: int = 0
    n_layers: int = 0
    context_duration: float = 0.0
    max_period: float = 10000.0


@dataclass(frozen=True)
class MossConfig:
    sample_rate: int = 24000
    hop_size: int = 1920
    n_q: int = 16
    codebook_size: int = 1024
    codebook_dim: int = 16
    latent_dim: int = 1024
    rvq_dim: int = 1024
    number_channels: int = 1
    channel_interleave: bool = True
    enc_modules: Tuple[MossModuleCfg, ...] = ()
    dec_modules: Tuple[MossModuleCfg, ...] = ()

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "MossConfig":
        def mods(side: str) -> Tuple[MossModuleCfg, ...]:
            n = r.get_i32(f"moss.{side}.n_modules", 0)
            kinds = r.get_arr(f"moss.{side}.module_types", [1] * n)
            patch = r.get_arr(f"moss.{side}.patch_sizes", [1] * n)
            ind = r.get_arr(f"moss.{side}.in_dims", [0] * n)
            outd = r.get_arr(f"moss.{side}.out_dims", [0] * n)
            dm = r.get_arr(f"moss.{side}.d_models", [0] * n)
            nh = r.get_arr(f"moss.{side}.n_heads", [0] * n)
            nl = r.get_arr(f"moss.{side}.n_layers", [0] * n)
            cd = r.get_arr(f"moss.{side}.context_durations", [0.0] * n)
            mp = r.get_arr(f"moss.{side}.max_periods", [10000.0] * n)
            return tuple(MossModuleCfg(int(kinds[i]), int(patch[i]), int(ind[i]),
                                       int(outd[i]), int(dm[i]), int(nh[i]),
                                       int(nl[i]), float(cd[i]), float(mp[i]))
                         for i in range(n))

        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=r.get_i32("codec.hop_size", 1920),
            n_q=r.get_i32("codec.n_q", 16),
            codebook_size=r.get_i32("codec.codebook_size", 1024),
            codebook_dim=r.get_i32("codec.codebook_dim", 16),
            latent_dim=r.get_i32("codec.latent_dim", 1024),
            rvq_dim=r.get_i32("moss.rvq_dim", 1024),
            number_channels=r.get_i32("moss.number_channels", 1),
            channel_interleave=r.get_bool("moss.channel_interleave", True),
            enc_modules=mods("enc"),
            dec_modules=mods("dec"),
        )


def load_moss_params(r: GGUFReader, cfg: MossConfig, dtype=jnp.float32):
    def g(n):
        return jnp.asarray(r.get(n)).astype(dtype)

    def gopt(n):
        a = r.get_or_none(n)
        return jnp.asarray(a).astype(dtype) if a is not None else None

    def transformer_block(base: str, n_layers: int):
        blk = {"in_proj": gopt(base + ".input_proj.w"),
               "out_proj": gopt(base + ".output_proj.w"), "layers": []}
        for li in range(n_layers):
            lp = f"{base}.l{li}"
            blk["layers"].append({k: g(f"{lp}.{n}") for k, n in (
                ("n1w", "norm1.w"), ("n1b", "norm1.b"),
                ("n2w", "norm2.w"), ("n2b", "norm2.b"),
                ("qkv", "attn.qkv.w"), ("out", "attn.out.w"),
                ("fc1", "ffn.fc1.w"), ("fc2", "ffn.fc2.w"),
                ("ls1", "ls1"), ("ls2", "ls2"))})
        return blk

    p: Dict[str, Any] = {"q": []}
    for qi in range(cfg.n_q):
        base = f"moss.q.{qi}"
        p["q"].append({
            "in_w": g(base + ".in_proj.w")[:, :, 0], "in_b": g(base + ".in_proj.b"),
            "out_w": g(base + ".out_proj.w")[:, :, 0], "out_b": g(base + ".out_proj.b"),
            "cb": g(base + ".codebook"),
            "cb_norm": g(base + ".codebook_norm"),
        })
    p["q_output_proj_w"] = g("moss.q.output_proj.w")[:, :, 0]
    p["q_output_proj_b"] = g("moss.q.output_proj.b")

    if r.has_tensor("moss.q.input_proj.w"):
        p["q_input_proj_w"] = g("moss.q.input_proj.w")[:, :, 0]
        p["q_input_proj_b"] = g("moss.q.input_proj.b")
        p["enc"] = [transformer_block(f"moss.enc.b{mi}", m.n_layers)
                    if m.kind == 1 else None
                    for mi, m in enumerate(cfg.enc_modules)]
    p["dec"] = [transformer_block(f"moss.dec.b{mi}", m.n_layers)
                if m.kind == 1 else None
                for mi, m in enumerate(cfg.dec_modules)]
    return p


def _patch_encode(x: jax.Array, patch: int) -> jax.Array:
    """[B, T, C] → [B, T/p, C*p] with channel layout c*p + p_idx
    (reference: codec_moss_patch_encode)."""
    if patch <= 1:
        return x
    b, t, c = x.shape
    x = x.reshape(b, t // patch, patch, c)
    return x.transpose(0, 1, 3, 2).reshape(b, t // patch, c * patch)


def _patch_decode(x: jax.Array, patch: int) -> jax.Array:
    if patch <= 1:
        return x
    b, t, c = x.shape
    c_out = c // patch
    x = x.reshape(b, t, c_out, patch)
    return x.transpose(0, 1, 3, 2).reshape(b, t * patch, c_out)


def _moss_layer(x, lw, n_heads, theta, window, n_valid):
    b, t, c = x.shape
    d = c // n_heads
    h = norms.layer_norm(x, lw["n1w"], lw["n1b"], 1e-5)
    qkv = h @ lw["qkv"].T                               # [B,T,3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    q = rope.apply_rope(q, theta=theta, neox=False)
    k = rope.apply_rope(k, theta=theta, neox=False)
    m = attn.attn_mask(t, t, causal=True, window=window if window and window > 0 else None)
    if n_valid is not None:
        kj = jnp.arange(t)[None, :]
        m = m + jnp.where(kj < n_valid, 0.0, attn.NEG_INF)
    ctx = attn.sdpa(q, k, v, mask=m)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + (ctx @ lw["out"].T) * lw["ls1"]
    h = norms.layer_norm(x, lw["n2w"], lw["n2b"], 1e-5)
    h = act.gelu_tanh(h @ lw["fc1"].T) @ lw["fc2"].T
    return x + h * lw["ls2"]


def _projected_transformer(x, blk, mod: MossModuleCfg, window, n_valid):
    if blk["in_proj"] is not None:
        x = x @ blk["in_proj"].T
    for lw in blk["layers"]:
        x = _moss_layer(x, lw, mod.n_heads, mod.max_period, window, n_valid)
    if blk["out_proj"] is not None:
        x = x @ blk["out_proj"].T
    return x


def _win_tokens(cfg: MossConfig, duration: float, cum_down: int) -> int:
    fr = cfg.sample_rate * (cfg.number_channels if cfg.channel_interleave else 1)
    return int(round(duration * fr / cum_down))


def moss_encode_fn(params, pcm: jax.Array, cfg: MossConfig,
                   n_valid_pcm: int) -> jax.Array:
    """pcm [B, n_mono_eq] → codes [B, n/hop_total, n_q]."""
    x = pcm[..., None]
    cum = 1
    for mi, mod in enumerate(cfg.enc_modules):
        if mod.kind == 0:
            x = _patch_encode(x, mod.patch)
            cum *= mod.patch
        else:
            window = _win_tokens(cfg, mod.context_duration, cum)
            n_valid = n_valid_pcm // cum
            x = _projected_transformer(x, params["enc"][mi], mod, window, n_valid)

    x = x @ params["q_input_proj_w"].T + params["q_input_proj_b"]
    residual = x
    codes = []
    for q in params["q"]:
        z = residual @ q["in_w"].T + q["in_b"]
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        sims = jnp.einsum("btd,vd->btv", zn, q["cb_norm"],
                          preferred_element_type=jnp.float32)
        idx = jnp.argmax(sims, axis=-1).astype(jnp.int32)
        codes.append(idx)
        zq = jnp.take(q["cb"], idx, axis=0) @ q["out_w"].T + q["out_b"]
        residual = residual - zq
    return jnp.stack(codes, axis=-1)


def moss_decode_fn(params, codes: jax.Array, cfg: MossConfig) -> jax.Array:
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    acc = None
    for qi, q in enumerate(params["q"]):
        zq = jnp.take(q["cb"], codes[..., qi], axis=0) @ q["out_w"].T + q["out_b"]
        acc = zq if acc is None else acc + zq
    x = acc @ params["q_output_proj_w"].T + params["q_output_proj_b"]

    n_dec = len(cfg.dec_modules)
    for mi, mod in enumerate(cfg.dec_modules):
        if mod.kind == 0:
            x = _patch_decode(x, mod.patch)
        else:
            cum_rem = 1
            for j in range(mi + 1, n_dec):
                if cfg.dec_modules[j].kind == 0:
                    cum_rem *= cfg.dec_modules[j].patch
            window = _win_tokens(cfg, mod.context_duration, cum_rem)
            x = _projected_transformer(x, params["dec"][mi], mod, window, None)
    return x[..., 0]                                   # [B, n_mono_eq]


class MossAudioCodec(CodecModel):
    arch = "moss_audio_tokenizer"
    causal_time = True         # fully causal transformer stacks

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = MossConfig.from_gguf(reader)
        self.params = load_moss_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.expected_channels = self.cfg.number_channels
        self.has_encoder = "q_input_proj_w" in self.params
        self.has_decoder = True

    def encode(self, pcm, n_q: int = 0):
        """pcm [n] mono or [n, channels] (interleaved to one mono-eq stream,
        reference: codec_moss_run_encode per-channel hop padding)."""
        pcm = self._pcm_host_f32(pcm)
        nch = self.cfg.number_channels
        if pcm.ndim == 2 and pcm.shape[1] == nch and nch > 1:
            per_ch = pcm.shape[0]
        else:
            pcm = pcm.reshape(-1, 1)
            per_ch = pcm.shape[0]
            nch = 1
        hop = self.hop_size
        pad = (-per_ch) % hop
        if pad:
            pcm = np.pad(pcm, ((0, pad), (0, 0)))
        flat = pcm.reshape(-1)                          # interleaved mono-eq
        n_valid = per_ch * nch if self.cfg.channel_interleave else per_ch
        fn = self._jitted(("enc", flat.shape[0], n_valid),
                          lambda: lambda x: moss_encode_fn(self.params, x,
                                                           self.cfg, n_valid))
        codes = np.asarray(jax.block_until_ready(
            fn(self._place_f(flat[None]))))[0]
        return codes

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        codes = np.asarray(codes, np.int32)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        fn = self._jitted(
            ("dec", pcm_format) + codes.shape,
            lambda: lambda c: self._fmt_out(
                moss_decode_fn(self.params, c, self.cfg), pcm_format))
        pcm = np.asarray(jax.block_until_ready(fn(jnp.asarray(codes))))
        nch = self.cfg.number_channels
        if nch > 1:
            pcm = pcm.reshape(pcm.shape[0], -1, nch)
        return pcm[0] if squeeze else pcm

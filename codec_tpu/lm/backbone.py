"""JAX llama-family backbone — the host LLM for codebook-AR TTS flows.

Reference boundary: the reference keeps the backbone OUT of the codec
library and talks to llama.cpp through libttsbackbone (SURVEY layer 7;
common/tts_runner.cpp:1096-1113 — init checks n_embd == lm hidden). The
TPU-native equivalent is this module: a llama-style decoder that satisfies
the `tts_runner.Backbone` protocol (step(embed)→hidden), loaded from a
backbone GGUF produced by convert/backbone.py (the analog of
scripts/convert-backbone-to-gguf.py, which writes llama.cpp GGUFs).

Covers the reference's backbone families: Llama 3.x (CSM — llama3 rope
scaling via baked freq factors), Qwen3 (GQA + per-head q/k RMS norm,
optional attention bias), plain Llama/Qwen2.

Design: the KV cache is a fixed [L, 2, n_kv, max_ctx, D] buffer carried
functionally through jitted prefill/step functions (donated, so XLA
updates it in place); attention masks by absolute position against the
full static-length cache — static shapes, no per-step recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..io.gguf import GGUFReader
from ..ops import norms, rope

NEG_INF = -1e30


@dataclass
class BackboneConfig:
    hidden: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    ffn_dim: int
    vocab_size: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_ctx: int = 4096
    has_qk_norm: bool = False
    has_attn_bias: bool = False
    tied_lm_head: bool = True

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "BackboneConfig":
        return cls(
            hidden=r.get_i32("backbone.hidden_dim"),
            n_layers=r.get_i32("backbone.n_layers"),
            n_heads=r.get_i32("backbone.n_heads"),
            n_kv_heads=r.get_i32("backbone.n_kv_heads"),
            head_dim=r.get_i32("backbone.head_dim"),
            ffn_dim=r.get_i32("backbone.ffn_dim"),
            vocab_size=r.get_i32("backbone.vocab_size"),
            rope_theta=r.get_f32("backbone.rope_theta", 10000.0),
            rms_eps=r.get_f32("backbone.rms_eps", 1e-5),
            max_ctx=r.get_i32("backbone.max_ctx", 4096),
            has_qk_norm=r.get_bool("backbone.qk_norm", False),
            has_attn_bias=r.get_bool("backbone.attn_bias", False),
            tied_lm_head=r.get_bool("backbone.tied_lm_head", True),
        )


def load_backbone_params(r: GGUFReader, cfg: BackboneConfig,
                         dtype=jnp.float32,
                         quantized: bool = False) -> Dict[str, Any]:
    """quantized=True keeps Q8_0/Q4_K layer matmul weights HBM-resident in
    packed quantized form, executed by the fused dequant-matmul Pallas
    kernels (ops/qmat_pallas.py) — the reference runs quantized weights
    natively in ggml mul_mat; round 1 dequantized everything on load
    (4-8x the checkpoint's HBM). Norms/embeddings stay dense."""
    from ..ops import qmat_pallas

    def get(name, required=True):
        if not r.has_tensor(name):
            if required:
                raise KeyError(f"backbone tensor missing: {name}")
            return None
        return jnp.asarray(r.get(name), dtype)

    def get_mat(name):
        if quantized and r.has_tensor(name):
            try:
                qt = qmat_pallas.pack_tensor(r, name)
                return {k: jnp.asarray(v) for k, v in qt.items()}
            except ValueError:
                pass                                  # F16/F32 tensor
        return get(name)

    p: Dict[str, Any] = {"tok_embd": get("backbone.tok_embd"),
                         "out_norm": get("backbone.out_norm.w")}
    ff = get("backbone.rope_freq_factors", required=False)
    p["freq_factors"] = None if ff is None else ff.astype(jnp.float32)
    if not cfg.tied_lm_head:
        p["lm_head"] = get("backbone.lm_head.w")
    layers = []
    for i in range(cfg.n_layers):
        pre = f"backbone.l{i}."
        lw = {k: get_mat(pre + n) for k, n in
              (("q", "q.w"), ("k", "k.w"), ("v", "v.w"), ("o", "o.w"),
               ("gate", "gate.w"), ("up", "up.w"), ("down", "down.w"))}
        lw["attn_norm"] = get(pre + "attn_norm.w")
        lw["ffn_norm"] = get(pre + "ffn_norm.w")
        if cfg.has_attn_bias:
            for k, n in (("q_b", "q.b"), ("k_b", "k.b"), ("v_b", "v.b")):
                lw[k] = get(pre + n)
        if cfg.has_qk_norm:
            lw["q_norm"] = get(pre + "q_norm.w")
            lw["k_norm"] = get(pre + "k_norm.w")
        layers.append(lw)
    # stack homogeneous layers for lax.scan
    p["layers"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return p


def _mm(h: jax.Array, w) -> jax.Array:
    """h @ w.T for dense [out, in] weights or packed quant dicts."""
    if isinstance(w, dict):
        from ..ops.qmat_pallas import qmatmul

        return qmatmul(h, w).astype(h.dtype)
    return h @ w.T


def _rope(x, positions, cfg: BackboneConfig, freq_factors):
    """NEOX rope at absolute positions, with optional llama3 freq factors."""
    if freq_factors is None:
        return rope.apply_rope(x, positions=positions, theta=cfg.rope_theta,
                               neox=True)
    inv = rope.rope_freqs(cfg.head_dim, cfg.rope_theta) / freq_factors
    ang = positions.astype(jnp.float32)[:, None] * inv[None]
    cos, sin = jnp.cos(ang)[None, None], jnp.sin(ang)[None, None]
    d = cfg.head_dim
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


def backbone_forward(params: Dict[str, Any], kv: jax.Array, pos0: jax.Array,
                     x: jax.Array, cfg: BackboneConfig
                     ) -> Tuple[jax.Array, jax.Array]:
    """x: [T, hidden] new-token embeddings at positions pos0..pos0+T-1.
    kv: [L, 2, n_kv, max_ctx, D]. → (hiddens [T, hidden], new kv)."""
    t = x.shape[0]
    positions = pos0 + jnp.arange(t)
    key_pos = jnp.arange(cfg.max_ctx)
    # causal-vs-cache mask: query at pos p attends keys with key_pos <= p
    mask = jnp.where(key_pos[None, :] <= positions[:, None], 0.0, NEG_INF)

    ff = params["freq_factors"]

    def body(xb_kv, lw_i):
        xb, kv_all, li = xb_kv
        h = norms.rms_norm(xb, lw_i["attn_norm"], cfg.rms_eps)
        q = _mm(h, lw_i["q"])
        k = _mm(h, lw_i["k"])
        v = _mm(h, lw_i["v"])
        if cfg.has_attn_bias:
            q, k, v = q + lw_i["q_b"], k + lw_i["k_b"], v + lw_i["v_b"]
        q = q.reshape(t, cfg.n_heads, cfg.head_dim).transpose(1, 0, 2)
        k = k.reshape(t, cfg.n_kv_heads, cfg.head_dim).transpose(1, 0, 2)
        v = v.reshape(t, cfg.n_kv_heads, cfg.head_dim).transpose(1, 0, 2)
        if cfg.has_qk_norm:       # per-head RMS over head_dim (Qwen3)
            q = norms.rms_norm(q, lw_i["q_norm"], cfg.rms_eps)
            k = norms.rms_norm(k, lw_i["k_norm"], cfg.rms_eps)
        q = _rope(q[None], positions, cfg, ff)[0]
        k = _rope(k[None], positions, cfg, ff)[0]

        kv_l = kv_all[li]
        k_cache = jax.lax.dynamic_update_slice(kv_l[0], k, (0, pos0, 0))
        v_cache = jax.lax.dynamic_update_slice(kv_l[1], v, (0, pos0, 0))
        kv_all = kv_all.at[li].set(jnp.stack([k_cache, v_cache]))

        rep = cfg.n_heads // cfg.n_kv_heads
        kk = jnp.repeat(k_cache, rep, axis=0)
        vv = jnp.repeat(v_cache, rep, axis=0)
        logits = jnp.einsum("htd,hkd->htk", q, kk,
                            preferred_element_type=jnp.float32)
        logits = logits * (cfg.head_dim ** -0.5) + mask[None]
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vv.dtype)
        ctx = jnp.einsum("htk,hkd->htd", w, vv)
        ctx = ctx.transpose(1, 0, 2).reshape(t, cfg.n_heads * cfg.head_dim)
        xb = xb + _mm(ctx, lw_i["o"])

        h = norms.rms_norm(xb, lw_i["ffn_norm"], cfg.rms_eps)
        g = jax.nn.silu(_mm(h, lw_i["gate"])) * _mm(h, lw_i["up"])
        xb = xb + _mm(g, lw_i["down"])
        return (xb, kv_all, li + 1), None

    (xb, kv, _), _ = jax.lax.scan(body, (x, kv, 0), params["layers"])
    return norms.rms_norm(xb, params["out_norm"], cfg.rms_eps), kv


class LlamaBackbone:
    """Loads a backbone GGUF and exposes the tts_runner Backbone protocol
    plus embed_tokens / text_logits / prefill."""

    def __init__(self, path_or_reader, dtype=jnp.float32, max_ctx: int = 0,
                 quantized: bool | None = None):
        r = path_or_reader if isinstance(path_or_reader, GGUFReader) \
            else GGUFReader(path_or_reader)
        if r.architecture != "llama_backbone":
            raise ValueError(f"not a backbone GGUF: {r.architecture!r}")
        self.cfg = BackboneConfig.from_gguf(r)
        if max_ctx:
            self.cfg.max_ctx = max_ctx
        if quantized is None:
            import os

            quantized = bool(os.environ.get("CODEC_QUANT_EXEC"))
        self.params = load_backbone_params(r, self.cfg, dtype,
                                           quantized=quantized)
        self.dtype = dtype
        self._fns: Dict[int, Any] = {}
        self.reset()

    # -- state -------------------------------------------------------------
    def reset(self) -> None:
        c = self.cfg
        kv = jnp.zeros((c.n_layers, 2, c.n_kv_heads, c.max_ctx,
                        c.head_dim), self.dtype)
        if getattr(self, "_kv_sharding", None) is not None:
            kv = jax.device_put(kv, self._kv_sharding)
        self.kv = kv
        self.pos = 0

    # -- tensor parallelism --------------------------------------------------
    def set_mesh(self, mesh, axis: str = "tp") -> None:
        """Shard the backbone tensor-parallel over `mesh` (Megatron layout):
        column-parallel q/k/v/gate/up, row-parallel o/down — XLA's SPMD
        partitioner inserts the all-reduce after each row-parallel
        contraction — and the KV cache split on its kv-head axis. Inputs
        and per-token hiddens stay replicated, so `step`/`prefill`/the
        fused generation chunk (lm/fused_gen.py) are unchanged: jit
        follows the argument shardings.

        Requires n_heads, n_kv_heads and ffn_dim divisible by the mesh
        size (GQA groups stay chip-local). Packed-quantized weights
        (quantized=True) are not supported — their Pallas matmuls would
        need manual shard_map partitioning.

        Reference contrast: the reference is single-device by design
        (SURVEY §2.7); multi-chip TP on the TTS backbone is where a
        billion-parameter host LLM benefits from ICI."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        c = self.cfg
        ntp = int(mesh.shape[axis])
        for name, dim in (("n_heads", c.n_heads), ("n_kv_heads", c.n_kv_heads),
                          ("ffn_dim", c.ffn_dim)):
            if dim % ntp:
                raise ValueError(f"backbone TP: {name}={dim} not divisible "
                                 f"by mesh size {ntp}")
        if any(isinstance(self.params["layers"].get(k), dict)
               for k in ("q", "k", "v", "o", "gate", "up", "down")):
            raise ValueError("backbone TP: packed-quantized weights are "
                             "not supported; load with quantized=False")

        def sh(*spec):
            return NamedSharding(mesh, P(*spec))

        col, row = sh(None, axis, None), sh(None, None, axis)
        specs = {"q": col, "k": col, "v": col, "gate": col, "up": col,
                 "o": row, "down": row,
                 "q_b": sh(None, axis), "k_b": sh(None, axis),
                 "v_b": sh(None, axis)}
        repl = sh()
        layers = {k: jax.device_put(v, specs.get(k, repl))
                  for k, v in self.params["layers"].items()}
        self.params = {
            **{k: (v if v is None or k == "layers"
                   else jax.device_put(v, repl))
               for k, v in self.params.items()},
            "layers": layers,
        }
        self._kv_sharding = sh(None, None, axis, None, None)
        self.kv = jax.device_put(self.kv, self._kv_sharding)
        self._fns.clear()                 # recompile against new shardings

    def _fwd(self, t: int):
        fn = self._fns.get(t)
        if fn is None:
            cfg = self.cfg
            fn = jax.jit(
                lambda p, kv, pos0, x: backbone_forward(p, kv, pos0, x, cfg),
                donate_argnums=(1,))
            self._fns[t] = fn
        return fn

    # -- Backbone protocol + helpers ----------------------------------------
    def step(self, embed: np.ndarray) -> np.ndarray:
        h, self.kv = self._fwd(1)(self.params, self.kv, self.pos,
                                  jnp.asarray(embed, self.dtype)[None])
        self.pos += 1
        return np.asarray(h[0], np.float32)

    def prefill(self, embeds: np.ndarray) -> np.ndarray:
        """Feed [T, hidden] prompt embeddings; returns the LAST hidden."""
        embeds = jnp.asarray(embeds, self.dtype)
        h, self.kv = self._fwd(embeds.shape[0])(self.params, self.kv,
                                                self.pos, embeds)
        self.pos += embeds.shape[0]
        return np.asarray(h[-1], np.float32)

    def embed_tokens(self, ids) -> np.ndarray:
        ids = np.asarray(ids, np.int64)
        return np.asarray(self.params["tok_embd"][ids], np.float32)

    def text_logits(self, hidden: np.ndarray) -> np.ndarray:
        h = jnp.asarray(hidden, self.dtype)
        w = self.params["tok_embd"] if self.cfg.tied_lm_head \
            else self.params["lm_head"]
        return np.asarray(h @ w.T, np.float32)


def create_backbone(path, dtype=jnp.float32, max_ctx: int = 0,
                    quantized: bool | None = None) -> LlamaBackbone:
    return LlamaBackbone(path, dtype=dtype, max_ctx=max_ctx,
                         quantized=quantized)

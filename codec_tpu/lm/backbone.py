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
    # MoE (Qwen3-MoE-style sparse FFN): n_experts == 0 means dense
    n_experts: int = 0
    n_experts_used: int = 0
    norm_topk_prob: bool = True
    moe_ffn_dim: int = 0

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "BackboneConfig":
        return cls(
            n_experts=r.get_i32("backbone.n_experts", 0),
            n_experts_used=r.get_i32("backbone.n_experts_used", 0),
            norm_topk_prob=r.get_bool("backbone.norm_topk_prob", True),
            moe_ffn_dim=r.get_i32("backbone.moe_ffn_dim", 0),
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
        attn = (("q", "q.w"), ("k", "k.w"), ("v", "v.w"), ("o", "o.w"))
        ffn = () if cfg.n_experts else \
            (("gate", "gate.w"), ("up", "up.w"), ("down", "down.w"))
        lw = {k: get_mat(pre + n) for k, n in attn + ffn}
        if cfg.n_experts:
            # sparse FFN: router [E, hidden] + stacked expert mats
            # [E, moe_ffn, hidden] / [E, hidden, moe_ffn] — dense-loaded
            # (expert matmuls are einsums over the expert axis; the packed
            # quant kernels only cover 2-D GEMVs)
            for k, n in (("router", "router.w"), ("gate_exps", "gate_exps.w"),
                         ("up_exps", "up_exps.w"), ("down_exps", "down_exps.w")):
                lw[k] = get(pre + n)
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


def layer_block(xb: jax.Array, lw_i: Dict[str, Any], kv_l: jax.Array,
                pos0: jax.Array, positions: jax.Array, mask: jax.Array,
                cfg: BackboneConfig, ff,
                write_gate=None) -> Tuple[jax.Array, jax.Array]:
    """One decoder layer: attention (against the full static-length KV
    cache, new keys written at pos0) + SwiGLU FFN. xb: [T, hidden];
    kv_l: [2, n_kv, max_ctx, D] (this layer's cache). `write_gate`, when
    given, is a traced bool: False makes the KV write a no-op (the written
    slice is replaced by the cache's existing contents) — used by the
    pipeline schedule's fill/drain bubble steps."""
    t = xb.shape[0]
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

    if write_gate is not None:
        k = jnp.where(write_gate, k,
                      jax.lax.dynamic_slice(kv_l[0], (0, pos0, 0), k.shape))
        v = jnp.where(write_gate, v,
                      jax.lax.dynamic_slice(kv_l[1], (0, pos0, 0), v.shape))
    k_cache = jax.lax.dynamic_update_slice(kv_l[0], k, (0, pos0, 0))
    v_cache = jax.lax.dynamic_update_slice(kv_l[1], v, (0, pos0, 0))
    kv_l = jnp.stack([k_cache, v_cache])

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
    if cfg.n_experts:
        xb = xb + _moe_ffn(h, lw_i, cfg)
    else:
        g = jax.nn.silu(_mm(h, lw_i["gate"])) * _mm(h, lw_i["up"])
        xb = xb + _mm(g, lw_i["down"])
    return xb, kv_l


def _moe_ffn(h: jax.Array, lw_i: Dict[str, Any],
             cfg: BackboneConfig) -> jax.Array:
    """Qwen3-MoE sparse FFN: softmax router → top-k (optionally
    renormalized) → weighted sum of expert SwiGLUs. All experts are
    computed densely and combined by the (zero-for-unselected) routing
    matrix: AR decode sees a handful of tokens per call, so gather-based
    dispatch would move more expert-weight bytes than the dense einsums
    burn in FLOPs — and the dense form keeps static MXU shapes and lets
    expert parallelism shard the E axis (set_mesh_ep: each chip computes
    its local experts for every token, one all-reduce combines).
    HF oracle: Qwen3MoeSparseMoeBlock.forward."""
    t = h.shape[0]
    logits = _mm(h, lw_i["router"])                        # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.n_experts_used)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    w = jnp.zeros((t, cfg.n_experts), jnp.float32)
    w = w.at[jnp.arange(t)[:, None], topi].set(topv)
    g = jnp.einsum("th,efh->tef", h, lw_i["gate_exps"])
    u = jnp.einsum("th,efh->tef", h, lw_i["up_exps"])
    y = jnp.einsum("tef,ehf->teh", jax.nn.silu(g) * u, lw_i["down_exps"])
    return jnp.einsum("te,teh->th", w.astype(y.dtype), y)


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
        xb, kv_l = layer_block(xb, lw_i, kv_all[li], pos0, positions, mask,
                               cfg, ff)
        kv_all = kv_all.at[li].set(kv_l)
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

    @classmethod
    def from_params(cls, cfg: BackboneConfig, params,
                    dtype=jnp.float32) -> "LlamaBackbone":
        """Build a backbone from an in-memory parameter tree (the
        `load_backbone_params` layout) instead of a GGUF file — for
        serving from checkpoints already resident in host/device memory
        and for bench fixtures. `dtype` is the KV-cache dtype."""
        bb = cls.__new__(cls)
        bb.cfg = cfg
        bb.params = params
        bb.dtype = dtype
        bb._fns = {}
        bb.reset()
        return bb

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
        checks = [("n_heads", c.n_heads), ("n_kv_heads", c.n_kv_heads)]
        # only the ffn dims that exist as tensors constrain the split:
        # MoE backbones carry no dense gate/up/down (ffn_dim records the
        # HF config's unused intermediate_size)
        checks.append(("moe_ffn_dim", c.moe_ffn_dim) if c.n_experts
                      else ("ffn_dim", c.ffn_dim))
        for name, dim in checks:
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
                 "v_b": sh(None, axis),
                 # MoE experts under TP: every expert's ffn dim splits
                 # (column-parallel gate/up, row-parallel down); router
                 # stays replicated
                 "gate_exps": sh(None, None, axis),
                 "up_exps": sh(None, None, axis),
                 "down_exps": sh(None, None, None, axis)}
        self._place(specs, sh(), sh(None, None, axis, None, None))

    # -- expert parallelism ---------------------------------------------------
    def set_mesh_ep(self, mesh, axis: str = "ep") -> None:
        """Shard a MoE backbone expert-parallel over `mesh[axis]`: the
        stacked expert weights split on their expert axis (E/n experts'
        parameters per chip), router/attention replicated. Each chip
        computes its local experts' SwiGLU for every token and the
        routing-weighted combine contracts over the sharded expert axis —
        XLA's SPMD partitioner turns that contraction into one
        all-reduce per MoE layer, the canonical inference-EP pattern
        (weights distributed across HBM, compute distributed, one
        collective to combine).

        Requires n_experts divisible by the mesh size. Dense backbones
        (n_experts == 0) are rejected — use set_mesh (TP) or set_mesh_pp."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        c = self.cfg
        nep = int(mesh.shape[axis])
        if not c.n_experts:
            raise ValueError("backbone EP: not a MoE backbone "
                             "(backbone.n_experts == 0)")
        if c.n_experts % nep:
            raise ValueError(f"backbone EP: n_experts={c.n_experts} not "
                             f"divisible by mesh size {nep}")

        def sh(*spec):
            return NamedSharding(mesh, P(*spec))

        exp = sh(None, axis)          # [L, E, ...] leaves split on E
        self._place({"gate_exps": exp, "up_exps": exp, "down_exps": exp},
                    sh(), sh())

    # -- pipeline parallelism -------------------------------------------------
    def set_mesh_pp(self, mesh, axis: str = "pp",
                    microbatches: int = 4) -> None:
        """Shard the backbone pipeline-parallel over `mesh[axis]`:
        n_layers/S whole layers per chip (stacked layer weights and the
        KV cache split on their layer axis), forward executed by the
        GPipe schedule in parallel/pipeline.py — microbatched prefill,
        activations hopping stage-to-stage over ICI neighbor links.
        Complements TP: PP moves one [mb, hidden] activation per stage
        instead of an all-reduce per layer, so it is the bandwidth-cheap
        way to fit a backbone that outgrows one chip's HBM. `step`/
        `prefill` and the host tts_runner loops are unchanged.

        Requires n_layers divisible by the mesh size. Packed-quantized
        weights (quantized=True) compose: whole layers stay intact per
        stage, so each stage's fused dequant-matmul kernels run
        unmodified on its local layer slice — PP × Q4_K is the
        max-capacity configuration (0.75 B/weight × n chips of HBM)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        c = self.cfg
        S = int(mesh.shape[axis])
        if c.n_layers % S:
            raise ValueError(f"backbone PP: n_layers={c.n_layers} not "
                             f"divisible by mesh size {S}")

        stage = NamedSharding(mesh, P(axis))
        # dict-valued (packed-quant) leaves shard on their L axis too
        self._place({}, NamedSharding(mesh, P()), stage, default=stage,
                    pp=(mesh, axis, int(microbatches)))

    def _place(self, layer_specs, repl, kv_sharding, default=None,
               pp=None) -> None:
        """Shared mesh-placement epilogue: re-place layer weights by spec
        (`default` for unlisted keys, else replicated), replicate
        everything else, move the KV cache, record the PP schedule (or
        clear it), and drop compiled fns so the next call re-traces
        against the new shardings."""
        layers = {k: jax.device_put(v, layer_specs.get(k, default or repl))
                  for k, v in self.params["layers"].items()}
        self.params = {
            **{k: (v if v is None or k == "layers"
                   else jax.device_put(v, repl))
               for k, v in self.params.items()},
            "layers": layers,
        }
        self._kv_sharding = kv_sharding
        self.kv = jax.device_put(self.kv, self._kv_sharding)
        self._pp = pp
        self._fns.clear()

    def _fwd(self, t: int):
        fn = self._fns.get(t)
        if fn is None:
            cfg = self.cfg
            if getattr(self, "_pp", None) is not None:
                from ..parallel.pipeline import build_pp_forward

                mesh, axis, n_mb = self._pp
                fn = jax.jit(build_pp_forward(cfg, mesh, axis, n_mb),
                             donate_argnums=(1,))
            else:
                fn = jax.jit(
                    lambda p, kv, pos0, x: backbone_forward(p, kv, pos0,
                                                            x, cfg),
                    donate_argnums=(1,))
            self._fns[t] = fn
        return fn

    # -- Backbone protocol + helpers ----------------------------------------
    def step(self, embed: np.ndarray) -> np.ndarray:
        h, self.kv = self._fwd(1)(self.params, self.kv, self.pos,
                                  jnp.asarray(embed, self.dtype)[None])
        self.pos += 1
        return np.asarray(h[0], np.float32)

    def prefill(self, embeds: np.ndarray, bucket: int = 0) -> np.ndarray:
        """Feed [T, hidden] prompt embeddings; returns the LAST hidden.

        `bucket > 0` right-pads the rows to the next multiple of `bucket`
        before the forward, so prompts of any length share ceil(T/bucket)
        compiled graphs instead of one per exact length — the serving
        admission path's recompile trap (docs/SERVING.md). The padding is
        harmless by construction: the causal mask is strictly
        position-based (backbone_forward: key_pos <= query position), so
        real rows never attend the junk tail, `pos` advances by the TRUE
        length only, and later writes land on the junk slots before they
        ever become attendable. The pad is clamped so the write stays
        inside max_ctx (dynamic_update_slice would otherwise shift the
        write window backwards over real cache rows)."""
        embeds = jnp.asarray(embeds, self.dtype)
        t = int(embeds.shape[0])
        if bucket > 0:
            pad = min(-t % int(bucket), self.cfg.max_ctx - self.pos - t)
            if pad > 0:
                embeds = jnp.concatenate(
                    [embeds, jnp.zeros((pad, embeds.shape[1]), self.dtype)])
        h, self.kv = self._fwd(int(embeds.shape[0]))(self.params, self.kv,
                                                     self.pos, embeds)
        self.pos += t
        return np.asarray(h[t - 1], np.float32)

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


def apply_backbone_mesh(bb, kind: str, n: int) -> None:
    """Shared --tp/--pp/--ep dispatch for the CLI and serving surfaces:
    shard `bb` over an n-device mesh of the given kind."""
    from ..parallel.mesh import make_mesh

    if kind == "tp":
        bb.set_mesh(make_mesh(n, axis="tp"), axis="tp")
    elif kind == "pp":
        bb.set_mesh_pp(make_mesh(n, axis="pp"), axis="pp")
    elif kind == "ep":
        bb.set_mesh_ep(make_mesh(n, axis="ep"))
    else:
        raise ValueError(f"unknown backbone mesh kind {kind!r}")

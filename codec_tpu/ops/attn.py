"""Scaled-dot-product attention with causal / sliding-window / n_valid masks.

Reference: src/ops/lm_attn.cpp (SDPA over [head_dim, t, heads] with mask
variants). TPU layout is [B, H, T, D]; softmax in float32 regardless of the
compute dtype so logits parity holds in mixed precision.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Sliding-window flash attention (ops/attn_pallas.py) beats the masked XLA
# path once the O(T²) mask work dominates: measured on TPU v5e (h8 d64
# w250, chained on-device timing): 1.0x at T=512, 2.5x at T=3750 f32,
# 3.1x at T=3750 bf16 b4, 6.3x at T=8192. Dense causal (no window) stays
# on XLA (0.9x). End-to-end full-size Mimi decode at T=3750 (5 min audio):
# 64.9 -> 55.5 ms/iter (+17% xRT) and 3.3x faster compile (no [T,T] mask
# constant in the graph). Disable with CODEC_NO_FLASH_ATTN=1.
_FLASH_MIN_T = 1024


def _use_flash_window(t, causal, window, n_valid) -> bool:
    import os

    import jax as _jax

    from .conv import sp_mode

    return (causal and window is not None and n_valid is None
            and t >= _FLASH_MIN_T and window < t
            and _jax.default_backend() == "tpu"
            and not sp_mode()
            and not os.environ.get("CODEC_NO_FLASH_ATTN"))


def attn_mask(t_q: int, t_k: int, causal: bool = True,
              window: Optional[int] = None,
              n_valid: Optional[jax.Array] = None,
              offset: int = 0) -> jax.Array:
    """Build an additive mask [T_q, T_k] (or [B, T_q, T_k] with n_valid).

    offset: position of query 0 in key-time (for incremental decode q_pos =
    offset + i). window w: key j attends iff q_pos - w < j <= q_pos.
    """
    qi = jnp.arange(t_q)[:, None] + offset
    kj = jnp.arange(t_k)[None, :]
    ok = jnp.ones((t_q, t_k), dtype=bool)
    if causal:
        ok &= kj <= qi
    if window is not None and window > 0:
        ok &= kj > qi - window
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
    if n_valid is not None:
        valid = kj < n_valid[:, None, None]              # [B, 1, T_k]
        mask = mask[None] + jnp.where(valid, 0.0, NEG_INF)
    return mask


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         scale: Optional[float] = None,
         mask: Optional[jax.Array] = None,
         bias: Optional[jax.Array] = None) -> jax.Array:
    """q,k,v: [B, H, T, D] → [B, H, T_q, D].

    mask: additive [T_q, T_k] / [B, T_q, T_k]; bias: additive per-head
    [H, T_q, T_k] (local block attention rel-pos bias)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask if mask.ndim == 2 else mask[:, None]
        logits = logits + m
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def sdpa_rel_key(q: jax.Array, k: jax.Array, v: jax.Array,
                 dist_emb: jax.Array, left_max: int, right_max: int,
                 scale: Optional[float] = None) -> jax.Array:
    """Shaw relative-key attention (W2V-BERT conformer; reference:
    codec_op_lm_attn_rel_key_dth, src/ops/lm_attn.cpp:216).

    q,k,v: [B, H, T, D]; dist_emb: [left_max+right_max+1, D].
    scores = (q·kᵀ + q·E[bucket]ᵀ) · scale with scale applied AFTER the add
    (matches HF Wav2Vec2Bert "relative_key"), bucket(tq,tk) =
    clamp(tk−tq, −left, right) + left.
    """
    t = q.shape[-2]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]          # tk - tq
    bucket = jnp.clip(rel, -left_max, right_max) + left_max        # [T_q, T_k]
    e = jnp.take(dist_emb, bucket, axis=0)                         # [T_q, T_k, D]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + jnp.einsum("bhqd,qkd->bhqk", q, e,
                                 preferred_element_type=jnp.float32)
    w = jax.nn.softmax((logits * scale).astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def espnet_rel_pos_emb(t: int, d_model: int) -> jax.Array:
    """ESPnet RelPositionalEncoding table [2t-1, d] for positions
    [t-1, ..., 0, ..., -(t-1)], interleaved sin/cos (reference:
    codec_op_espnet_rel_pos_emb, src/ops/ggml_ops.cpp:684)."""
    half = d_model // 2
    pos = (t - 1) - jnp.arange(2 * t - 1, dtype=jnp.float32)       # [2t-1]
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-2.0 * jnp.log(10000.0) / d_model))
    ang = pos[:, None] * freqs[None, :]                            # [2t-1, half]
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(2 * t - 1,
                                                                    d_model)


def sdpa_rel_pos(q: jax.Array, k: jax.Array, v: jax.Array, p: jax.Array,
                 pos_bias_u: jax.Array, pos_bias_v: jax.Array,
                 scale: Optional[float] = None) -> jax.Array:
    """ESPnet RelPositionMultiHeadedAttention (Transformer-XL style;
    reference: codec_op_lm_attn_rel_pos_dth, src/ops/lm_attn.cpp:166).

    q,k,v: [B, H, T, D]; p: [B, H, 2T-1, D] (projected rel-pos embeddings,
    row r ↔ relative position (T-1)-r); pos_bias_u/v: [H, D].
    scores = ((q+u)·kᵀ + rel_shift((q+v)·pᵀ)) · scale.
    """
    t = q.shape[-2]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    q_u = q + pos_bias_u[None, :, None, :]
    q_v = q + pos_bias_v[None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhrd->bhqr", q_v, p,
                    preferred_element_type=jnp.float32)            # [B,H,T,2T-1]
    # rel-shift: bd_shifted[q, k] = bd[q, (t-1) - (k - q)]
    idx = (t - 1) - (jnp.arange(t)[None, :] - jnp.arange(t)[:, None])
    bd = jnp.take_along_axis(bd, idx[None, None], axis=-1)
    w = jax.nn.softmax(((ac + bd) * scale).astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def mha(x: jax.Array, wq, wk, wv, wo, n_heads: int,
        rope_fn=None, causal: bool = True, window: Optional[int] = None,
        n_valid: Optional[jax.Array] = None,
        bq=None, bk=None, bv=None, bo=None,
        n_kv_heads: Optional[int] = None) -> jax.Array:
    """Full multi-head attention block over [B, T, C] with optional GQA.

    Linear weights are [out, in] (torch layout); y = x @ w.T.
    """
    b, t, c = x.shape
    n_kv = n_kv_heads or n_heads
    q = x @ wq.T
    k = x @ wk.T
    v = x @ wv.T
    if bq is not None:
        q = q + bq
    if bk is not None:
        k = k + bk
    if bv is not None:
        v = v + bv
    d = q.shape[-1] // n_heads
    q = q.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, n_kv, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, n_kv, d).transpose(0, 2, 1, 3)
    if rope_fn is not None:
        q = rope_fn(q)
        k = rope_fn(k)
    if n_kv != n_heads:
        rep = n_heads // n_kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if _use_flash_window(t, causal, window, n_valid):
        from .attn_pallas import flash_sdpa_window
        ctx = flash_sdpa_window(q, k, v, window=window)
    else:
        m = attn_mask(t, t, causal=causal, window=window, n_valid=n_valid)
        ctx = sdpa(q, k, v, mask=m)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, n_heads * d)
    y = ctx @ wo.T
    if bo is not None:
        y = y + bo
    return y

"""Sliding-window flash attention as a Pallas TPU kernel.

Reference semantics: src/ops/lm_attn.cpp's causal + sliding-window SDPA —
query position i attends to keys j with ``i - window < j <= i``. The XLA
path (ops/attn.sdpa) materializes the [T, T] logits and the additive mask;
for a window w ≪ T that is O(T²) HBM traffic and FLOPs of which only
~w·T is live. This kernel computes attention with the online-softmax
(flash) recurrence, tiling queries into BQ-blocks and looping only over
the key blocks that intersect the causal band, so both compute and memory
scale with O(T·w) instead of O(T²).

Used by the decode-side transformers (Mimi / Qwen3-tokenizer window 250)
for long sequences; dispatch lives in ops/attn.mha and falls back to the
masked XLA path off-TPU, for short T, or under CODEC_NO_FLASH_ATTN=1.

Softmax statistics are f32 regardless of input dtype; f32 inputs use
Precision.HIGHEST on the MXU so results track the XLA path closely
(bf16 inputs use the native bf16 MXU pass).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128
_BK = 128
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, window, t_valid):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                    # [BQ, D]
    d = q.shape[-1]
    q_lo = i * _BQ

    lo_blk = 0
    if window is not None:
        lo_blk = jnp.maximum(q_lo - window + 1, 0) // _BK
    hi_blk = (q_lo + _BQ + _BK - 1) // _BK              # causal upper bound

    def body(jb, carry):
        m_i, l_i, acc = carry
        k_start = jb * _BK
        kb = k_ref[0, pl.ds(k_start, _BK), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(k_start, _BK), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        qi = q_lo + jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BK), 0)
        kj = k_start + jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BK), 1)
        ok = (kj <= qi) & (kj < t_valid)
        if window is not None:
            ok &= kj > qi - window
        s = jnp.where(ok, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((_BQ,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((_BQ,), jnp.float32)
    a0 = jnp.zeros((_BQ, d), jnp.float32)
    _, l_i, acc = jax.lax.fori_loop(lo_blk, hi_blk, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "window", "interpret"))
def flash_sdpa_window(q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: Optional[float] = None,
                      window: Optional[int] = None,
                      interpret: bool = False) -> jax.Array:
    """Causal (+ optional sliding-window) self-attention.

    q, k, v: [B, H, T, D] (same T: self-attention) → [B, H, T, D]."""
    b, h, t, d = q.shape
    if scale is None:
        scale = d ** -0.5
    tp = -(-t // _BQ) * _BQ
    pad = tp - t

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(_flash_kernel, scale=scale,
                               window=window, t_valid=t)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, tp // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BQ, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * min(window or t, t) * d,
            bytes_accessed=4 * b * h * t * d * 4,
            transcendentals=b * h * t * min(window or t, t)),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :t].reshape(b, h, t, d)

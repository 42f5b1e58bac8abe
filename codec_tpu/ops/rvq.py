"""Residual vector quantization: in-graph nearest-code search + residual loop.

Reference: src/ops/rvq.cpp — the encode search stays on-device as one matmul
plus argmax per layer using the identity
    argmin_v ||r - cb_v||^2 = argmax_v (2*r.cb_v - ||cb_v||^2)
with f32 accumulation so code indices are bit-exact vs the CPU reference.
Decode is a codebook gather-sum.

Codebooks are stacked [n_q, V, D] when all layers share a shape, letting the
layer loop run as a `lax.scan` (one compiled body, carried residual).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rvq_layer_encode(residual: jax.Array, codebook: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One RVQ layer. residual: [B, T, D], codebook: [V, D].

    Returns (indices [B, T] int32, new_residual [B, T, D])."""
    scores = 2.0 * jnp.einsum("btd,vd->btv", residual, codebook,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    scores = scores - jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    zq = jnp.take(codebook, idx, axis=0)
    return idx, residual - zq


def rvq_encode(x: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Full RVQ over stacked codebooks [n_q, V, D]. x: [B, T, D] → codes [B, T, n_q]."""
    def body(residual, cb):
        idx, residual = rvq_layer_encode(residual, cb)
        return residual, idx

    _, codes = jax.lax.scan(body, x, codebooks)
    return jnp.moveaxis(codes, 0, -1)                     # [B, T, n_q]


def rvq_decode_sum(codes: jax.Array, codebooks: jax.Array,
                   n_q: Optional[int] = None) -> jax.Array:
    """Sum-of-codebooks decode. codes: [B, T, n_q], codebooks: [n_q, V, D]
    → [B, T, D].

    Implemented as one_hot @ codebook so the lookup runs on the MXU rather
    than as a serial gather (V is small: 1024-4096)."""
    if n_q is None:
        n_q = codes.shape[-1]
    v = codebooks.shape[1]
    oh = jax.nn.one_hot(codes[..., :n_q], v, dtype=codebooks.dtype)  # [B,T,n_q,V]
    return jnp.einsum("btqv,qvd->btd", oh, codebooks[:n_q])


def rvq_decode_gather(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Per-layer gather (no sum): codes [B, T, n_q] → [B, T, n_q, D]."""
    return jax.vmap(lambda cb, ix: cb[ix], in_axes=(0, -1), out_axes=-2)(codebooks, codes)

"""Normalization ops over channels-last activations.

Reference: src/ops/ggml_ops.h:15-19 (LayerNorm ct/tc, RMSNorm, GroupNorm).
The ggml "ct" layout (channel fastest) corresponds to our trailing channel
dim, so one implementation covers both reference variants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, gamma: jax.Array, beta: Optional[jax.Array] = None,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing (channel) dim."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * gamma
    if beta is not None:
        y = y + beta
    return y


def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * gamma


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, n_groups: int,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over [B, T, C]: normalize each channel group over (T, group)."""
    b, t, c = x.shape
    xg = x.reshape(b, t, n_groups, c // n_groups)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mu), axis=(1, 3), keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    return y * gamma + beta


def channel_scale(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-channel LayerScale (reference: codec_op_channel_scale)."""
    return x * scale


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize over channels (cosine RVQ; reference ggml_ops.h:154-157)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)

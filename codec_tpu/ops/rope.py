"""Rotary position embeddings (reference: src/ops/rope.cpp — ggml_rope_ext
wrapper with NORMAL vs NEOX modes).

Operates on [B, H, T, D] query/key tensors. `neox=True` rotates pairs
(i, i + D/2) ("rotate half", used by Mimi/HF-Llama); `neox=False` rotates
interleaved pairs (2i, 2i+1) (GPT-J/"NORMAL" mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, theta: float, freq_scale: float = 1.0,
               dtype=jnp.float32) -> jax.Array:
    """Per-pair inverse frequencies [D/2]."""
    i = jnp.arange(head_dim // 2, dtype=jnp.float32)
    inv = theta ** (-2.0 * i / head_dim)
    return (inv * freq_scale).astype(dtype)


def apply_rope(x: jax.Array, positions: Optional[jax.Array] = None,
               theta: float = 10000.0, freq_scale: float = 1.0,
               neox: bool = True) -> jax.Array:
    """x: [B, H, T, D] → rotated [B, H, T, D].

    positions: [T] or [B, T] (default arange(T))."""
    b, h, t, d = x.shape
    if positions is None:
        positions = jnp.arange(t, dtype=jnp.float32)
    pos = positions.astype(jnp.float32)
    inv = rope_freqs(d, theta, freq_scale)
    ang = jnp.einsum("...t,f->...tf", pos, inv)          # [T, D/2] or [B, T, D/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    if cos.ndim == 2:                                     # [T, D/2] → broadcast
        cos = cos[None, None]
        sin = sin[None, None]
    else:                                                 # [B, T, D/2]
        cos = cos[:, None]
        sin = sin[:, None]
    # angles/rotation in f32; result back in x.dtype (a bf16 x otherwise
    # silently upcasts q/k and everything downstream of attention to f32)
    if neox:
        x1 = x[..., : d // 2]
        x2 = x[..., d // 2:]
        y = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
        return y.astype(x.dtype)
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    ye = xe * cos - xo * sin
    yo = xe * sin + xo * cos
    return jnp.stack([ye, yo], axis=-1).reshape(b, h, t, d).astype(x.dtype)

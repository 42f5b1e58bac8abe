"""Alias-free (anti-aliased) snake-beta activation, TPU-native.

Reference behavior: codec_op_alias_free_snake_beta_tc
(src/ops/ggml_ops.cpp:589): BigVGAN-style Activation1d — upsample 2× with a
12-tap Kaiser-windowed-sinc FIR, apply snake-beta at the doubled rate, then
downsample 2× with the same (symmetric) FIR.  Used by the BigCodec acoustic
encoder inside XCodec2/NeuCodec.

Exact alignment (per channel, input length t):
  up:   replicate-pad 5/5 → zero-stuff ×2 (lhs_dilation) → pad 11/11 →
        12-tap depthwise conv → ×2 → crop 15/15          → length 2t
  act:  snake_beta(alpha, inv_beta) with eps 1e-9
  down: replicate-pad 5/6 → 12-tap depthwise conv stride 2 → length t

The reference implements the zero-stuff with an explicit interleave and trims
one trailing sample; `lhs_dilation=2` produces the identical sequence
directly (the reference's extra trailing zero + pad-11 ≡ pad-12 on the last
side, and the extra output position is exactly the one trimmed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NWC", "WIO", "NWC")


def snake_beta_inv(x: jax.Array, alpha: jax.Array, inv_beta: jax.Array,
                   eps: float = 1e-9) -> jax.Array:
    """x + sin²(clamp(alpha,eps)·x)·inv_beta (reference codec_op_snake_beta,
    src/ops/ggml_ops.cpp:171 — converters pre-bake exp(alpha) and 1/beta)."""
    a = jnp.maximum(alpha, eps)
    return x + jnp.sin(a * x) ** 2 * inv_beta


def _depthwise(x: jax.Array, k: jax.Array, stride: int, pad: tuple[int, int],
               lhs_dilation: int = 1) -> jax.Array:
    """x: [B, T, C]; k: [K] shared across channels (depthwise)."""
    c = x.shape[-1]
    w = jnp.broadcast_to(k[:, None, None], (k.shape[0], 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[pad],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=c,
    )


def alias_free_snake_beta(x: jax.Array, alpha: jax.Array, inv_beta: jax.Array,
                          kernel: jax.Array) -> jax.Array:
    """x: [B, T, C]; alpha/inv_beta: [C] (pre-baked exp-alpha / 1-over-beta);
    kernel: [12] shared FIR. Returns [B, T, C]."""
    # up2: replicate 5/5, zero-stuff ×2, pad 11/11, FIR, ×2, crop 15/15
    h = jnp.pad(x, ((0, 0), (5, 5), (0, 0)), mode="edge")
    h = _depthwise(h, kernel, stride=1, pad=(11, 11), lhs_dilation=2) * 2.0
    h = h[:, 15:-15]
    h = snake_beta_inv(h, alpha, inv_beta)
    # down2: replicate 5/6, FIR stride 2
    h = jnp.pad(h, ((0, 0), (5, 6), (0, 0)), mode="edge")
    return _depthwise(h, kernel, stride=2, pad=(0, 0))

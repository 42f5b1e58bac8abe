"""Activations (reference: src/ops/ggml_ops.h:6-23 unary ops + snake family).

All operate elementwise on [..., C] arrays; snake alphas/betas are per-channel
vectors broadcast over the trailing channel dim (channels-last layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elu(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, x, jnp.expm1(x))


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches ggml_gelu_erf and HF 'gelu'."""
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: jax.Array, slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def snake(x: jax.Array, alpha: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Snake activation x + sin^2(alpha*x)/alpha (DAC; reference ggml_ops.h:22).

    `alpha` is the already-exponentiated per-channel parameter (the reference
    converter pre-bakes exp of the log-alpha checkpoint value)."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + eps)


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array, eps: float = 1e-9) -> jax.Array:
    """SnakeBeta: x + sin^2(alpha*x)/beta (BigVGAN/WavTokenizer; ggml_ops.h:23)."""
    return x + jnp.sin(alpha * x) ** 2 / (beta + eps)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU — matches ggml_gelu / torch gelu(approximate='tanh')."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x ** 3)))

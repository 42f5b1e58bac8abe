"""Reusable composite blocks (reference: src/ops/ggml_ops.cpp composite
builders — ConvNeXt/Vocos block, diffusion pos-net blocks)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import act, conv, norms


def convnext_block(x: jax.Array, p: Dict[str, jax.Array],
                   eps: float = 1e-6) -> jax.Array:
    """Vocos ConvNeXt block on [B, T, C] (reference: codec_op_convnext_block_ct,
    ggml_ops.cpp:~280): dwconv k7 pad3 → LN → pw1 → gelu(erf) → pw2 → γ → +x.

    p keys: dw_w [K,1,C], dw_b, ln_w, ln_b, pw1_w [I,C], pw1_b, pw2_w [C,I],
    pw2_b, gamma (optional)."""
    h = conv.conv1d(x, p["dw_w"], p["dw_b"], padding=(p["dw_w"].shape[0] - 1) // 2,
                    groups=x.shape[-1])
    h = norms.layer_norm(h, p["ln_w"], p["ln_b"], eps)
    h = act.gelu_erf(h @ p["pw1_w"].T + p["pw1_b"])
    h = h @ p["pw2_w"].T + p["pw2_b"]
    if p.get("gamma") is not None:
        h = h * p["gamma"]
    return x + h


def diffusion_resblock(x: jax.Array, p: Dict[str, jax.Array], n_groups: int = 32,
                       eps: float = 1e-6) -> jax.Array:
    """Diffusers/Vocos pos_net ResnetBlock1D on [B, T, C]
    (reference: codec_wt_pos_resblock, wavtokenizer.cpp:148-179):
    GN → silu → conv k3 pad1, twice, residual."""
    h = norms.group_norm(x, p["n1_w"], p["n1_b"], n_groups, eps)
    h = act.silu(h)
    h = conv.conv1d(h, p["c1_w"], p["c1_b"], padding=1)
    h = norms.group_norm(h, p["n2_w"], p["n2_b"], n_groups, eps)
    h = act.silu(h)
    h = conv.conv1d(h, p["c2_w"], p["c2_b"], padding=1)
    return x + h


def diffusion_attn_block(x: jax.Array, p: Dict[str, jax.Array], n_groups: int = 32,
                         eps: float = 1e-6) -> jax.Array:
    """Single-head full attention with 1x1-conv projections
    (reference: codec_wt_pos_attn, wavtokenizer.cpp:181-239)."""
    b, t, c = x.shape
    h = norms.group_norm(x, p["n_w"], p["n_b"], n_groups, eps)
    q = h @ p["q_w"][:, :, 0].T + p["q_b"]
    k = h @ p["k_w"][:, :, 0].T + p["k_b"]
    v = h @ p["v_w"][:, :, 0].T + p["v_b"]
    scores = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bqk,bkc->bqc", w, v)
    return x + (ctx @ p["o_w"][:, :, 0].T + p["o_b"])


def lstm_stack(x: jax.Array, layers, skip: bool = True) -> jax.Array:
    """Multi-layer LSTM over [B, T, C] via lax.scan (torch gate order i,f,g,o).

    layers: list of dicts {w_ih [4H,In], w_hh [4H,H], b_ih, b_hh}.
    Reference: codec_wt_encode_lstm_layers (wavtokenizer.cpp:598-682) unrolls
    per-timestep ggml graphs; here one scan body serves all timesteps."""
    y = x
    for lw in layers:
        hdim = lw["w_hh"].shape[1]
        b, t, _ = y.shape
        xw = jnp.einsum("btc,gc->btg", y, lw["w_ih"]) + lw["b_ih"] + lw["b_hh"]

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ lw["w_hh"].T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, hdim), y.dtype)
        _, ys = jax.lax.scan(step, (h0, h0), jnp.moveaxis(xw, 1, 0))
        y = jnp.moveaxis(ys, 0, 1)
    return y + x if skip else y

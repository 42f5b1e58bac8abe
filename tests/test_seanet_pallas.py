"""Fused SEANet res-unit kernel vs the XLA-ops chain (interpret mode on
CPU; compiled-mode v5e numbers live in ops/seanet_pallas.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_tpu.ops import act, conv
from codec_tpu.ops.seanet_pallas import seanet_res_unit


def _xla_unit(x, a1, w1, b1, a2, w2, b2, d):
    h = act.snake(x, a1)
    h = conv.conv1d(h, w1, b1, dilation=d, padding=((w1.shape[0] - 1) * d) // 2)
    h = act.snake(h, a2)
    return x + (h @ w2 + b2)


@pytest.mark.parametrize("b,t,c,d,tb", [
    (2, 200, 8, 1, 64),       # multi-batch, partial last tile
    (1, 200, 8, 3, 64),       # dilated
    (1, 130, 16, 9, 32),      # large dilation (halo 27 < t_blk 32)
    (1, 64, 8, 1, 64),        # single tile, exact fit
])
def test_res_unit_matches_xla_chain(b, t, c, d, tb):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)

    want = np.asarray(_xla_unit(x, a1, w1, b1, a2, w2, b2, d))
    got = np.asarray(seanet_res_unit(x, a1, w1, b1, a2, w2, b2, dilation=d,
                                     t_blk=tb, interpret=True))
    assert got.shape == want.shape
    # kernel runs bf16-MXU/f32-accum matmuls (the TPU default for f32
    # convs) — bf16 rounding of the snaked window bounds the agreement
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.9999


@pytest.mark.parametrize("b,t,tb", [
    (1, 200, 64),             # partial last tile, edge masking both ends
    (2, 130, 64),             # halo (39) close to t_blk, multi-batch
    (1, 64, 64),              # single tile exact fit
])
def test_res_chain_matches_sequential_units(b, t, tb):
    from codec_tpu.ops.seanet_pallas import seanet_res_chain

    rng = np.random.default_rng(1)
    c, k, dils = 8, 7, (1, 3, 9)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    units = []
    for _ in dils:
        units.append(dict(
            w1=jnp.asarray(rng.standard_normal((k, c, c)) * 0.2, jnp.float32),
            b1=jnp.asarray(rng.standard_normal(c), jnp.float32),
            w2=jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32),
            b2=jnp.asarray(rng.standard_normal(c), jnp.float32),
            a1=jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32),
            a2=jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32),
        ))

    want = x
    for u, d in zip(units, dils):
        want = _xla_unit(want, u["a1"], u["w1"], u["b1"], u["a2"], u["w2"],
                         u["b2"], d)
    want = np.asarray(want)

    got = np.asarray(seanet_res_chain(
        x,
        jnp.stack([u["w1"] for u in units]),
        jnp.stack([u["b1"] for u in units]),
        jnp.stack([u["a1"] for u in units]),
        jnp.stack([u["a2"] for u in units]),
        jnp.stack([u["w2"] for u in units]),
        jnp.stack([u["b2"] for u in units]),
        dilations=dils, t_blk=tb, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=8e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.9995


@pytest.mark.parametrize("b,t,tb", [(1, 9000, 2048), (2, 4096, 4096),
                                    (1, 4100, 4096)])
def test_dw_chain_matches_sequential_units(b, t, tb):
    """snac_res_chain (depthwise fused chain) == sequential snake →
    depthwise dilated k7 → snake → 1x1 conv → +x units (SNAC decoder
    blocks, src/models/snac.cpp). Tolerances match the dense chain test
    (bf16 1x1 matmul + sin2 approximation)."""
    from codec_tpu.ops import act, conv
    from codec_tpu.ops.seanet_pallas import snac_res_chain

    rng = np.random.default_rng(5)
    c, k = 128, 7
    dils = (1, 3, 9)
    x = jnp.asarray(rng.standard_normal((b, t, c)) * 0.3, jnp.float32)
    units = []
    for _ in dils:
        units.append(dict(
            w1=jnp.asarray(rng.standard_normal((k, c)) * 0.2, jnp.float32),
            b1=jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            w2=jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32),
            b2=jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            a1=jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32),
            a2=jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32),
        ))

    want = x
    for u, d in zip(units, dils):
        h = act.snake(want, u["a1"])
        h = conv.conv1d_depthwise_shifts(h, u["w1"][:, None, :], u["b1"],
                                         dilation=d, padding=((k - 1) * d) // 2)
        h = act.snake(h, u["a2"])
        h = h @ u["w2"] + u["b2"]
        want = want + h
    want = np.asarray(want)

    got = np.asarray(snac_res_chain(
        x,
        jnp.stack([u["w1"] for u in units]),
        jnp.stack([u["b1"] for u in units]),
        jnp.stack([u["a1"] for u in units]),
        jnp.stack([u["a2"] for u in units]),
        jnp.stack([u["w2"] for u in units]),
        jnp.stack([u["b2"] for u in units]),
        dilations=dils, t_blk=tb, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=8e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.9995

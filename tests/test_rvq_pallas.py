"""Pallas fused RVQ encode vs the lax.scan reference (interpret mode on
CPU; the compiled kernel is exercised on real TPU — measured numbers in
the module docstring of ops/rvq_pallas.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_tpu.ops.rvq import rvq_encode
from codec_tpu.ops.rvq_pallas import rvq_encode_fused


@pytest.mark.parametrize("b,t,d,q,v", [
    (1, 7, 32, 4, 64),        # unaligned everything
    (2, 200, 256, 8, 1024),   # mimi-ish
    (1, 130, 96, 3, 100),     # non-128 V and D
])
def test_fused_matches_scan(b, t, d, q, v):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((q, v, d)) * 0.5, jnp.float32)
    want = np.asarray(rvq_encode(x, cb))
    got = np.asarray(rvq_encode_fused(x, cb, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_padded_rows_never_selected():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 9, 16)) * 1e-6, jnp.float32)
    cb = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    got = np.asarray(rvq_encode_fused(x, cb, interpret=True))
    assert got.max() < 5 and got.min() >= 0

"""Sliding-window flash attention kernel vs the masked XLA sdpa
(interpret mode on CPU; compiled-mode numbers on TPU v5e are recorded in
ops/attn.py: 2.5-6.3x over the masked path for windowed long-T)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_tpu.ops.attn import attn_mask, sdpa
from codec_tpu.ops.attn_pallas import flash_sdpa_window


@pytest.mark.parametrize("b,h,t,d,w", [
    (1, 2, 64, 32, None),     # pure causal, unaligned T
    (2, 4, 300, 64, 50),      # window < T, unaligned
    (1, 8, 130, 64, 250),     # window > T (degenerates to causal)
    (1, 2, 256, 128, 16),     # tiny window, aligned
])
def test_flash_matches_masked_sdpa(b, h, t, d, w):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    want = np.asarray(sdpa(q, k, v, mask=attn_mask(t, t, causal=True, window=w)))
    got = np.asarray(flash_sdpa_window(q, k, v, window=w, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    b, h, t, d, w = 1, 2, 200, 64, 40
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    want = np.asarray(sdpa(q, k, v,
                           mask=attn_mask(t, t, causal=True, window=w)),
                      dtype=np.float32)
    got = np.asarray(flash_sdpa_window(q, k, v, window=w, interpret=True),
                     dtype=np.float32)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, atol=3e-2)


def test_dispatch_gate(monkeypatch):
    """mha stays on the masked XLA path off-TPU / short T / no window /
    CODEC_NO_FLASH_ATTN (reference for the policy: ops/attn.py)."""
    from codec_tpu.ops.attn import _use_flash_window

    # CPU backend in tests -> always False
    assert not _use_flash_window(4096, True, 250, None)
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    assert _use_flash_window(4096, True, 250, None)
    assert not _use_flash_window(512, True, 250, None)       # short T
    assert not _use_flash_window(4096, True, None, None)     # dense causal
    assert not _use_flash_window(4096, False, 250, None)     # non-causal
    assert not _use_flash_window(4096, True, 250, jnp.ones((1,)))  # n_valid
    assert not _use_flash_window(4096, True, 8192, None)     # window >= T
    monkeypatch.setenv("CODEC_NO_FLASH_ATTN", "1")
    assert not _use_flash_window(4096, True, 250, None)

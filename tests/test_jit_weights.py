"""runtime/jit_weights — weights-as-arguments jit wrapper.

Covers the trace-safety contract: tracing temporarily swaps tracers into
shared owner attributes, so concurrent first-calls from multiple threads
must serialize on the per-owner trace lock (the serve layer relies on
this; reference analog: per-state schedulers, lm_internal.h:63-68).
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codec_tpu.runtime.jit_weights import array_attrs, jit_weighted


class _Owner:
    def __init__(self):
        self.w = {"a": jnp.arange(8, dtype=jnp.float32),
                  "b": jnp.ones((4, 4), jnp.float32)}
        self.cfg = {"k": 3}          # int leaves stay closure constants

    def f(self, x):
        return x * self.w["a"][: x.shape[0]] + float(self.cfg["k"])

    def g(self, x):
        return self.w["b"] @ x


def test_jit_weighted_matches_eager():
    o = _Owner()
    f = jit_weighted(o, o.f, ["w"])
    x = jnp.arange(4, dtype=jnp.float32)
    np.testing.assert_allclose(f(x), o.f(x), rtol=1e-6)
    # owner attrs restored after tracing (no leaked tracers)
    assert isinstance(o.w["a"], jax.Array)


def test_array_attrs_finds_trees():
    o = _Owner()
    assert "w" in array_attrs(o)
    assert "cfg" not in array_attrs(o)


def test_concurrent_first_trace_on_shared_owner():
    """Two threads tracing different jit_weighted fns on one owner must not
    observe each other's tracers (pre-fix: UnexpectedTracerError) or leave
    tracers in the weight attrs."""
    o = _Owner()

    def slow_f(x):
        # widen the tracing window so unsynchronized threads would overlap
        y = x
        for _ in range(50):
            y = y * o.w["a"][: y.shape[0]] * 0.99 + 0.01
        return y

    def slow_g(x):
        y = x
        for _ in range(50):
            y = o.w["b"] @ y * 0.5
        return y

    jf = jit_weighted(o, slow_f, ["w"])
    jg = jit_weighted(o, slow_g, ["w"])
    xf = jnp.arange(4, dtype=jnp.float32)
    xg = jnp.ones((4,), jnp.float32)

    errs = []
    barrier = threading.Barrier(8)

    def run(fn, x):
        try:
            barrier.wait(timeout=10)
            for _ in range(3):
                np.asarray(fn(x))
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errs.append(e)

    threads = [threading.Thread(target=run, args=(jf, xf)) for _ in range(4)]
    threads += [threading.Thread(target=run, args=(jg, xg)) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    # no tracer left behind in the shared attributes
    assert isinstance(o.w["a"], jax.Array)
    assert isinstance(o.w["b"], jax.Array)
    np.testing.assert_allclose(jf(xf), slow_f(xf), rtol=1e-5)

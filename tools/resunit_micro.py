#!/usr/bin/env python
"""Micro-benchmark: XLA-ops DAC res-unit vs fused Pallas kernel."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from codec_tpu.ops import act, conv
from codec_tpu.ops.seanet_pallas import seanet_res_unit


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def _wall(fn, x0, n_iters=20):
    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            y = fn(x)
            return x * 1.0 + 1e-12 * y.reshape(-1)[0].astype(x.dtype), \
                acc + y.reshape(-1)[0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n_iters, body, (x0, jnp.float32(0)))
        return acc
    np.asarray(chained(x0))
    r = _rtt()
    t0 = time.monotonic()
    np.asarray(chained(x0))
    return max(1e-9, (time.monotonic() - t0) - r) / n_iters


def main():
    rng = np.random.default_rng(0)
    out = {}
    shapes = [
        ("b3_d1", 480000, 96, 1, 2048),
        ("b3_d9", 480000, 96, 9, 2048),
        ("b2_d1", 240000, 192, 1, 1024),
        ("b1_d1", 60000, 384, 1, 512),
        ("b1_d9", 60000, 384, 9, 512),
    ]
    for name, t, c, d, tb in shapes:
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
        a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
        a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)

        def xla_unit(h):
            y = act.snake(h, a1)
            y = conv.conv1d(y, w1, b1, dilation=d, padding=3 * d)
            y = act.snake(y, a2)
            return h + (y @ w2 + b2)

        def pallas_unit(h):
            return seanet_res_unit(h, a1, w1, b1, a2, w2, b2, dilation=d,
                                   t_blk=tb)

        w0 = _wall(xla_unit, x)
        w1_ = _wall(pallas_unit, x)
        # numeric check on-device
        ya = np.asarray(jax.jit(xla_unit)(x))
        yb = np.asarray(jax.jit(pallas_unit)(x))
        corr = float(np.corrcoef(ya.reshape(-1), yb.reshape(-1))[0, 1])
        out[name] = {"xla_ms": round(w0 * 1e3, 3),
                     "pallas_ms": round(w1_ * 1e3, 3),
                     "speedup": round(w0 / w1_, 2),
                     "maxdiff": float(np.abs(ya - yb).max()),
                     "corr": corr}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Micro-benchmark: XLA convolution vs conv1d_matmul (K shifted matmuls)
at DAC res-unit shapes, f32 and bf16, on the attached device."""
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

from codec_tpu.ops import conv


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
    # (name, T, C, k, d): DAC decoder res-unit convs at 20 s / 24 kHz
    shapes = [
        ("b3_k7d1", 480000, 96, 7, 1),
        ("b3_k7d9", 480000, 96, 7, 9),
        ("b2_k7d1", 240000, 192, 7, 1),
        ("b1_k7d1", 60000, 384, 7, 1),
        ("b0_k7d1", 12000, 768, 7, 1),
        ("b3_k1", 480000, 96, 1, 1),
    ]
    for name, t, c, k, d in shapes:
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            x = jnp.asarray(rng.standard_normal((1, t, c)), dt)
            w = jnp.asarray(rng.standard_normal((k, c, c)), dt)
            b = jnp.asarray(rng.standard_normal(c), dt)
            pad = ((k - 1) * d) // 2
            w0 = _wall(lambda h: conv.conv1d(h, w, b, dilation=d,
                                             padding=pad), x)
            w1 = _wall(lambda h: conv.conv1d_matmul(h, w, b, dilation=d,
                                                    padding=pad), x)
            out[f"{name}_{tag}"] = {"conv_ms": round(w0 * 1e3, 3),
                                    "matmul_ms": round(w1 * 1e3, 3),
                                    "speedup": round(w0 / w1, 2)}
            print(name, tag, out[f"{name}_{tag}"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

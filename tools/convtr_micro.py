#!/usr/bin/env python
"""Micro-benchmark: convtr1d (lhs_dilation conv) vs convtr1d_subpixel
(single MXU matmul) at DAC/Mimi upsample shapes, on the attached device."""
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
            return x * 1.0 + 1e-12 * y.reshape(-1)[0], acc + y.reshape(-1)[0]
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
    # (name, T, Cin, Cout, k, s): DAC dec blocks at 20 s / 24 kHz + Mimi up
    shapes = [
        ("dac_b0", 1500, 1536, 768, 16, 8),
        ("dac_b1", 12000, 768, 384, 16, 8),
        ("dac_b2", 60000, 384, 192, 8, 4),
        ("dac_b3", 240000, 192, 96, 4, 2),
        ("mimi_up", 1250, 512, 512, 4, 2),
    ]
    for name, t, cin, cout, k, s in shapes:
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        p = (s + 1) // 2
        w0 = _wall(lambda h: conv.convtr1d(h, w, b, stride=s, padding=p), x)
        w1 = _wall(lambda h: conv.convtr1d_subpixel(h, w, b, stride=s,
                                                    padding=p), x)
        out[name] = {"dilated_ms": round(w0 * 1e3, 3),
                     "subpixel_ms": round(w1 * 1e3, 3),
                     "speedup": round(w0 / w1, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evaluate the fused dequant-matmul kernels vs dense bf16 XLA matmuls at
llama-backbone AR-step (GEMV) shapes on the attached device."""
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

from codec_tpu.io.gguf import quantize_q4_k, quantize_q8_0
from codec_tpu.ops.qmat_pallas import (pack_q4_k, pack_q8_0, q4_k_matmul,
                                       q8_0_matmul)


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def _wall(fn, x0, n_iters=50):
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
    for (name, m, out_d, in_d) in [
        ("gemv_2k_2k", 1, 2048, 2048),
        ("gemv_8k_2k", 1, 8192, 2048),
        ("gemv_2k_8k", 1, 2048, 8192),
        ("m8_8k_2k", 8, 8192, 2048),
    ]:
        w = (rng.standard_normal((out_d, in_d)) * 0.05).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((m, in_d)), jnp.float32)
        wb = jnp.asarray(w, jnp.bfloat16)
        q8 = {k: jnp.asarray(v) for k, v in pack_q8_0(
            np.frombuffer(quantize_q8_0(w), dtype=np.uint8), w.shape).items()}
        q4 = {k: jnp.asarray(v) for k, v in pack_q4_k(
            np.frombuffer(quantize_q4_k(w), dtype=np.uint8), w.shape).items()}

        dense = _wall(lambda h: (h.astype(jnp.bfloat16) @ wb.T
                                 ).astype(jnp.float32), x)
        t8 = _wall(lambda h: q8_0_matmul(h, q8["qs"], q8["scale"]), x)
        t4 = _wall(lambda h: q4_k_matmul(h, q4["qs"], q4["scale"],
                                         q4["minv"]), x)
        out[name] = {"dense_bf16_us": round(dense * 1e6, 1),
                     "q8_0_us": round(t8 * 1e6, 1),
                     "q4_k_us": round(t4 * 1e6, 1),
                     "q8_speedup": round(dense / t8, 2),
                     "q4_speedup": round(dense / t4, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

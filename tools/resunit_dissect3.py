#!/usr/bin/env python
"""Dissect 3: pipeline-overhead probes for the res-unit kernel.

All at C=128, T=479232 f32. Cases:
  tb8192       — same kernel, t_blk=8192 (half the grid steps)
  noscratch    — matmul-only kernel reading x_ref directly (no halo, no
                 scratch, slightly wrong numerics — perf probe only)
  grid1d       — same as noscratch but 1-D grid over a [T, C] view
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    t, c = 479232, 128
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    out = {}

    out["tb8192_ms"] = round(_wall(
        lambda h: seanet_res_unit(h, a1, w1, b1, a2, w2, b2, dilation=1,
                                  t_blk=8192), x) * 1e3, 3)
    print("tb8192", out["tb8192_ms"], flush=True)

    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)

    def mm_kernel(x_ref, w1_ref, w2_ref, o_ref):
        h = x_ref[0].astype(jnp.bfloat16)
        acc = jnp.dot(h, w1_ref[0], preferred_element_type=jnp.float32)
        for j in range(1, 7):
            acc = acc + jnp.dot(h, w1_ref[j],
                                preferred_element_type=jnp.float32)
        y = jnp.dot(acc.astype(jnp.bfloat16), w2_ref[:],
                    preferred_element_type=jnp.float32)
        o_ref[0] = x_ref[0] + y.astype(o_ref.dtype)

    def noscratch(h, tb=4096):
        n = t // tb
        return pl.pallas_call(
            mm_kernel,
            grid=(1, n),
            in_specs=[
                pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, c, c), lambda bi, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, t, c), h.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        )(h, w1b, w2b)
    out["noscratch_ms"] = round(_wall(noscratch, x) * 1e3, 3)
    print("noscratch", out["noscratch_ms"], flush=True)

    def mm2_kernel(x_ref, w1_ref, w2_ref, o_ref):
        h = x_ref[:].astype(jnp.bfloat16)
        acc = jnp.dot(h, w1_ref[0], preferred_element_type=jnp.float32)
        for j in range(1, 7):
            acc = acc + jnp.dot(h, w1_ref[j],
                                preferred_element_type=jnp.float32)
        y = jnp.dot(acc.astype(jnp.bfloat16), w2_ref[:],
                    preferred_element_type=jnp.float32)
        o_ref[:] = x_ref[:] + y.astype(o_ref.dtype)

    def grid1d(h, tb=4096):
        n = t // tb
        h2 = h[0]
        o = pl.pallas_call(
            mm2_kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((tb, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, c, c), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, c), h2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        )(h2, w1b, w2b)
        return o[None]
    out["grid1d_ms"] = round(_wall(grid1d, x) * 1e3, 3)
    print("grid1d", out["grid1d_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

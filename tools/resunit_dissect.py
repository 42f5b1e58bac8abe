#!/usr/bin/env python
"""Dissect the fused res-unit kernel's time at the DAC block3 shape."""
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

from codec_tpu.ops import act, conv
from codec_tpu.ops.seanet_pallas import _unit_kernel, seanet_res_unit


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


def copy_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0] * 2.0


def main():
    rng = np.random.default_rng(0)
    t, c, d, tb = 479232, 96, 1, 4096        # exact multiple of 4096
    n_tiles = t // tb
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    out = {}

    # 1. pure copy through pallas at the same blocking = pipeline floor
    def pcopy(h):
        return pl.pallas_call(
            copy_kernel,
            grid=(1, n_tiles),
            in_specs=[pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, t, c), h.dtype),
        )(h)
    out["pallas_copy_ms"] = round(_wall(pcopy, x) * 1e3, 3)
    print("copy", out["pallas_copy_ms"], flush=True)

    # 2. kernel only: zero halos precomputed, exact-multiple T
    halo = 3 * d
    halos = jnp.zeros((1, n_tiles, 2 * halo, c), jnp.float32)
    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    two_d = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kern = functools.partial(_unit_kernel, k=7, dilation=d, t_blk=tb,
                             halo=halo, eps=1e-9)

    def punit(h):
        return pl.pallas_call(
            kern,
            grid=(1, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2 * halo, c), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, c, c), lambda bi, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, t, c), h.dtype),
            scratch_shapes=[pltpu.VMEM((tb + 2 * halo, c), jnp.bfloat16)],
        )(h, halos, w1b, two_d(b1), two_d(a1), two_d(a2), w2b, two_d(b2))
    out["kernel_only_ms"] = round(_wall(punit, x) * 1e3, 3)
    print("kernel_only", out["kernel_only_ms"], flush=True)

    # 3. full wrapper (halo construction + pad + slice)
    def full(h):
        return seanet_res_unit(h, a1, w1, b1, a2, w2, b2, dilation=d,
                               t_blk=tb)
    out["full_wrapper_ms"] = round(_wall(full, x) * 1e3, 3)
    print("full_wrapper", out["full_wrapper_ms"], flush=True)

    # 4. XLA chain
    def xla_unit(h):
        y = act.snake(h, a1)
        y = conv.conv1d(y, w1, b1, dilation=d, padding=3 * d)
        y = act.snake(y, a2)
        return h + (y @ w2 + b2)
    out["xla_ms"] = round(_wall(xla_unit, x) * 1e3, 3)
    print("xla", out["xla_ms"], flush=True)
    print(json.dumps(out))




def aligned_cases():
    """Aligned-lane variants: C=128 copy and C=384 unit."""
    rng = np.random.default_rng(0)
    out = {}
    # copy at C=128 (aligned), same total bytes as b3
    t, c, tb = 359424, 128, 4096
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    n_tiles = t // tb

    def pcopy(h):
        return pl.pallas_call(
            copy_kernel,
            grid=(1, n_tiles),
            in_specs=[pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tb, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, t, c), h.dtype),
        )(h)
    out["copy_c128_ms"] = round(_wall(pcopy, x) * 1e3, 3)
    print("copy_c128", out["copy_c128_ms"], flush=True)

    # full unit at C=384 (aligned), T=59904 (DAC block1 shape)
    t, c, d, tb = 59904, 384, 1, 1024
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)

    def full(h):
        return seanet_res_unit(h, a1, w1, b1, a2, w2, b2, dilation=d,
                               t_blk=tb)
    out["unit_c384_ms"] = round(_wall(full, x) * 1e3, 3)
    print("unit_c384", out["unit_c384_ms"], flush=True)

    def xla_unit(h):
        y = act.snake(h, a1)
        y = conv.conv1d(y, w1, b1, dilation=d, padding=3 * d)
        y = act.snake(y, a2)
        return h + (y @ w2 + b2)
    out["xla_c384_ms"] = round(_wall(xla_unit, x) * 1e3, 3)
    print("xla_c384", out["xla_c384_ms"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys as _s
    if "--aligned" in _s.argv:
        aligned_cases()
    else:
        main()

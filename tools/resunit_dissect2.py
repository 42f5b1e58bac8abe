#!/usr/bin/env python
"""Dissect 2: isolate VPU-sin cost vs DMA vs matmul in the res-unit, at
the lane-aligned padded-DAC block3 shape (C=128, T=479232)."""
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

from codec_tpu.ops import act
from codec_tpu.ops.seanet_pallas import seanet_res_unit, _unit_kernel


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
    t, c, d, tb = 479232, 128, 1, 4096
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.2, jnp.float32)
    out = {}

    # XLA elementwise snake x2 (pure VPU sin cost at full T)
    out["xla_snake2_ms"] = round(_wall(
        lambda h: act.snake(act.snake(h, a1), a2), x) * 1e3, 3)
    print("xla_snake2", out["xla_snake2_ms"], flush=True)

    # XLA x2 elementwise mult (same traffic, no sin)
    out["xla_mul2_ms"] = round(_wall(
        lambda h: (h * a1) * a2, x) * 1e3, 3)
    print("xla_mul2", out["xla_mul2_ms"], flush=True)

    # fused unit with snakes
    out["unit_snake_ms"] = round(_wall(
        lambda h: seanet_res_unit(h, a1, w1, b1, a2, w2, b2, dilation=d,
                                  t_blk=tb), x) * 1e3, 3)
    print("unit_snake", out["unit_snake_ms"], flush=True)

    # fused unit without snakes (identity activation) — isolates matmul+DMA
    from codec_tpu.ops import seanet_pallas as sp

    halo = 3 * d
    n_tiles = -(-t // tb)
    t_pad = n_tiles * tb
    two_d = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kern = functools.partial(_unit_kernel, k=7, dilation=d, t_blk=tb,
                             halo=halo, eps=1e-9, do_snake=False)

    @jax.jit
    def unit_nosnake(h):
        xp = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))
        halos = jnp.zeros((1, n_tiles, 2 * halo, c), jnp.float32)
        o = pl.pallas_call(
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
            out_shape=jax.ShapeDtypeStruct((1, t_pad, c), h.dtype),
            scratch_shapes=[pltpu.VMEM((tb + 2 * halo, c), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        )(xp, halos, w1.astype(jnp.bfloat16), two_d(b1), two_d(a1),
          two_d(a2), w2.astype(jnp.bfloat16), two_d(b2))
        return o[:, :t]
    out["unit_nosnake_ms"] = round(_wall(unit_nosnake, x) * 1e3, 3)
    print("unit_nosnake", out["unit_nosnake_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

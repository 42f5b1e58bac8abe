#!/usr/bin/env python
"""One-off: stage-level timing of DAC decode on the attached device.

Times cumulative prefixes of the decode graph (latent -> c1 -> block1..4 ->
final) plus a bf16 end-to-end variant, with the chained-iteration
methodology from bench.py. Output: JSON line with per-stage walls.
"""
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

from codec_tpu.models.bench_init import random_dac_decode_params
from codec_tpu.models import dac as D
from codec_tpu.ops import act, conv


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def _wall(fn, x0, n_iters=10):
    """fn: array -> array; chained timing (output feeds next input hash)."""
    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            y = fn(x)
            # mix output back into input deterministically
            nxt = x * (1.0 + 1e-12 * acc) + 1e-12 * jnp.sum(y[..., :1])
            return nxt, acc + y.reshape(-1)[0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n_iters, body,
                                   (x0 * 0 + x0, jnp.float32(0)))
        return acc
    np.asarray(chained(x0))
    r = _rtt()
    t0 = time.monotonic()
    np.asarray(chained(x0))
    return max(1e-9, (time.monotonic() - t0) - r) / n_iters


def main():
    rng = np.random.default_rng(0)
    dcfg, dparams = random_dac_decode_params()
    t = int(20.0 * 24000) // dcfg.hop_size
    codes = jnp.asarray(rng.integers(0, dcfg.codebook_size,
                                     (1, t, dcfg.n_q)), jnp.int32)
    out = {}

    # stage inputs: run prefix once to get realistic input for each stage
    lat = jax.jit(lambda c: D.dac_latent_from_codes(
        dparams["vq"], jnp.clip(c, 0, dcfg.codebook_size - 1), dcfg.n_q))(codes)
    lat = jax.block_until_ready(lat)
    out["latent_ms"] = round(_wall(
        lambda l: D.dac_latent_from_codes(
            dparams["vq"],
            (jnp.abs(l[..., :dcfg.n_q]) * 7).astype(jnp.int32) % dcfg.codebook_size,
            dcfg.n_q), lat) * 1e3, 3)

    x = jax.block_until_ready(jax.jit(
        lambda l: D._sym_conv(l, dparams["dec_c1"]))(lat))
    out["c1_ms"] = round(_wall(
        lambda l: D._sym_conv(l, dparams["dec_c1"]), lat) * 1e3, 3)

    xs = [x]
    for bi, blk in enumerate(dparams["dec_blocks"]):
        def stage(h, blk=blk):
            h = act.snake(h, blk["snake"])
            k = blk["tr"]["k"]; s = k // 2
            h = conv.convtr1d(h, blk["tr"]["w"], blk["tr"]["b"], stride=s,
                              padding=(s + 1) // 2)
            for u, d in zip(blk["units"], D.RES_DILATIONS):
                h = D._res_unit(h, u, d)
            return h
        out[f"block{bi}_ms"] = round(_wall(stage, xs[-1]) * 1e3, 3)
        xs.append(jax.block_until_ready(jax.jit(stage)(xs[-1])))
        # also: convtr alone for this block
        def tr_only(h, blk=blk):
            k = blk["tr"]["k"]; s = k // 2
            return conv.convtr1d(act.snake(h, blk["snake"]), blk["tr"]["w"],
                                 blk["tr"]["b"], stride=s, padding=(s + 1) // 2)
        out[f"block{bi}_tr_ms"] = round(_wall(tr_only, xs[-2]) * 1e3, 3)

    def final(h):
        h = act.snake(h, dparams["dec_snake"])
        h = D._sym_conv(h, dparams["dec_c2"])
        return jnp.tanh(h[..., 0])
    out["final_ms"] = round(_wall(final, xs[-1]) * 1e3, 3)

    # bf16 end-to-end
    p16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, dparams)
    out["e2e_f32_ms"] = round(_wall(
        lambda l: D.dac_decode_from_latent(dparams, l, dcfg), lat) * 1e3, 3)
    out["e2e_bf16_ms"] = round(_wall(
        lambda l: D.dac_decode_from_latent(p16, l.astype(jnp.bfloat16), dcfg),
        lat) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

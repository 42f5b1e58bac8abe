#!/usr/bin/env python
"""Steady-state full-size Mimi ENCODE wall on the attached device:
TPU-default matmul precision (bf16) vs exact_encode (f32 HIGHEST).

Quantifies what the code-parity mode (tools/tpu_parity.py --exact /
codec-cli --exact-encode / CODEC_EXACT_ENCODE=1) costs: the encoder's
convs + 8-layer transformer + RVQ all pinned to HIGHEST vs only the RVQ
score matmul (the always-pinned baseline, ops/rvq.py).

Methodology: bench.py's chained-iteration wall — N data-dependent
encodes inside one jitted fori_loop (codes feed back into the pcm as a
zero-scaled perturbation), host readback forced, RTT subtracted.

Usage: python tools/encode_micro.py [--seconds 20] [--iters 10]
Output: human lines + one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import codec_tpu  # noqa: F401  (persistent compile cache)
from codec_tpu.models.mimi import MimiConfig, mimi_encode_fn
from codec_tpu.models.mimi_init import random_mimi_params


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def chained_wall(params, pcm, cfg, exact: bool, n_iters: int):
    def one(x):
        if exact:
            with jax.default_matmul_precision("highest"):
                return mimi_encode_fn(params, x, cfg)
        return mimi_encode_fn(params, x, cfg)

    @jax.jit
    def chain(x):
        def body(i, carry):
            x, acc = carry
            codes = one(x)
            # data dependence without changing the input values
            x = x + 0.0 * codes.astype(jnp.float32).mean()
            return x, acc + codes.sum()
        x, acc = jax.lax.fori_loop(0, n_iters, body, (x, jnp.int32(0)))
        return acc

    t0 = time.monotonic()
    np.asarray(chain(pcm))
    compile_s = time.monotonic() - t0
    rtt = _rtt()
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(chain(pcm))
        walls.append(max(1e-9, (time.monotonic() - t0) - rtt) / n_iters)
    return min(walls), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = MimiConfig()          # full kyutai/mimi dims (models/mimi.py)
    params = random_mimi_params(cfg)
    n = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((1, n)) * 0.1, jnp.float32)

    out = {"audio_s": args.seconds}
    for exact in (False, True):
        wall, comp = chained_wall(params, pcm, cfg, exact, args.iters)
        key = "exact_f32_highest" if exact else "tpu_default_bf16"
        out[key] = {"wall_ms": round(wall * 1e3, 2),
                    "xrt": round(args.seconds / wall, 1),
                    "compile_s": round(comp, 1)}
        print(key, out[key], flush=True)
    out["exact_cost_x"] = round(
        out["exact_f32_highest"]["wall_ms"]
        / out["tpu_default_bf16"]["wall_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

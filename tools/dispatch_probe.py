#!/usr/bin/env python
"""Probe per-call dispatch overhead through the axon relay and A/B the
mimi bf16 b8 decode path (CODEC_NO_CONV_OPT toggles the conv rework)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import codec_tpu  # noqa: F401  (shared persistent cache)


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dispatch"
    out = {"mode": mode, "no_conv_opt": bool(os.environ.get("CODEC_NO_CONV_OPT"))}

    if mode == "dispatch":
        # no-op jit with N array args: measures per-call arg marshaling
        for n_args in (1, 50, 200):
            arrs = [jnp.ones((64, 64)) for _ in range(n_args)]
            f = jax.jit(lambda dyn, x: x + dyn[0][0, 0])
            x = jnp.ones((4,))
            np.asarray(f(arrs, x))
            rtt = _rtt()
            t0 = time.monotonic()
            for _ in range(20):
                np.asarray(f(arrs, x))
            w = ((time.monotonic() - t0) / 20 - rtt) * 1e3
            out[f"noop_{n_args}_args_ms"] = round(w, 2)
            print(n_args, "args:", round(w, 2), "ms", flush=True)
    else:
        from codec_tpu.models.mimi import MimiConfig, mimi_decode_fn
        from codec_tpu.models.mimi_init import random_mimi_params

        cfg = MimiConfig()
        params = random_mimi_params(cfg, num_filters=64, seed=0,
                                    dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        t_frames, batch = 250, 8
        codes0 = jnp.asarray(rng.integers(0, cfg.codebook_size,
                                          (batch, t_frames, cfg.n_q)), jnp.int32)

        @jax.jit
        def chained(params, codes):
            def body(i, carry):
                codes, acc = carry
                pcm = mimi_decode_fn(params, codes, cfg)
                nxt = (jnp.abs(pcm[:, : t_frames * cfg.n_q]).reshape(
                    batch, t_frames, cfg.n_q) * 1e6).astype(jnp.int32) \
                    % cfg.codebook_size
                return nxt, acc + pcm[0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, 10, body, (codes, jnp.float32(0)))
            return acc

        np.asarray(chained(params, codes0))
        rtt = _rtt()
        t0 = time.monotonic()
        np.asarray(chained(params, codes0))
        wall = max(1e-9, (time.monotonic() - t0) - rtt) / 10
        out["bf16_b8_wall_ms"] = round(wall * 1e3, 2)
        print("bf16 b8 wall_ms:", out["bf16_b8_wall_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

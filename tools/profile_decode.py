#!/usr/bin/env python
"""Roofline profile of codec decode graphs on the attached device.

For each model (mimi / dac / wavtokenizer, bench fixture shapes) this
compiles the decode graph, pulls XLA's cost_analysis (flops, bytes
accessed), times the steady-state wall per decode with the chained-
iteration methodology from bench.py, and prints achieved TFLOP/s and
GB/s against the device peaks — i.e. whether a decode is compute-bound,
bandwidth-bound, or leaving speed on the table.

Usage:  python tools/profile_decode.py [--models mimi,dac,wavtokenizer,snac]
        [--seconds 20] [--iters 10] [--top 12]
Output: one human table per model + a final JSON line.
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e peaks (per chip): MXU ~197 TFLOP/s bf16 (f32 matmuls run at bf16
# precision by default on TPU), HBM ~819 GB/s.
PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def _readback_rtt() -> float:
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(y)
        ts.append(time.monotonic() - t0)
    return min(ts)


def _chained_wall(decode, codes0, vocab, n_iters=10):
    @jax.jit
    def chained(codes):
        def body(i, carry):
            codes, acc = carry
            pcm = decode(codes)
            nxt = (jnp.abs(pcm[:, : codes.size]).reshape(codes.shape)
                   * 1e6).astype(jnp.int32) % vocab
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (codes, jnp.float32(0)))
        return acc

    np.asarray(chained(codes0))                    # compile + warm
    rtt = _readback_rtt()
    t0 = time.monotonic()
    np.asarray(chained(codes0))
    return max(1e-9, (time.monotonic() - t0) - rtt) / n_iters


def _analyze(name, decode, codes0, vocab, audio_s, iters, top_n):
    from codec_tpu.runtime.op_profile import profile_hlo

    lowered = jax.jit(decode).lower(codes0)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
    except Exception:
        ca = {}
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    hlo = profile_hlo(compiled.as_text())

    wall = _chained_wall(decode, codes0, vocab, iters)
    tflops = flops / wall / 1e12
    gbs = bytes_acc / wall / 1e9
    out = {
        "wall_ms": round(wall * 1e3, 3),
        "xrt": round(audio_s / wall, 1),
        "gflops_per_call": round(flops / 1e9, 2),
        "gbytes_per_call": round(bytes_acc / 1e9, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_gbs": round(gbs, 1),
        "pct_peak_flops": round(100 * tflops / PEAK_TFLOPS, 1),
        "pct_peak_bw": round(100 * gbs / PEAK_GBS, 1),
        "arith_intensity": round(flops / max(1.0, bytes_acc), 1),
    }
    print(f"\n=== {name} ===")
    for k, v in out.items():
        print(f"  {k:>18s}: {v}")
    bound = "bandwidth" if out["pct_peak_bw"] > out["pct_peak_flops"] \
        else "compute"
    print(f"  {'bound by':>18s}: {bound} "
          f"(roofline: intensity {out['arith_intensity']} vs knee "
          f"{PEAK_TFLOPS * 1e3 / PEAK_GBS:.0f} flops/byte)")
    print(f"  top (op, shape) by count:")
    for entry, n in list(hlo.get("top_by_op_shape", {}).items())[:top_n]:
        print(f"    {n:5d}  {entry}")
    out["bound"] = bound
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mimi,dac,wavtokenizer")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--bf16", action="store_true",
                    help="cast params to bf16 (snac only for now)")
    args = ap.parse_args()
    models = args.models.split(",")
    rng = np.random.default_rng(0)
    results = {}

    if "mimi" in models:
        from codec_tpu.models.mimi import MimiConfig, mimi_decode_fn
        from codec_tpu.models.mimi_init import random_mimi_params

        cfg = MimiConfig()
        params = random_mimi_params(cfg, num_filters=64, seed=0)
        t = int(args.seconds * cfg.sample_rate) // cfg.hop_size
        codes = jnp.asarray(rng.integers(0, cfg.codebook_size,
                                         (1, t, cfg.n_q)), jnp.int32)
        results["mimi"] = _analyze(
            "mimi", lambda c: mimi_decode_fn(params, c, cfg), codes,
            cfg.codebook_size, t * cfg.hop_size / cfg.sample_rate,
            args.iters, args.top)

    if "dac" in models:
        from codec_tpu.models.bench_init import random_dac_decode_params
        from codec_tpu.models.dac import dac_decode_fn

        dcfg, dparams = random_dac_decode_params()
        t = int(args.seconds * 24000) // dcfg.hop_size
        codes = jnp.asarray(rng.integers(0, dcfg.codebook_size,
                                         (1, t, dcfg.n_q)), jnp.int32)
        results["dac"] = _analyze(
            "dac", lambda c: dac_decode_fn(dparams, c, dcfg), codes,
            dcfg.codebook_size, t * dcfg.hop_size / dcfg.sample_rate,
            args.iters, args.top)

    if "wavtokenizer" in models:
        from codec_tpu.models.bench_init import random_wt_decode_params
        from codec_tpu.models.wavtokenizer import wt_decode_fn

        wcfg, wparams = random_wt_decode_params()
        t = int(args.seconds * 24000) // wcfg.hop_size
        codes = jnp.asarray(rng.integers(0, wcfg.codebook_size,
                                         (1, t, 1)), jnp.int32)
        results["wavtokenizer"] = _analyze(
            "wavtokenizer", lambda c: wt_decode_fn(wparams, c, wcfg), codes,
            wcfg.codebook_size, t * wcfg.hop_size / wcfg.sample_rate,
            args.iters, args.top)

    if "snac" in models:
        from codec_tpu.models.bench_init import random_snac_params
        from codec_tpu.models.snac import snac_decode_fn

        scfg, sparams = random_snac_params(encoder=False)
        if args.bf16:
            sparams = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if isinstance(a, jax.Array) and a.dtype == jnp.float32
                else a, sparams)
        t = (int(args.seconds * 24000) // scfg.hop_size) // 4 * 4
        codes = jnp.asarray(rng.integers(0, scfg.codebook_size,
                                         (1, t, 3)), jnp.int32)
        results["snac"] = _analyze(
            "snac", lambda c: snac_decode_fn(sparams, c, scfg), codes,
            scfg.codebook_size, t * scfg.hop_size / scfg.sample_rate,
            args.iters, args.top)

    print("\n" + json.dumps(results))


if __name__ == "__main__":
    main()

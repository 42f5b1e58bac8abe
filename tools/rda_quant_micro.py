#!/usr/bin/env python
"""Chunked depth-AR generation with a packed-quantized backbone vs dense
bf16, at the CSM-1B fixture shape (bench.py `rda_chunked`).

The AR frame is HBM-bound on backbone weight reads (~1.9 GB bf16 per
step at Llama-1B shape -> 2.4 ms floor on v5e); Q4_K packing cuts the
resident bytes ~3.5x and the fused dequant-matmul kernels
(ops/qmat_pallas.py) execute the GEMVs straight off the packed form —
this measures whether that converts into end-to-end frame time on the
`--on-device --chunk-frames` product path.

Usage: python tools/rda_quant_micro.py [--quants q4_k,q8_0] [--frames 16]
Output: human table + one JSON line.
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


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def quantize_backbone(bb_params, qtype: str):
    from codec_tpu.ops.qmat_pallas import pack_dense_stacked

    out = dict(bb_params)
    lay = dict(bb_params["layers"])
    for k in ("q", "k", "v", "o", "gate", "up", "down"):
        lay[k] = pack_dense_stacked(bb_params["layers"][k], qtype)
    out["layers"] = lay
    return out


def hbm_bytes(tree):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def run_chunk(lm, cfg, bb_params, k_frames: int, iters: int):
    import jax.random as jr
    from codec_tpu.lm.fused_gen import build_gen_chunk

    chunk = build_gen_chunk(lm, cfg, (0.0, 0, 1.0, 0.0), k_frames)
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden
    kv = jnp.zeros((L, 2, nkv, cfg.max_ctx, hd), jnp.bfloat16)
    h = jr.normal(jr.PRNGKey(1), (hid,), jnp.float32) * 0.3
    key = jr.PRNGKey(2)
    t0 = time.monotonic()
    packed, h, kv, key = chunk(bb_params, kv, np.int32(0), np.int32(0),
                               h, key, np.int32(0))
    np.asarray(packed)
    compile_s = time.monotonic() - t0
    rtt = _rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        packed, h, kv, key = chunk(bb_params, kv, np.int32(0), np.int32(0),
                                   h, key, np.int32(0))
        np.asarray(packed)
    wall = max(1e-9, (time.monotonic() - t0) - iters * rtt) / (iters * k_frames)
    return wall, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quants", default="q4_k,q8_0")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    lm, cfg, bb_params, dtype = bench._rda_chunk_fixture(fast=False)

    res = {}
    dense_b = hbm_bytes(bb_params["layers"])
    w, c = run_chunk(lm, cfg, bb_params, args.frames, args.iters)
    res["dense_bf16"] = {"frame_ms": round(w * 1e3, 2),
                         "weights_gb": round(dense_b / 1e9, 3),
                         "compile_s": round(c, 1)}
    print("dense_bf16:", res["dense_bf16"], flush=True)

    for q in args.quants.split(","):
        qp = quantize_backbone(bb_params, q)
        qb = hbm_bytes(qp["layers"])
        w, c = run_chunk(lm, cfg, qp, args.frames, args.iters)
        res[q] = {"frame_ms": round(w * 1e3, 2),
                  "weights_gb": round(qb / 1e9, 3),
                  "compile_s": round(c, 1),
                  "speedup_vs_dense": round(
                      res["dense_bf16"]["frame_ms"] / (w * 1e3), 2)}
        print(f"{q}:", res[q], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-off: stage-level timing of SNAC decode on the attached device.

BENCH_r04 flagged SNAC bf16 b1 decode as the lineup outlier (142 ms,
0.01% MFU); the round-5 depthwise-shifts formulation brought it to
32.2 ms — still at 0.07% MFU / 0.35% HBM in the roofline, i.e. bound by
neither compute nor bandwidth. This tool times each decoder stage in
isolation (latent gather, input convs, each upsample block, final
conv) with the chained-iteration methodology from bench.py, in bf16,
to localize where the remaining wall lives.

Usage: python tools/snac_bisect.py [--full]   (real TPU; compiles cache
to .jax_cache like the other dissect tools)

--full: skip the per-stage dissection and time the complete decode with
bench.py's exact chained methodology (n_iters=50) — the reproducible
source of the 32.2 -> 12.96 ms fused-chain number [session r5].
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

from codec_tpu.models.bench_init import random_snac_params
from codec_tpu.models import snac as S
from codec_tpu.ops import act, conv


def _rtt():
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); np.asarray(y); ts.append(time.monotonic() - t0)
    return min(ts)


def _wall(fn, x0, n_iters=10):
    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            y = fn(x)
            nxt = (x.astype(jnp.float32) * (1.0 + 1e-12 * acc)
                   + 1e-12 * jnp.sum(y.reshape(-1)[:1].astype(jnp.float32))
                   ).astype(x.dtype)
            return nxt, acc + y.reshape(-1)[0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n_iters, body,
                                   (x0 * 0 + x0, jnp.float32(0)))
        return acc
    np.asarray(chained(x0))
    r = _rtt()
    t0 = time.monotonic()
    np.asarray(chained(x0))
    return max(1e-9, (time.monotonic() - t0) - r) / n_iters


def _full_decode(scfg, sparams, codes, n_iters=50):
    """bench.py::_bench_generic verbatim: chained fori_loop, output
    feeds the next iteration's codes, one host readback minus RTT."""
    vocab = scfg.codebook_size

    def chained(c0):
        def body(i, carry):
            c, acc = carry
            pcm = S.snac_decode_fn(sparams, c, scfg)
            per_row = c.shape[1] * c.shape[2]
            nxt = (jnp.abs(pcm[:, :per_row]).reshape(c.shape)
                   * 1e6).astype(jnp.int32) % vocab
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (c0, jnp.float32(0)))
        return acc

    t0 = time.monotonic()
    compiled = jax.jit(chained).lower(codes).compile()
    compile_s = time.monotonic() - t0
    np.asarray(compiled(codes))
    r = _rtt()
    t0 = time.monotonic()
    np.asarray(compiled(codes))
    wall = max(1e-9, (time.monotonic() - t0) - r) / n_iters
    return wall, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    scfg, sparams = random_snac_params(encoder=False)
    sparams = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        sparams)
    t_sn = (24000 * 20 // scfg.hop_size) // 4 * 4
    codes = jnp.asarray(rng.integers(0, scfg.codebook_size, (1, t_sn, 3)),
                        jnp.int32)
    if args.full:
        wall, compile_s = _full_decode(scfg, sparams, codes)
        out_samples = t_sn * scfg.hop_size
        print(json.dumps({
            "t_fine": t_sn, "backend": jax.default_backend(),
            "compile_s": round(compile_s, 1),
            "wall_ms": round(wall * 1e3, 2),
            "xrt": round(out_samples / scfg.sample_rate / wall, 1)}))
        return
    to = conv.lane_pad()
    out = {"t_fine": t_sn, "lane_pad": to,
           "backend": jax.default_backend()}

    # latent from codes
    def latent(c):
        c = jnp.clip(c, 0, scfg.codebook_size - 1)
        c_levels = [c[:, ::s, qi] for qi, s in enumerate(scfg.vq_strides)]
        return S.snac_latent_from_codes(sparams, c_levels, scfg)

    lat = jax.block_until_ready(jax.jit(latent)(codes))
    out["latent_ms"] = round(_wall(
        lambda l: latent((jnp.abs(l[..., :3]) * 7).astype(jnp.int32)
                         % scfg.codebook_size), lat) * 1e3, 3)

    # input dw + pw convs
    def in_convs(x):
        x = S._conv(x, S._pad_layer(sparams["dec_in_dw"], to),
                    padding=(sparams["dec_in_dw"]["k"] - 1) // 2)
        return S._conv(x, S._pad_layer(sparams["dec_in_pw"], to))

    x = jax.block_until_ready(jax.jit(in_convs)(lat))
    out["in_convs_ms"] = round(_wall(in_convs, lat) * 1e3, 3)

    # each upsample block (snake + subpixel convtr + 3 depthwise res units)
    for bi, (blk, s) in enumerate(zip(sparams["dec_blocks"],
                                      scfg.decoder_rates)):
        def stage(h, blk=blk, s=s):
            h = act.snake(h, S._pc(blk["act"], 0, to, 1.0))
            pad = (s + 1) // 2
            out_pad = s % 2
            w_tr = S._pc(S._pc(blk["tr"]["w"], 1, to), 2, to)
            b_tr = S._pc(blk["tr"]["b"], 0, to)
            if conv.use_conv_matmul():
                y = conv.convtr1d_subpixel(h, w_tr, b_tr, stride=s)
            else:
                y = conv.convtr1d(h, w_tr, b_tr, stride=s)
            y = y[:, pad: y.shape[1] - (pad - out_pad), :]
            for u, d in zip(blk["units"], S.RES_DILATIONS):
                y = S._res_unit(y, {k2: (S._pad_layer(u[k2], to)
                                         if k2 in ("c1", "c2")
                                         else S._pc(u[k2], 0, to, 1.0))
                                    for k2 in u}, d)
            return y

        out[f"block{bi}_ms"] = round(_wall(stage, x) * 1e3, 3)
        x = jax.block_until_ready(jax.jit(stage)(x))
        out[f"block{bi}_shape"] = list(x.shape)

    # final snake + conv + tanh
    def final(h):
        h = act.snake(h, S._pc(sparams["dec_act_final"], 0, to, 1.0))
        fin = dict(sparams["dec_final"],
                   w=S._pc(sparams["dec_final"]["w"], 1, to))
        h = S._conv(h, fin, padding=(sparams["dec_final"]["k"] - 1) // 2)
        return jnp.tanh(h[..., 0])

    out["final_ms"] = round(_wall(final, x) * 1e3, 3)
    out["sum_ms"] = round(sum(v for k, v in out.items()
                              if k.endswith("_ms")), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

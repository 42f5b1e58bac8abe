"""Benchmark: Mimi decode realtime factor per chip (the BASELINE.json metric).

Runs full-size Mimi (512 hidden, 8-layer transformer, 32 RVQ codebooks,
num_filters=64 — identical shapes/FLOPs to kyutai/mimi) with random weights.

Methodology: the execution environment may reach the TPU through an async
relay where `block_until_ready` returns before device completion, so we time
N data-dependent decode iterations chained INSIDE one jitted `fori_loop` and
force completion with a host readback, subtracting the measured readback RTT.

Reference point (BASELINE.md): the CPU reference decodes ~O(10x) realtime
single-stream; driver north star is >100x realtime per v5e chip.
vs_baseline = ours_xrt / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the remote-compile path is slow (~minutes for the
# full decode graph); cache hits make repeat bench runs fast.
jax.config.update("jax_compilation_cache_dir",
                  str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _readback_rtt() -> float:
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(y)
        ts.append(time.monotonic() - t0)
    return min(ts)


def _bench_decode(cfg, params, batch: int, t_frames: int, n_iters: int = 10):
    from codec_tpu.models.mimi import mimi_decode_fn

    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (batch, t_frames, cfg.n_q)), jnp.int32)

    @jax.jit
    def chained(params, codes):
        def body(i, carry):
            codes, acc = carry
            pcm = mimi_decode_fn(params, codes, cfg)
            # derive next codes from the output -> serializes iterations
            nxt = (jnp.abs(pcm[:, : t_frames * cfg.n_q]).reshape(
                batch, t_frames, cfg.n_q) * 1e6).astype(jnp.int32) % cfg.codebook_size
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (codes, jnp.float32(0)))
        return acc

    t0 = time.monotonic()
    np.asarray(chained(params, codes0))            # compile + first run
    compile_s = time.monotonic() - t0
    rtt = _readback_rtt()
    t0 = time.monotonic()
    np.asarray(chained(params, codes0))
    wall = max(1e-9, (time.monotonic() - t0) - rtt) / n_iters
    audio_s = batch * t_frames * cfg.hop_size / cfg.sample_rate
    return audio_s / wall, wall, compile_s


def _bench_generic(decode_fn, params, codes0, out_samples: int,
                   sample_rate: int, vocab: int, n_iters: int = 10):
    """Chained-iteration timing for an arbitrary decode fn (same
    methodology as _bench_decode)."""
    # params closed over (not a jit argument): these trees carry Python-int
    # kernel sizes used for static padding math.
    @jax.jit
    def chained(codes):
        def body(i, carry):
            codes, acc = carry
            pcm = decode_fn(params, codes)
            # derive next codes from the output -> serializes iterations
            nxt = (jnp.abs(pcm[:, : codes.size]).reshape(codes.shape)
                   * 1e6).astype(jnp.int32) % vocab
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (codes, jnp.float32(0)))
        return acc

    np.asarray(chained(codes0))
    rtt = _readback_rtt()
    t0 = time.monotonic()
    np.asarray(chained(codes0))
    wall = max(1e-9, (time.monotonic() - t0) - rtt) / n_iters
    return (out_samples / sample_rate) / wall, wall


def main():
    from codec_tpu.models.mimi import MimiConfig
    from codec_tpu.models.mimi_init import random_mimi_params

    dev = jax.devices()[0]
    t_frames = 250                      # 20 s of 24 kHz audio per stream

    cfg = MimiConfig()
    params32 = random_mimi_params(cfg, num_filters=64, seed=0, dtype=jnp.float32)
    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params32)

    xrt_f32, wall_f32, compile_s = _bench_decode(cfg, params32, 1, t_frames)
    xrt_bf16_b8, wall_bf16_b8, _ = _bench_decode(cfg, params_bf16, 8, t_frames)

    # DAC / WavTokenizer per-chip xRT (SURVEY §7.8: record Mimi/DAC/WT)
    from codec_tpu.models.bench_init import (random_dac_decode_params,
                                             random_wt_decode_params)
    from codec_tpu.models.dac import dac_decode_fn
    from codec_tpu.models.wavtokenizer import wt_decode_fn

    rng = np.random.default_rng(0)
    dcfg, dparams = random_dac_decode_params()
    t_dac = 24000 * 20 // dcfg.hop_size                 # 20 s of audio
    dac_codes = jnp.asarray(rng.integers(0, dcfg.codebook_size,
                                         (1, t_dac, dcfg.n_q)), jnp.int32)
    xrt_dac, wall_dac = _bench_generic(
        lambda p, c: dac_decode_fn(p, c, dcfg), dparams, dac_codes,
        t_dac * dcfg.hop_size, dcfg.sample_rate, dcfg.codebook_size)

    # streaming decode: steady-state latency for one 80 ms frame
    from codec_tpu.models.mimi import (mimi_decode_stream_init,
                                       mimi_decode_stream_step)

    sstate = mimi_decode_stream_init(params32, cfg, 1)
    sstep = jax.jit(
        lambda p, s, c: mimi_decode_stream_step(p, s, c, cfg),
        donate_argnums=(1,))
    c1 = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, 1, cfg.n_q)),
                     jnp.int32)
    pcm1, sstate = sstep(params32, sstate, c1)
    np.asarray(pcm1)
    t0 = time.monotonic()
    for _ in range(50):
        pcm1, sstate = sstep(params32, sstate, c1)
    np.asarray(pcm1)
    stream_ms = (time.monotonic() - t0 - _readback_rtt()) / 50 * 1e3

    wcfg, wparams = random_wt_decode_params()
    t_wt = 24000 * 20 // wcfg.hop_size
    wt_codes = jnp.asarray(rng.integers(0, wcfg.codebook_size,
                                        (1, t_wt, 1)), jnp.int32)
    xrt_wt, wall_wt = _bench_generic(
        lambda p, c: wt_decode_fn(p, c, wcfg), wparams, wt_codes,
        t_wt * wcfg.hop_size, wcfg.sample_rate, wcfg.codebook_size)

    headline = xrt_f32
    print(json.dumps({
        "metric": "mimi_decode_xrt_per_chip",
        "value": round(headline, 1),
        "unit": "x_realtime",
        "vs_baseline": round(headline / 10.0, 2),
        "extra": {
            "device": str(dev),
            "t_frames": t_frames,
            "f32_b1": {"xrt": round(xrt_f32, 1), "wall_ms": round(wall_f32 * 1e3, 2)},
            "bf16_b8_throughput": {"xrt": round(xrt_bf16_b8, 1), "wall_ms": round(wall_bf16_b8 * 1e3, 2)},
            "dac_f32_b1": {"xrt": round(xrt_dac, 1), "wall_ms": round(wall_dac * 1e3, 2)},
            "wavtokenizer_f32_b1": {"xrt": round(xrt_wt, 1), "wall_ms": round(wall_wt * 1e3, 2)},
            "streaming_frame_latency_ms": round(stream_ms, 2),
            "first_compile_s": round(compile_s, 1),
        },
    }))


if __name__ == "__main__":
    main()

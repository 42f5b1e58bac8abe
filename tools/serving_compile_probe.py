#!/usr/bin/env python
"""Count (and attribute) XLA backend compiles inside the TIMED region of
the serving bench flow (tools/cont_batch_bench.py). The round-4 driver
bench measured 823 ms/frame steady-state — ~100-350x worse than the
engine's parts — strongly suggesting cold compiles inside the timed
region that warmup (max_steps=2-3) never hit. Compile COUNTS reproduce
at any model size on any platform, so this probe uses tiny dims on CPU.

Usage: JAX_PLATFORMS=cpu python tools/serving_compile_probe.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.monitoring as mon

PHASE = ["init"]
COMPILES: list[tuple[str, float, list[str]]] = []


def _listener(name, secs, **kw):
    if name != "/jax/core/compile/backend_compile_duration":
        return
    stack = [f"{f.filename.split('/')[-1]}:{f.lineno}:{f.name}"
             for f in traceback.extract_stack()
             if "/repo/" in f.filename
             and "serving_compile_probe" not in f.filename]
    COMPILES.append((PHASE[0], secs, stack[-8:]))


mon.register_event_duration_secs_listener(_listener)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402

import codec_tpu  # noqa: F401,E402
from codec_tpu.io.gguf import GGUFReader  # noqa: E402
from codec_tpu.lm import create_lm  # noqa: E402
from codec_tpu.lm.audio_lm import AudioLM  # noqa: E402
from codec_tpu.lm.backbone import BackboneConfig, LlamaBackbone  # noqa: E402
from codec_tpu.models.bench_lm_init import write_rda_gguf  # noqa: E402
from codec_tpu.ops.sample import OnDeviceSampling  # noqa: E402
from codec_tpu.serve.cont_batch import ContinuousBatcher  # noqa: E402

H, DH, NCB, VOCAB = 256, 128, 8, 259


def tiny_backbone(dtype=jnp.bfloat16) -> LlamaBackbone:
    cfg = BackboneConfig(hidden=H, n_layers=2, n_heads=4, n_kv_heads=2,
                         head_dim=64, ffn_dim=512, vocab_size=8, max_ctx=512)
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


import pathlib  # noqa: E402
FIX = pathlib.Path("/tmp/probe_fixtures")
FIX.mkdir(exist_ok=True)
lm_path = FIX / "rda_tiny.gguf"
if not lm_path.exists():
    write_rda_gguf(lm_path, h=H, dh=DH, n_cb=NCB, vocab=VOCAB)
reader = GGUFReader(lm_path)
lm = create_lm(reader)
bb = tiny_backbone()
engine = ContinuousBatcher(
    bb, lm, n_slots=4,
    on_device=OnDeviceSampling(temperature=0.8, top_k=50, chunk_frames=16),
    decode=False)

rng = np.random.default_rng(0)
prompts = [[(rng.standard_normal(lm.info.hidden_dim) * 0.3).astype(np.float32)]
           for _ in range(8)]
steps = [32 + 8 * (i % 4) for i in range(8)]

PHASE[0] = "warmup"
t0 = time.monotonic()
wh = [engine.submit(AudioLM(reader, lm=lm), prompts[i % len(prompts)],
                    seed=900 + i, max_steps=2 + (i % 2))
      for i in range(8)]
engine.drain()
for h in wh:
    h.wait(timeout=0)
print(f"warmup: {time.monotonic()-t0:.1f}s, "
      f"{sum(1 for p, _, _ in COMPILES if p == 'warmup')} compiles",
      flush=True)

PHASE[0] = "timed"
t0 = time.monotonic()
handles = []
for i in range(8):
    handles.append(engine.submit(AudioLM(reader, lm=lm), prompts[i],
                                 seed=i, max_steps=steps[i]))
engine.drain()
wall = time.monotonic() - t0
results = [h.wait(timeout=0) for h in handles]
timed = [(s, st) for p, s, st in COMPILES if p == "timed"]
print(f"timed: {wall:.1f}s, {len(timed)} compiles "
      f"({sum(s for s, _ in timed):.1f}s compile time on this host)",
      flush=True)
for s, st in timed:
    print(f"  {s:.3f}s  {' <- '.join(reversed(st))}", flush=True)

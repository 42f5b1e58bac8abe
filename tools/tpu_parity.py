#!/usr/bin/env python
"""Full-production-shape Mimi parity: real TPU vs the CPU reference path.

The CPU suite proves our CPU path matches HF transformers bit-for-bit at
kyutai/mimi's real dimensions (tests/test_mimi_fullsize.py). This tool
closes the remaining link: the SAME full-size GGUF + input run on the
attached TPU, compared against the CPU results —

  - encode: RVQ code frame-mismatch rate. Two modes: the default encode
    runs TPU f32 matmuls at the hardware's bf16 default — latent noise
    flips RVQ argmin near-ties on random-weight fixtures (measured 55%
    of frames touched, uniformly spread over quantizer levels, decode of
    those codes still corr 0.9999) — while --exact (CODEC_EXACT_ENCODE)
    pins the whole encode graph to f32 HIGHEST, restoring code-level
    parity with the CPU reference up to f32 reduction-order ties. Real
    lane-pad / bucketing bugs show as systematic divergence in BOTH
    modes;
  - decode: waveform corr + SI-SNR of the TPU decode of the CPU's codes
    vs the CPU decode (TPU f32 matmuls run at bf16 precision by default,
    so this bounds the product-surface numeric delta, not zero).

Usage: python tools/tpu_parity.py [--fixture-dir DIR] [--frames 208]
Spawns one CPU worker and one TPU worker subprocess, then compares.
Output: human summary + one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _build_fixture(fixture_dir: str, frames: int) -> None:
    """HF MimiModel at production defaults -> wire-schema GGUF + input pcm
    (same recipe as tests/test_mimi_fullsize.py, incl. codebook spreading
    so RVQ argmins aren't degenerate near-ties)."""
    import numpy as np
    import torch
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig()
    assert cfg.hidden_size == 512 and cfg.num_quantizers == 32
    model = MimiModel(cfg).eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("codebook.embed_sum"):
                buf.copy_(torch.randn(buf.shape, generator=g))

    from codec_tpu.convert import get_converter

    conv = get_converter("mimi")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg.to_dict())
    conv.convert_and_save(os.path.join(fixture_dir, "mimi_full.gguf"))

    rng = np.random.default_rng(0)
    n = frames * 1920 + 517          # non-frame-aligned -> ceil padding
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    np.save(os.path.join(fixture_dir, "pcm.npy"), pcm)


def _worker(platform: str, fixture_dir: str) -> None:
    import jax

    if platform == "cpu":
        # the axon sitecustomize forces jax_platforms at startup; this is
        # the documented way to actually run on host CPU (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import codec_tpu

    dev = jax.devices()[0].platform
    model = codec_tpu.load_model(os.path.join(fixture_dir, "mimi_full.gguf"))
    pcm = np.load(os.path.join(fixture_dir, "pcm.npy"))

    t0 = time.monotonic()
    codes = model.encode(pcm)                          # [T, Q]
    enc_s = time.monotonic() - t0
    np.save(os.path.join(fixture_dir, f"codes_{platform}.npy"), codes)

    # decode the CPU worker's codes when present (TPU runs second) so the
    # decode comparison is apples-to-apples; else own codes (CPU run)
    cpath = os.path.join(fixture_dir, "codes_cpu.npy")
    dec_in = np.load(cpath) if os.path.exists(cpath) else codes
    t0 = time.monotonic()
    dec = model.decode(dec_in)
    dec_s = time.monotonic() - t0
    np.save(os.path.join(fixture_dir, f"dec_{platform}.npy"), dec)
    print(json.dumps({"worker": platform, "device": dev,
                      "encode_s": round(enc_s, 1), "decode_s": round(dec_s, 1),
                      "codes_shape": list(codes.shape)}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir",
                    default=os.path.expanduser("~/.cache/codec_tpu/parity"))
    ap.add_argument("--frames", type=int, default=208)
    ap.add_argument("--worker", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--exact", action="store_true",
                    help="encode with CODEC_EXACT_ENCODE=1 (f32 HIGHEST "
                         "for the whole encode graph on TPU)")
    args = ap.parse_args()

    if args.exact:
        os.environ["CODEC_EXACT_ENCODE"] = "1"
    if args.worker:
        _worker(args.worker, args.fixture_dir)
        return 0

    os.makedirs(args.fixture_dir, exist_ok=True)
    if not os.path.exists(os.path.join(args.fixture_dir, "mimi_full.gguf")):
        print("building full-size fixture...", flush=True)
        _build_fixture(args.fixture_dir, args.frames)

    for plat in ("cpu", "tpu"):
        print(f"== {plat} worker ==", flush=True)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", plat,
               "--fixture-dir", args.fixture_dir]
        if args.exact:
            cmd.append("--exact")
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            print(f"{plat} worker failed rc={r.returncode}")
            return 1

    import numpy as np

    from tests.e2e.runner import si_snr_db

    cc = np.load(os.path.join(args.fixture_dir, "codes_cpu.npy"))
    ct = np.load(os.path.join(args.fixture_dir, "codes_tpu.npy"))
    dc = np.load(os.path.join(args.fixture_dir, "dec_cpu.npy")).reshape(-1)
    dt = np.load(os.path.join(args.fixture_dir, "dec_tpu.npy")).reshape(-1)

    mism_frames = int((cc != ct).any(axis=1).sum())
    frame_rate = mism_frames / cc.shape[0]
    n = min(dc.size, dt.size)
    g, w = dt[:n].astype(np.float64), dc[:n].astype(np.float64)
    corr = float(np.corrcoef(g, w)[0, 1])
    snr = si_snr_db(g, w)

    res = {"frames": int(cc.shape[0]), "exact_encode": bool(args.exact),
           "code_mismatch_frames": mism_frames,
           "code_mismatch_rate": round(frame_rate, 4),
           "decode_corr": round(corr, 6),
           "decode_si_snr_db": round(snr, 2)}
    # default encode runs the TPU bf16 matmul default: latent noise flips
    # RVQ near-ties on random-weight fixtures (measured 0.55 frame rate,
    # decode still corr 0.9999 / 38 dB SI-SNR) — only --exact claims
    # code-level parity
    ok = (frame_rate <= 0.02 if args.exact else True) and corr >= 0.98
    res["ok"] = ok
    print(json.dumps(res))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())

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
       [--arch mimi|dac|rda] [--exact]
Spawns one CPU worker and one TPU worker subprocess, then compares.
Output: human summary + one JSON line.

Archs beyond the original Mimi flow (VERDICT r4 #7):
  - dac: full-size descript/dac_24khz HF mirror — encode code parity +
    decode and decode_latent waveform corr/SI-SNR;
  - rda: one full greedy AR TTS generation (CSM-1B-shaped
    residual_depth_ar on a seeded Llama backbone, f32 HIGHEST) — the
    honest metric is the matching code-frame PREFIX (one argmax
    near-tie flip diverges the whole AR suffix).
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


def _build_fixture_dac(fixture_dir: str, frames: int) -> None:
    """HF DacModel at descript/dac_24khz production dims -> wire-schema
    GGUF + pcm + latent fixtures (same recipe as tests/test_dac_fullsize)."""
    import numpy as np
    import torch
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    cfg = DacConfig(sampling_rate=24000,
                    downsampling_ratios=[2, 4, 5, 8],
                    upsampling_ratios=[8, 5, 4, 2])
    model = DacModel(cfg).eval()

    from codec_tpu.convert import get_converter

    conv = get_converter("dac")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg.to_dict())
    conv.convert_and_save(os.path.join(fixture_dir, "dac_full.gguf"))

    rng = np.random.default_rng(0)
    n = frames * 320 + 211               # non-frame-aligned
    np.save(os.path.join(fixture_dir, "dac_pcm.npy"),
            (rng.standard_normal(n) * 0.1).astype(np.float32))
    np.save(os.path.join(fixture_dir, "dac_latent.npy"),
            (rng.standard_normal((frames, cfg.hidden_size)) * 0.3)
            .astype(np.float32))


def _worker_dac(platform: str, fixture_dir: str) -> None:
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import codec_tpu

    model = codec_tpu.load_model(os.path.join(fixture_dir, "dac_full.gguf"))
    pcm = np.load(os.path.join(fixture_dir, "dac_pcm.npy"))
    lat = np.load(os.path.join(fixture_dir, "dac_latent.npy"))

    codes = model.encode(pcm)
    np.save(os.path.join(fixture_dir, f"dac_codes_{platform}.npy"), codes)
    cpath = os.path.join(fixture_dir, "dac_codes_cpu.npy")
    dec_in = np.load(cpath) if os.path.exists(cpath) else codes
    np.save(os.path.join(fixture_dir, f"dac_dec_{platform}.npy"),
            model.decode(dec_in))
    np.save(os.path.join(fixture_dir, f"dac_declat_{platform}.npy"),
            model.decode_latent(lat))
    print(json.dumps({"worker": platform,
                      "codes_shape": list(codes.shape)}), flush=True)


def _worker_rda(platform: str, fixture_dir: str) -> None:
    """One full greedy AR TTS generation (CSM-1B-shaped RDA) — 32 frames
    from a fixed prompt, f32 backbone at HIGHEST matmul precision so the
    TPU run is comparable to the CPU reference run."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import jax.numpy as jnp

    import codec_tpu  # noqa: F401
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from codec_tpu.models.bench_lm_init import write_rda_gguf

    sys.path.insert(0, HERE)
    from cont_batch_bench import make_backbone

    os.makedirs(fixture_dir, exist_ok=True)
    lm_path = os.path.join(fixture_dir, "rda_csm1b.gguf")
    if not os.path.exists(lm_path):
        write_rda_gguf(lm_path)
    reader = GGUFReader(lm_path)
    lm = create_lm(reader)
    bb = make_backbone(dtype=jnp.float32)   # seeded jax.random: the bits
    audio_lm = AudioLM(reader, lm=lm)       # are platform-independent
    rng = np.random.default_rng(7)
    prompt = [(rng.standard_normal(lm.info.hidden_dim) * 0.3)
              .astype(np.float32)]
    res = run_codebook_ar(audio_lm, bb, prompt, max_steps=32, decode=False)
    np.save(os.path.join(fixture_dir, f"rda_codes_{platform}.npy"), res.codes)
    print(json.dumps({"worker": platform, "n_steps": res.n_steps,
                      "codes_shape": list(res.codes.shape)}), flush=True)


def _compare_dac(fixture_dir: str) -> dict:
    import numpy as np

    from tests.e2e.runner import si_snr_db

    cc = np.load(os.path.join(fixture_dir, "dac_codes_cpu.npy"))
    ct = np.load(os.path.join(fixture_dir, "dac_codes_tpu.npy"))
    mism = int((cc != ct).any(axis=1).sum())
    res = {"frames": int(cc.shape[0]),
           "code_mismatch_frames": mism,
           "code_mismatch_rate": round(mism / cc.shape[0], 4)}
    for tag in ("dec", "declat"):
        dc = np.load(os.path.join(fixture_dir, f"dac_{tag}_cpu.npy")).ravel()
        dt = np.load(os.path.join(fixture_dir, f"dac_{tag}_tpu.npy")).ravel()
        n = min(dc.size, dt.size)
        g, w = dt[:n].astype(np.float64), dc[:n].astype(np.float64)
        res[f"{tag}_corr"] = round(float(np.corrcoef(g, w)[0, 1]), 6)
        res[f"{tag}_si_snr_db"] = round(si_snr_db(g, w), 2)
    exact = os.environ.get("CODEC_EXACT_ENCODE") == "1"
    res["exact_encode"] = exact
    # DAC's 8-d cosine codebook search near-ties far more often than
    # Mimi's 256-d euclid search (tests/test_dac_fullsize.py) — the exact
    # bar is correspondingly looser
    res["ok"] = ((res["code_mismatch_rate"] <= 0.05 if exact else True)
                 and res["dec_corr"] >= 0.98 and res["declat_corr"] >= 0.98)
    return res


def _compare_rda(fixture_dir: str) -> dict:
    import numpy as np

    cc = np.load(os.path.join(fixture_dir, "rda_codes_cpu.npy"))
    ct = np.load(os.path.join(fixture_dir, "rda_codes_tpu.npy"))
    n = min(cc.shape[0], ct.shape[0])
    div = np.where((cc[:n] != ct[:n]).any(axis=1))[0]
    first = int(div[0]) if len(div) else -1
    res = {"steps_cpu": int(cc.shape[0]), "steps_tpu": int(ct.shape[0]),
           "first_divergent_frame": first,
           "frames_matching_prefix": n if first < 0 else first}
    # greedy + HIGHEST: a single argmax near-tie flip diverges the whole
    # AR suffix, so the honest metric is the matching PREFIX length
    res["ok"] = cc.shape == ct.shape and (first < 0 or first >= n // 2)
    return res


ARCHS = {
    "mimi": ("mimi_full.gguf", _build_fixture, _worker),
    "dac": ("dac_full.gguf", _build_fixture_dac, _worker_dac),
    "rda": ("rda_csm1b.gguf", None, _worker_rda),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir",
                    default=os.path.expanduser("~/.cache/codec_tpu/parity"))
    ap.add_argument("--frames", type=int, default=208)
    ap.add_argument("--arch", choices=sorted(ARCHS), default="mimi")
    ap.add_argument("--worker", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--exact", action="store_true",
                    help="encode with CODEC_EXACT_ENCODE=1 (f32 HIGHEST "
                         "for the whole encode graph on TPU)")
    ap.add_argument("--reuse-cpu", action="store_true",
                    help="skip the CPU worker when its outputs already "
                         "exist in --fixture-dir (budget-bound callers "
                         "like bench.py; the caller owns cache coherence "
                         "— results must come from the same --exact mode)")
    args = ap.parse_args()

    sentinel, build, worker = ARCHS[args.arch]
    if args.exact:
        os.environ["CODEC_EXACT_ENCODE"] = "1"
    if args.worker:
        worker(args.worker, args.fixture_dir)
        return 0

    os.makedirs(args.fixture_dir, exist_ok=True)
    if build is not None and not os.path.exists(
            os.path.join(args.fixture_dir, sentinel)):
        print("building full-size fixture...", flush=True)
        build(args.fixture_dir, args.frames)

    cpu_done = {"mimi": ("codes_cpu.npy", "dec_cpu.npy"),
                "dac": ("dac_codes_cpu.npy", "dac_dec_cpu.npy",
                        "dac_declat_cpu.npy"),
                "rda": ("rda_codes_cpu.npy",)}[args.arch]
    plats = ("cpu", "tpu")
    if args.reuse_cpu and all(
            os.path.exists(os.path.join(args.fixture_dir, f))
            for f in cpu_done):
        print("== cpu worker: cached results reused ==", flush=True)
        plats = ("tpu",)

    for plat in plats:
        print(f"== {plat} worker ==", flush=True)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", plat,
               "--fixture-dir", args.fixture_dir, "--arch", args.arch]
        if args.exact:
            cmd.append("--exact")
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            print(f"{plat} worker failed rc={r.returncode}")
            return 1

    if args.arch != "mimi":
        res = {"dac": _compare_dac, "rda": _compare_rda}[args.arch](
            args.fixture_dir)
        res["arch"] = args.arch
        print(json.dumps(res))
        return 0 if res["ok"] else 2

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

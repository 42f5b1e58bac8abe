"""codec-cli: encode / decode / e2e / decode-latent over a codec GGUF.

Mirrors the reference CLI surface (reference: examples/codec-cli.cpp —
subcommands e2e|encode|decode|decode-latent with --model/--in/--codes/
--out/--nq). Codes are .npy int32 [T, n_q]; latents .npy float32
[T, latent_dim]; audio is WAV.

Usage:
  python -m codec_tpu.cli.codec_cli decode --model mimi.gguf --codes c.npy --out out.wav
  python -m codec_tpu.cli.codec_cli encode --model mimi.gguf --in in.wav --codes c.npy
  python -m codec_tpu.cli.codec_cli e2e    --model mimi.gguf --in in.wav --out out.wav
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="codec-cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--model", required=True, help="codec GGUF path")
        p.add_argument("--nq", type=int, default=0, help="codebooks to use (0=all)")
        p.add_argument("--dtype", default="auto",
                       choices=["float32", "bfloat16", "float16", "auto"],
                       help="compute dtype (float32 = parity, bfloat16 = "
                            "fast, auto = follow checkpoint)")
        p.add_argument("--exact-encode", action="store_true",
                       dest="exact_encode",
                       help="force f32 HIGHEST matmul precision for the "
                            "encode graph (TPU code emission bit-exact "
                            "vs the CPU reference). Default: already on "
                            "for f32 compute, off for 16-bit; "
                            "CODEC_EXACT_ENCODE=0 forces off")

    p = sub.add_parser("encode")
    common(p)
    p.add_argument("--in", dest="infile", required=True, help="input WAV")
    p.add_argument("--codes", required=True, help="output codes .npy")

    p = sub.add_parser("decode")
    common(p)
    p.add_argument("--codes", required=True, help="input codes .npy [T, n_q]")
    p.add_argument("--out", required=True, help="output WAV")

    p = sub.add_parser("e2e")
    common(p)
    p.add_argument("--in", dest="infile", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("decode-latent")
    common(p)
    p.add_argument("--latent", required=True, help="input latent .npy [T, latent_dim]")
    p.add_argument("--out", required=True)

    p = sub.add_parser("info")
    p.add_argument("--model", required=True)
    return ap


def _load(args):
    import codec_tpu

    return codec_tpu.load_model(
        args.model, compute_dtype=args.dtype,
        exact_encode=getattr(args, "exact_encode", False) or None)


def _read_pcm(model, path):
    """Encode-side input: validate against encode_sample_rate where it
    differs from the output rate (e.g. Chatterbox-S3T: 16 kHz in, 24 kHz
    token-rate context; reference keeps both on codec_model)."""
    from ..io.wav import read_wav, to_mono

    # mono PCM16 stays int16: encode() uploads half the bytes and
    # divides by 32768 in-graph (bit-identical to host conversion)
    x, sr = read_wav(path, keep_i16=True)
    want = getattr(model, "encode_sample_rate", 0) or model.sample_rate
    if sr != want:
        raise SystemExit(f"input sample rate {sr} != model {want}")
    if x.dtype == np.int16:
        if x.shape[1] == 1:
            return x[:, 0]
        x = x.astype(np.float32) / 32768.0
    return to_mono(x)


def main(argv=None) -> int:
    try:
        return _run(build_parser().parse_args(argv))
    except BrokenPipeError:
        return 0                      # e.g. `... | head` closed stdout
    except Exception as e:  # clean one-line errors (reference CLI behavior)
        from ..runtime.model import CodecError

        if isinstance(e, (CodecError, ValueError, FileNotFoundError)):
            print(f"error: {e}", file=sys.stderr)
            return 1
        raise


def _run(args) -> int:

    if args.cmd == "info":
        from ..io.gguf import GGUFReader

        r = GGUFReader(args.model)
        print(f"architecture: {r.architecture}")
        print(f"name:         {r.get_str('general.name')}")
        print(f"tensors:      {len(r.tensors)}")
        for k in sorted(r.kv):
            if k.startswith("codec."):
                print(f"  {k} = {r.kv[k]}")
        return 0

    # One-shot process: compile the fast-plan tier only — a background
    # best-plan upgrade could never be used before exit (runtime/model.py
    # tiered jit). Explicit CODEC_TIERED_JIT settings win.
    import os

    os.environ.setdefault("CODEC_TIERED_JIT", "fast")
    model = _load(args)
    from ..io.wav import write_wav

    if args.cmd == "encode":
        pcm = _read_pcm(model, args.infile)
        codes = model.encode(pcm, n_q=args.nq)
        np.save(args.codes, codes.astype(np.int32))
        print(f"wrote {args.codes}: {codes.shape} codes")
    elif args.cmd == "decode":
        codes = np.load(args.codes)
        # i16: PCM is converted to 16-bit in-graph (write_wav-exact), so
        # the device→host transfer is half the bytes of f32
        pcm = model.decode(codes, n_q=args.nq, pcm_format="i16")
        write_wav(args.out, pcm, model.sample_rate)
        print(f"wrote {args.out}: {pcm.shape[0]} samples @ {model.sample_rate} Hz")
    elif args.cmd == "e2e":
        pcm = _read_pcm(model, args.infile)
        codes = model.encode(pcm, n_q=args.nq)
        out = model.decode(codes, n_q=args.nq, pcm_format="i16")
        write_wav(args.out, out, model.sample_rate)
        print(f"wrote {args.out}: {out.shape[0]} samples ({codes.shape} codes)")
    elif args.cmd == "decode-latent":
        z = np.load(args.latent)
        pcm = model.decode_latent(z, pcm_format="i16")
        write_wav(args.out, pcm, model.sample_rate)
        print(f"wrote {args.out}: {pcm.shape[0]} samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())

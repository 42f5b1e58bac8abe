"""codec-batch-decode: multi-sequence decode, truly batched.

Reference: examples/codec-batch-decode.cpp + src/batch/batch.cpp — the
reference validates a packed codec_batch then decodes sequences SERIALLY;
here sequences are padded to a common bucket and decoded as one batched
jitted program (optionally sharded over a device mesh with --dp).

Usage:
  python -m codec_tpu.cli.batch_decode --model mimi.gguf \
      --codes a.npy b.npy c.npy --out-dir outs/ [--dp N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="codec-batch-decode")
    ap.add_argument("--model", required=True)
    ap.add_argument("--codes", nargs="+", required=True, help=".npy code files [T, n_q]")
    ap.add_argument("--latent", action="store_true", help="inputs are latents, not codes")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--nq", type=int, default=0)
    ap.add_argument("--dp", type=int, default=0,
                    help="shard batch over this many devices (0 = single device)")
    ap.add_argument("--sp", type=int, default=0,
                    help="sequence parallelism: shard each sequence's TIME "
                         "dim over this many devices (single long streams; "
                         "mutually exclusive with --dp)")
    ap.add_argument("--pipeline", action="store_true",
                    help="decode sequences as pipelined per-sequence graphs "
                         "with one batched readback (decode_many) instead of "
                         "padding to one batched graph; automatic when "
                         "sequence lengths fall in different buckets")
    ap.add_argument("--dtype", default="auto",
                    choices=["float32", "bfloat16", "float16", "auto"])
    args = ap.parse_args(argv)

    import os

    # one-shot process: compile only the fast-plan tier — nothing would
    # ever use a background best-plan upgrade (same as codec_cli; an
    # explicit CODEC_TIERED_JIT setting wins)
    os.environ.setdefault("CODEC_TIERED_JIT", "fast")

    import codec_tpu
    from ..io.wav import write_wav

    dtype = args.dtype
    if args.dp > 1 and args.sp > 1:
        raise SystemExit("--dp and --sp are mutually exclusive")
    mesh = None
    if args.dp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.dp)
    model = codec_tpu.load_model(args.model, compute_dtype=dtype, mesh=mesh)
    if args.sp > 1:
        from ..parallel.mesh import make_mesh

        model.set_mesh(make_mesh(args.sp, axis="sp"), axis="sp", dim=1)
        mesh = model.mesh

    seqs = [np.load(p) for p in args.codes]
    lens = [s.shape[0] for s in seqs]
    t_max = max(lens)
    n_q = args.nq if args.nq > 0 else model.n_q

    # Heterogeneous lengths (different jit buckets) pad-to-max in the
    # batched graph, wasting compute on the short sequences — and for
    # NON-causal models changing the output (symmetric/reflect padding
    # sees the pad frames). The pipelined path decodes each sequence at
    # its own bucket — matching the reference's serial per-sequence
    # semantics — dispatches all asynchronously, and fetches every output
    # in one batched transfer.
    from ..runtime.bucketing import bucket_length
    hetero = len({bucket_length(t) if model.causal_time else t
                  for t in lens}) > 1
    if (args.pipeline or hetero) and not args.latent and mesh is None:
        outs = model.decode_many(seqs, n_q=args.nq, pcm_format="i16")
        pcm = None
    else:
        if args.latent:
            batch = np.zeros((len(seqs), t_max, seqs[0].shape[1]), np.float32)
        else:
            batch = np.zeros((len(seqs), t_max, n_q), np.int32)
        for i, s in enumerate(seqs):
            batch[i, : s.shape[0]] = s[:, :batch.shape[2]]
        pcm = (model.decode_latent(batch, pcm_format="i16") if args.latent
               else model.decode(batch, n_q=args.nq, pcm_format="i16"))
        if mesh is not None:
            mode = f"sp={args.sp}" if args.sp > 1 else f"dp={args.dp}"
            print(f"{mode}: device output sharding {model.last_out_sharding}")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, (path, t) in enumerate(zip(args.codes, lens)):
        y = outs[i] if pcm is None else pcm[i, : t * model.hop_size]
        out = out_dir / (Path(path).stem + ".wav")
        write_wav(out, y, model.sample_rate)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

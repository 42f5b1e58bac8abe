#!/usr/bin/env python3
"""Convert a codec checkpoint (HF snapshot dir or state-dict file) to GGUF.

Reference entry point: scripts/convert-to-gguf.py (model-type autodetect +
converter registry dispatch).

Usage:
  # auto-detected from the checkpoint's config.json `architectures` /
  # `model_type` (reference convert-to-gguf.py:29-64):
  python scripts/convert_to_gguf.py --checkpoint /path/to/ckpt --out m.gguf

  # explicit type + optional bundled LM source:
  python scripts/convert_to_gguf.py --type mimi --checkpoint ... \
      --out mimi.gguf [--quant F16|F32|Q8_0|Q4_K_M|Q5_K_M] [--lm-source DIR]

Single-checkpoint bundles (sesame/csm-1b, kmhf/hf-moshiko) are detected
and split into codec + lm.* sections in one pass (convert/bundled.py).
LM-only checkpoints (MOSS-TTSD, Qwen3-TTS, ...) are detected as the
--lm-source of their paired codec; pass the codec checkpoint via
--checkpoint and the LM via --lm-source (no network here, so unlike the
reference we never auto-download the paired codec repo).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from codec_tpu.convert import get_converter, known_converters  # noqa: E402
from codec_tpu.convert.detect import detect_type  # noqa: E402


def _read_config(path: Path) -> dict:
    cfg_path = path / "config.json" if path.is_dir() else path
    return json.loads(cfg_path.read_text())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default=None, choices=known_converters(),
                    help="converter name; omit to auto-detect from the "
                         "checkpoint's config.json")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (config.json + model.safetensors "
                         "or sharded *.safetensors.index.json)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quant", default="F16",
                    choices=["F32", "F16", "Q8_0", "Q4_K_M", "Q5_K_M"])
    ap.add_argument("--lm-source", default=None,
                    help="TTS LM checkpoint dir to bundle as the lm.* "
                         "adaptor section (config.json + model.safetensors)")
    ap.add_argument("--quantize-codebook", action="store_true")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    try:
        mtype = args.type
        if mtype is None:
            cfg = _read_config(Path(args.checkpoint))
            mtype, role = detect_type(cfg)
            print(f"auto-detected: {mtype} ({role})", file=sys.stderr)
            if role == "lm" and not args.lm_source:
                # the checkpoint IS the LM; its codec ships separately
                print(f"error: {cfg.get('architectures')} is a TTS LM "
                      f"paired with the {mtype!r} codec — convert with\n"
                      f"  --type {mtype} --checkpoint <codec_ckpt> "
                      f"--lm-source {args.checkpoint}", file=sys.stderr)
                return 1

        conv = get_converter(mtype)(
            quantization=args.quant,
            quantize_codebook=args.quantize_codebook, verbose=args.verbose)
        conv.load_from_checkpoint(Path(args.checkpoint))
        if args.lm_source:
            from codec_tpu.convert.base import (_checkpoint_shards,
                                                _load_safetensors)

            lm_dir = Path(args.lm_source)
            lm_cfg = json.loads((lm_dir / "config.json").read_text())
            lm_sd = {}
            for f in _checkpoint_shards(lm_dir):
                lm_sd.update(_load_safetensors(f))
            conv.set_lm_source(lm_sd, lm_cfg)
        conv.convert_and_save(Path(args.out))
    except (FileNotFoundError, KeyError, ValueError,
            NotImplementedError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

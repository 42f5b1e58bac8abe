#!/usr/bin/env python3
"""Convert a codec checkpoint (HF snapshot dir or state-dict file) to GGUF.

Reference entry point: scripts/convert-to-gguf.py (model-type autodetect +
converter registry dispatch).

Usage:
  python scripts/convert_to_gguf.py --type mimi --checkpoint /path/to/ckpt \
      --out mimi.gguf [--quant F16|F32|Q8_0|Q4_K_M|Q5_K_M]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from codec_tpu.convert import get_converter, known_converters  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", required=True, choices=known_converters())
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (config.json + model.safetensors)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quant", default="F16",
                    choices=["F32", "F16", "Q8_0", "Q4_K_M", "Q5_K_M"])
    ap.add_argument("--lm-source", default=None,
                    help="TTS LM checkpoint dir to bundle as the lm.* "
                         "adaptor section (config.json + model.safetensors)")
    ap.add_argument("--quantize-codebook", action="store_true")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    conv = get_converter(args.type)(quantization=args.quant,
                                    quantize_codebook=args.quantize_codebook,
                                    verbose=args.verbose)
    try:
        conv.load_from_checkpoint(Path(args.checkpoint))
        if args.lm_source:
            import json
            from safetensors import safe_open

            lm_dir = Path(args.lm_source)
            lm_cfg = json.loads((lm_dir / "config.json").read_text())
            lm_sd = {}
            with safe_open(str(lm_dir / "model.safetensors"),
                           framework="np") as h:
                for key in h.keys():
                    lm_sd[key] = h.get_tensor(key)
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

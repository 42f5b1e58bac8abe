"""WavTokenizer checkpoint → codec GGUF (schema per reference
scripts/converters/wavtokenizer.py: prefix remap + name compression,
weight-norm materialization, LSTM weight passthrough)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter, shorten_name
from .dac import materialize_weight_norm
from .registry import register

_EXCLUDE_SUBSTR = ("discriminator", "disc", "loss")

_COMPRESS = (
    ("_orig_mod.", ""),
    (".residual_unit.", ".ru."),
    (".snake1d.", ".s1."),
    (".snake_beta", ".sb"),
    (".snake_gamma", ".sg"),
    (".kernel_size", ".ks"),
    (".upsample", ".up"),
    (".downsample", ".dn"),
    ("feature_extractor.", "feat."),
    (".convnext.", ".cnx."),
    ("backbone.", "bb."),
    (".final_layer_norm.", ".fln."),
)


def remap_key(key: str) -> Optional[str]:
    for prefix in ("module.", "generator.", "model."):
        if key.startswith(prefix):
            key = key[len(prefix):]
    if key.startswith("feature_extractor.encodec.encoder."):
        return "enc." + key[len("feature_extractor.encodec.encoder."):]
    if key.startswith("feature_extractor.encodec.quantizer."):
        return "vq." + key[len("feature_extractor.encodec.quantizer."):]
    if key.startswith("feature_extractor.encodec.decoder."):
        return "dec.feature_extractor." + key[len("feature_extractor.encodec.decoder."):]
    if key.startswith("feature_extractor."):
        return "dec.feature_extractor." + key[len("feature_extractor."):]
    if key.startswith("backbone."):
        return "dec.backbone." + key[len("backbone."):]
    if key.startswith("head."):
        return "dec.head." + key[len("head."):]
    return None


def compress_name(name: str) -> str:
    out = name
    for old, new in _COMPRESS:
        out = out.replace(old, new)
    return out


@register("wavtokenizer")
class WavTokenizerConverter(BaseConverter):
    architecture = "wavtokenizer_large"   # reference arch string (src/codec.cpp:96)

    def load_from_state_dict(self, state_dict, config) -> None:
        sd = {k: np.asarray(v) for k, v in state_dict.items()
              if not any(s in k.lower() for s in _EXCLUDE_SUBSTR)}
        if any(k.endswith(".weight_g") for k in sd):
            sd = materialize_weight_norm(sd)
        super().load_from_state_dict(sd, config)

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        writer.add_name("WavTokenizer")
        writer.add_uint32("codec.sample_rate", int(cfg.get("sample_rate", 24000)))
        writer.add_uint32("codec.hop_size", int(cfg.get("hop_size", 320)))
        writer.add_bool("codec.has_encoder", bool(cfg.get("has_encoder", True)))
        writer.add_bool("codec.has_decoder", bool(cfg.get("has_decoder", True)))

    def write_tensors(self, writer: GGUFWriter) -> None:
        used: set = set()
        for key in sorted(self.state_dict):
            mapped = remap_key(key)
            if mapped is None:
                continue
            arr = np.asarray(self.state_dict[key])
            self.add_tensor(writer, shorten_name(compress_name(mapped), used), arr)

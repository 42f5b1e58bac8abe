"""Soprano checkpoint → codec GGUF (schema per reference
scripts/converters/soprano.py: sop.decode.* names)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register

_CNX_MAP = {
    "dwconv.weight": "dw.w", "dwconv.bias": "dw.b",
    "norm.weight": "ln.w", "norm.bias": "ln.b",
    "pwconv1.weight": "pw1.w", "pwconv1.bias": "pw1.b",
    "pwconv2.weight": "pw2.w", "pwconv2.bias": "pw2.b",
    "gamma": "gamma",
}


def map_key(key: str) -> Optional[str]:
    flat = {
        "decoder.embed.weight": "sop.decode.embed.w",
        "decoder.embed.bias": "sop.decode.embed.b",
        "decoder.norm.weight": "sop.decode.norm.w",
        "decoder.norm.bias": "sop.decode.norm.b",
        "decoder.final_layer_norm.weight": "sop.decode.fln.w",
        "decoder.final_layer_norm.bias": "sop.decode.fln.b",
        "head.out.weight": "sop.decode.head.out.w",
        "head.out.bias": "sop.decode.head.out.b",
        "head.istft.window": "sop.decode.istft.window",
    }
    if key in flat:
        return flat[key]
    if key.startswith("decoder.convnext."):
        rest = key[len("decoder.convnext."):]
        layer, _, suffix = rest.partition(".")
        if suffix in _CNX_MAP:
            return f"sop.decode.cnx.{layer}.{_CNX_MAP[suffix]}"
    return None


@register("soprano")
class SopranoConverter(BaseConverter):
    architecture = "soprano"

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        writer.add_name("Soprano")
        writer.add_uint32("codec.sample_rate", int(cfg["sample_rate"]))
        writer.add_uint32("codec.hop_size", int(cfg["hop_size"]))
        writer.add_uint32("codec.n_fft", int(cfg["n_fft"]))
        writer.add_uint32("codec.win_length", int(cfg.get("win_length", cfg["n_fft"])))
        writer.add_uint32("codec.latent_dim", int(cfg["latent_dim"]))
        writer.add_bool("codec.has_encoder", False)
        writer.add_bool("codec.has_decoder", True)
        writer.add_uint32("soprano.decoder_dim", int(cfg["decoder_dim"]))
        writer.add_uint32("soprano.intermediate_dim", int(cfg["intermediate_dim"]))
        writer.add_uint32("soprano.num_layers", int(cfg["num_layers"]))
        writer.add_uint32("soprano.upscale", int(cfg["upscale"]))
        writer.add_uint32("soprano.dw_kernel", int(cfg["dw_kernel"]))

    def write_tensors(self, writer: GGUFWriter) -> None:
        for key in sorted(self.state_dict):
            out = map_key(key)
            if out is None:
                continue
            self.add_tensor(writer, out, np.asarray(self.state_dict[key]))

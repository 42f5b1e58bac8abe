"""DAC HF/descript checkpoint → codec GGUF (schema per reference
scripts/converters/dac.py: `enc.block.*` / `dec.model.*` / `vq.q*` names;
weight-norm materialization for descript checkpoints)."""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter, shorten_name
from .registry import register


def _map_hf_key(key: str) -> Optional[str]:
    """HF transformers DacModel names → runtime schema."""
    if key.startswith("encoder.conv1."):
        return "enc.block.0." + key[len("encoder.conv1."):]
    m = re.match(r"^encoder\.block\.(\d+)\.(.+)$", key)
    if m:
        return f"enc.block.{int(m.group(1)) + 1}.block.{m.group(2)}"
    if key.startswith("encoder.snake1."):
        return "enc.block.5." + key[len("encoder.snake1."):]
    if key.startswith("encoder.conv2."):
        return "enc.block.6." + key[len("encoder.conv2."):]
    if key.startswith("decoder.conv1."):
        return "dec.model.0." + key[len("decoder.conv1."):]
    m = re.match(r"^decoder\.block\.(\d+)\.(.+)$", key)
    if m:
        return f"dec.model.{int(m.group(1)) + 1}.block.{m.group(2)}"
    if key.startswith("decoder.snake1."):
        return "dec.model.5." + key[len("decoder.snake1."):]
    if key.startswith("decoder.conv2."):
        return "dec.model.6." + key[len("decoder.conv2."):]
    if key.startswith("quantizer.quantizers."):
        return "vq.q" + key[len("quantizer.quantizers."):]
    return None


def materialize_weight_norm(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """weight_g/weight_v pairs (descript checkpoints) → materialized weights."""
    out = {}
    keys = set(state_dict)
    for k, v in state_dict.items():
        if k.endswith((".weight_g", ".weight_v")):
            continue
        out[k] = np.asarray(v)
    for k in keys:
        if not k.endswith(".weight_g"):
            continue
        base = k[: -len(".weight_g")]
        g = np.asarray(state_dict[k], np.float32)
        v = np.asarray(state_dict[base + ".weight_v"], np.float32)
        axes = tuple(range(1, v.ndim))
        norm = np.maximum(np.linalg.norm(v, axis=axes, keepdims=True), 1e-12)
        out[base + ".weight"] = v * (g / norm)
    return out


@register("dac")
class DacConverter(BaseConverter):
    architecture = "dac"

    def load_from_state_dict(self, state_dict, config) -> None:
        sd = {k: np.asarray(v) for k, v in state_dict.items()}
        if any(k.endswith(".weight_g") for k in sd):
            sd = materialize_weight_norm(sd)
        super().load_from_state_dict(sd, config)

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        writer.add_name(str(cfg.get("model_name", "DAC")))
        ratios = cfg.get("downsampling_ratios") or [2, 4, 8, 8]
        hop = int(cfg.get("hop_length", int(np.prod(ratios))))
        writer.add_uint32("codec.sample_rate", int(cfg.get("sampling_rate", cfg.get("sample_rate", 24000))))
        writer.add_uint32("codec.hop_size", hop)
        writer.add_uint32("codec.n_q", int(cfg.get("n_codebooks", cfg.get("n_q", 9))))
        writer.add_uint32("codec.codebook_size", int(cfg.get("codebook_size", 1024)))
        writer.add_uint32("codec.latent_dim", int(cfg.get("hidden_size", cfg.get("latent_dim", 1024))))
        writer.add_uint32("codec.codebook_dim", int(cfg.get("codebook_dim", 8)))
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)

    def write_tensors(self, writer: GGUFWriter) -> None:
        used: set = set()
        for key in sorted(self.state_dict):
            mapped = _map_hf_key(key)
            if mapped is None:
                continue
            self.add_tensor(writer, shorten_name(mapped, used), self.state_dict[key])

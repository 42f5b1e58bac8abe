"""Converter base: state_dict + config → GGUF (schema per reference
scripts/converters/base.py; quantization policy hooks per model)."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..io.gguf import GGUFWriter, QK8_0, QK_K

MAX_TENSOR_NAME = 63


def _checkpoint_shards(d: Path) -> list:
    """Safetensors files of a checkpoint dir: a `*.safetensors.index.json`
    weight map when sharded (CSM ships `transformers-NNNNN-of-NNNNN`
    shards), else the single model.safetensors."""
    for idx in sorted(d.glob("*.safetensors.index.json")):
        wm = json.loads(idx.read_text()).get("weight_map") or {}
        files = sorted({d / fn for fn in wm.values()})
        if files:
            return files
    single = d / "model.safetensors"
    if single.exists():
        return [single]
    rest = sorted(d.glob("*.safetensors"))
    if rest:
        return rest
    raise FileNotFoundError(f"no *.safetensors in {d}")


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Load one safetensors file as float32/int numpy; bf16 tensors (which
    numpy lacks) go through torch."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    bf16_keys = []
    with safe_open(str(path), framework="np") as h:
        for key in h.keys():
            try:
                out[key] = h.get_tensor(key)
            except (TypeError, ValueError):
                bf16_keys.append(key)
    if bf16_keys:
        with safe_open(str(path), framework="pt") as h:
            for key in bf16_keys:
                out[key] = h.get_tensor(key).float().numpy()
    return out


def shorten_name(name: str, used: set) -> str:
    """Truncate >63-char tensor names with a sha1 tag (GGUF name limit)."""
    if len(name) <= MAX_TENSOR_NAME and name not in used:
        used.add(name)
        return name
    digest = hashlib.sha1(name.encode()).hexdigest()[:10]
    short = f"{name[:MAX_TENSOR_NAME - 1 - len(digest)]}.{digest}"
    i = 1
    while short in used:
        suffix = f".{digest}{i}"
        short = f"{name[:MAX_TENSOR_NAME - len(suffix)]}{suffix}"
        i += 1
    used.add(short)
    return short


class BaseConverter:
    """Subclasses define `architecture`, `map_name`, `transform`, and
    `write_metadata`; quantization eligibility via `should_quantize`."""

    architecture = ""

    def __init__(self, quantization: str = "F16", quantize_codebook: bool = False,
                 verbose: bool = False):
        self.quantization = quantization
        self.quantize_codebook = quantize_codebook
        self.verbose = verbose
        self.state_dict: Optional[Dict[str, np.ndarray]] = None
        self.config: Optional[Dict[str, Any]] = None
        self.lm_source_sd: Optional[Dict[str, np.ndarray]] = None
        self.lm_source_cfg: Optional[Dict[str, Any]] = None

    def set_lm_source(self, state_dict, config) -> None:
        """Bundle an LM-adaptor section into the same GGUF (reference:
        codec converters call lm_adaptor.dump_lm_into when --lm-source is
        given)."""
        self.lm_source_sd = {k: np.asarray(v) for k, v in state_dict.items()}
        self.lm_source_cfg = dict(config)

    # -- loading -----------------------------------------------------------
    def load_from_state_dict(self, state_dict: Dict[str, Any], config: Dict[str, Any]) -> None:
        self.state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
        self.config = dict(config)

    def load_from_checkpoint(self, checkpoint_dir: Path) -> None:
        checkpoint_dir = Path(checkpoint_dir)
        cfg = json.loads((checkpoint_dir / "config.json").read_text())
        sd = {}
        for f in _checkpoint_shards(checkpoint_dir):
            sd.update(_load_safetensors(f))
        self.load_from_state_dict(sd, cfg)

    # -- policy hooks ------------------------------------------------------
    def should_quantize(self, name: str, arr: np.ndarray) -> bool:
        if self.quantization not in ("Q4_K_M", "Q5_K_M", "Q8_0"):
            return False
        if arr.ndim < 2 or not name.endswith((".w", ".weight")):
            return False
        if ".codebook." in name or ".cb." in name:
            return self.quantize_codebook
        block = QK_K if self.quantization in ("Q4_K_M", "Q5_K_M") else QK8_0
        return arr.shape[-1] % block == 0

    def storage_type(self, name: str, arr: np.ndarray) -> str:
        if arr.dtype == np.int32:
            return "I32"
        if self.should_quantize(name, arr):
            return self.quantization
        if self.quantization == "F32":
            return "F32"
        # F16 default, but keep norm/scale/bias params full precision
        if name.endswith(".b") or "ln." in name or ".scale" in name or "norm" in name:
            return "F32"
        return "F16"

    def add_tensor(self, writer: GGUFWriter, name: str, arr: np.ndarray) -> None:
        arr = np.asarray(arr)
        if arr.dtype not in (np.float32, np.int32):
            arr = arr.astype(np.float32)
        st = self.storage_type(name, arr)
        writer.add_tensor(name, arr, st)
        if self.verbose:
            print(f"  {name:50s} {str(arr.shape):20s} {st}")

    # -- subclass interface ------------------------------------------------
    def write_metadata(self, writer: GGUFWriter) -> None:
        raise NotImplementedError

    def write_tensors(self, writer: GGUFWriter) -> None:
        raise NotImplementedError

    def convert_and_save(self, output_path: Path) -> None:
        if self.state_dict is None:
            raise RuntimeError("no checkpoint loaded")
        writer = GGUFWriter(output_path, self.architecture)
        self.write_metadata(writer)
        self.write_tensors(writer)
        if self.lm_source_sd is not None:
            from .lm_adaptor import dump_lm_into

            dump_lm_into(writer, self.lm_source_sd, self.lm_source_cfg)
        writer.write()
        if self.verbose:
            print(f"wrote {output_path}")

"""codec_tpu — TPU-native neural audio codec inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of codec.cpp
(neural-audio-codec GGUF inference: encode PCM→RVQ codes, decode
codes/latents→PCM, plus the codec_lm adaptor layer for audio-LM TTS).

Public API mirrors the reference C API surface (include/codec.h):

    model = codec_tpu.load_model("mimi.gguf")
    codes = model.encode(pcm)          # [T, n_q] int32
    pcm   = model.decode(codes)        # [T*hop] float32
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import jax
import jax.numpy as jnp

# Honor JAX_PLATFORMS=cpu even under the axon sitecustomize, which calls
# axon.register() at interpreter startup and force-sets
# jax_platforms="axon,cpu" regardless of the env var. Without this, every
# "run on CPU" subprocess (tests/e2e runner legs, tools) silently lands
# on the remote TPU. Safe here: no backend has initialized yet at import.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover
        pass

# Persistent XLA compile cache: with weights passed as jit arguments
# (runtime/model.py), compiled graphs are weight-independent, so every
# process loading any checkpoint of a known arch reuses prior compiles.
# Override the location with CODEC_JAX_CACHE; set it to "0" to disable.
_cache = os.environ.get("CODEC_JAX_CACHE",
                        os.path.expanduser("~/.cache/codec_tpu/jax"))
if _cache and _cache != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass

from .io.gguf import GGUFReader
from .runtime.model import CodecModel, CodecError
from .models.registry import get_model_class, known_archs

__version__ = "0.1.0"


def load_model(path: Union[str, Path], compute_dtype=jnp.float32,
               mesh=None, mesh_axis: str = "dp",
               exact_encode: bool = None) -> CodecModel:
    """Load a codec GGUF → arch-dispatched CodecModel
    (reference: codec_model_load_from_file, src/codec.cpp:303-449).

    compute_dtype: jnp dtype or "float32" | "bfloat16" | "float16" | "auto"
    ("auto" = bfloat16 when the checkpoint has 16-bit weights, else f32).
    16-bit modes keep F16/BF16 wire tensors native end-to-end: half the
    host RAM, transfer bytes, and device HBM of the f32 path.
    mesh: optional jax.sharding.Mesh — weights are replicated onto it and
    encode/decode batches are sharded over `mesh_axis` (data parallelism
    over ICI; the reference's codec_batch loops serially on one device).
    exact_encode: pin the whole encode graph to f32 HIGHEST matmul
    precision so TPU code emission matches the CPU reference bit-for-bit
    (tools/tpu_parity.py: 0/209 frames diverge, vs 55% at the TPU bf16
    matmul default). Default: ON for f32 compute (f32 means parity; the
    cost is 1.43x the encode wall, tools/encode_micro.py), OFF for
    16-bit compute; CODEC_EXACT_ENCODE=1/0 forces either way. Decode is
    unaffected."""
    reader = GGUFReader(path)
    cls = get_model_class(reader.architecture)
    model = cls(reader, compute_dtype=compute_dtype)
    if exact_encode is not None:
        model.exact_encode = bool(exact_encode)
    if mesh is not None:
        model.set_mesh(mesh, axis=mesh_axis)
    return model


__all__ = ["load_model", "CodecModel", "CodecError", "GGUFReader", "known_archs"]

"""Mimi (kyutai/mimi) HF checkpoint → codec GGUF.

Implements the wire schema defined by the reference converter
(reference: scripts/converters/mimi.py — rename table, RVQ projection
squeeze, depthwise-ConvTranspose densification, codebook materialization
from embed_sum/cluster_usage) so output files load in both engines.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter, shorten_name
from .registry import register

_RENAMES = (
    ("decoder_transformer.layers.", "dtr.l"),
    ("encoder_transformer.layers.", "etr.l"),
    ("decoder.layers.", "dec.l"),
    ("encoder.layers.", "enc.l"),
    ("quantizer.acoustic_residual_vector_quantizer.", "q.a."),
    ("quantizer.semantic_residual_vector_quantizer.", "q.s."),
    ("input_layernorm.", "inln."),
    ("post_attention_layernorm.", "paln."),
    ("self_attn_layer_scale.", "sa_ls."),
    ("mlp_layer_scale.", "mlp_ls."),
    ("self_attn.", "attn."),
    ("input_proj.weight", "ip.w"),
    ("output_proj.weight", "op.w"),
    ("downsample.conv.weight", "dn.cv.w"),
    ("upsample.conv.weight", "up.cv.w"),
    (".weight", ".w"),
    (".bias", ".b"),
)

_RVQ_PROJ_KEYS = {
    "quantizer.semantic_residual_vector_quantizer.input_proj.weight",
    "quantizer.acoustic_residual_vector_quantizer.input_proj.weight",
    "quantizer.semantic_residual_vector_quantizer.output_proj.weight",
    "quantizer.acoustic_residual_vector_quantizer.output_proj.weight",
}
_UPSAMPLE_KEYS = {"upsample.conv.weight", "decoder.upsample.conv.weight"}


def map_name(key: str) -> str:
    out = key
    for old, new in _RENAMES:
        out = out.replace(old, new)
    return out


@register("mimi")
class MimiConverter(BaseConverter):
    architecture = "mimi"

    def transform(self, key: str, arr: np.ndarray) -> np.ndarray:
        if key in _RVQ_PROJ_KEYS:
            # 1x1 Conv1d (out, in, 1) → dense linear (out, in)
            if arr.ndim == 3 and arr.shape[2] == 1:
                arr = arr[:, :, 0]
            return arr
        if key in _UPSAMPLE_KEYS:
            # depthwise ConvTranspose1d (c, 1, k) → dense diagonal (c, c, k);
            # keeps the GGUF consumable by runtimes without grouped convtr.
            c, one, k = arr.shape
            assert one == 1, f"expected depthwise convtr weight, got {arr.shape}"
            dense = np.zeros((c, c, k), dtype=arr.dtype)
            idx = np.arange(c)
            dense[idx, idx, :] = arr[:, 0, :]
            return dense
        return arr

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        writer.add_name("Mimi")
        sr = int(cfg.get("sampling_rate", 24000))
        hop = int(round(sr / float(cfg.get("frame_rate", 12.5))))
        n_sem = int(cfg.get("num_semantic_quantizers", 1))
        n_q = int(cfg.get("num_quantizers", 32))
        writer.add_uint32("codec.sample_rate", sr)
        writer.add_uint32("codec.hop_size", hop)
        writer.add_uint32("codec.n_q", n_q)
        writer.add_uint32("codec.num_semantic_quantizers", n_sem)
        writer.add_uint32("codec.codebook_size", int(cfg.get("codebook_size", 2048)))
        writer.add_uint32("codec.codebook_dim", int(cfg.get("codebook_dim", 256)))
        writer.add_uint32("codec.latent_dim", int(cfg.get("hidden_size", 512)))
        writer.add_uint32("codec.num_hidden_layers", int(cfg.get("num_hidden_layers", 8)))
        writer.add_uint32("codec.num_attention_heads", int(cfg.get("num_attention_heads", 8)))
        writer.add_uint32("codec.head_dim", int(cfg.get("head_dim",
                          int(cfg.get("hidden_size", 512)) // int(cfg.get("num_attention_heads", 8)))))
        writer.add_uint32("codec.intermediate_size", int(cfg.get("intermediate_size", 2048)))
        writer.add_float32("codec.rope_theta", float(cfg.get("rope_theta", 10000.0)))
        if cfg.get("sliding_window"):
            writer.add_uint32("codec.attn_window", int(cfg["sliding_window"]))
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)

    def _materialized_codebooks(self) -> Dict[str, np.ndarray]:
        """embed_sum / clamp(cluster_usage) → `.codebook.embed` tensors."""
        out = {}
        for prefix, short in (
            ("quantizer.semantic_residual_vector_quantizer.layers.", "q.s.layers."),
            ("quantizer.acoustic_residual_vector_quantizer.layers.", "q.a.layers."),
        ):
            qi = 0
            while f"{prefix}{qi}.codebook.embed_sum" in self.state_dict:
                es = np.asarray(self.state_dict[f"{prefix}{qi}.codebook.embed_sum"], np.float32)
                cu = np.asarray(self.state_dict[f"{prefix}{qi}.codebook.cluster_usage"], np.float32)
                out[f"{short}{qi}.codebook.embed"] = es / np.maximum(cu[:, None], 1e-6)
                qi += 1
        return out

    def write_tensors(self, writer: GGUFWriter) -> None:
        used: set = set()
        skip_suffixes = (".codebook.embed_sum", ".codebook.cluster_usage", ".codebook.initialized")
        for key in sorted(self.state_dict):
            if key.endswith(skip_suffixes):
                continue
            arr = self.transform(key, self.state_dict[key])
            self.add_tensor(writer, shorten_name(map_name(key), used), arr)
        for name, embed in self._materialized_codebooks().items():
            # codebooks stay full precision unless explicitly requested
            st = "F32" if not self.quantize_codebook else self.quantization
            writer.add_tensor(shorten_name(name, used), embed.astype(np.float32), st)
        # per-hop OLA identity kernels consumed by the reference's streaming
        # batch decode; written for wire compatibility.
        sr = int(self.config.get("sampling_rate", 24000))
        hop = int(round(sr / float(self.config.get("frame_rate", 12.5))))
        kernel = np.full((hop, 1, 1), 1.0 / hop, dtype=np.float32)
        writer.add_tensor("mimi.decode.kernel", kernel, "F16")
        writer.add_tensor("mimi.encode.kernel", kernel, "F16")

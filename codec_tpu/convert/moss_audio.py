"""MOSS-Audio-Tokenizer checkpoint → codec GGUF (reference:
scripts/converters/moss_audio.py — patched-pretransform + causal-transformer
module sequences with fused QKV, cosine RVQ with normalized codebooks)."""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register
from .xcodec2 import apply_weight_norm


@register("moss_audio_tokenizer", "moss_audio")
class MossAudioConverter(BaseConverter):
    architecture = "moss_audio_tokenizer"

    def write_metadata(self, w: GGUFWriter) -> None:
        cfg = self.config
        qz = cfg["quantizer_kwargs"]
        w.add_name(cfg.get("name", "MOSS-Audio-Tokenizer"))
        sr = int(cfg["sample_rate"])
        downsample = int(cfg["downsample_rate"])
        w.add_uint32("codec.sample_rate", sr)
        w.add_uint32("codec.encode_sample_rate", sr)
        w.add_uint32("codec.hop_size", downsample)
        w.add_uint32("codec.n_q", int(qz["num_quantizers"]))
        w.add_uint32("codec.codebook_size", int(qz["codebook_size"]))
        w.add_uint32("codec.codebook_dim", int(qz["codebook_dim"]))
        w.add_uint32("codec.latent_dim", int(cfg["latent_dim"]))
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        w.add_uint32("moss.number_channels", int(cfg.get("number_channels", 1)))
        w.add_bool("moss.channel_interleave",
                   bool(cfg.get("channel_interleave", True)))
        w.add_uint32("moss.rvq_dim", int(qz["rvq_dim"]))
        w.add_string("moss.quantizer_type", str(cfg.get("quantizer_type", "rvq")))
        w.add_float32("moss.context_duration",
                      float(cfg.get("causal_transformer_context_duration", 10.0)))
        for side, key in (("enc", "encoder_kwargs"), ("dec", "decoder_kwargs")):
            self._module_kvs(w, side, cfg[key])

    def _module_kvs(self, w, side: str, modules: List[Dict[str, Any]]) -> None:
        cols: Dict[str, list] = {k: [] for k in (
            "module_types", "patch_sizes", "in_dims", "out_dims", "d_models",
            "n_heads", "n_layers", "ffn_dims", "context_durations",
            "max_periods", "layer_scales")}
        for mod in modules:
            if mod["module_type"] == "PatchedPretransform":
                cols["module_types"].append(0)
                cols["patch_sizes"].append(int(mod["patch_size"]))
                for k in ("in_dims", "out_dims", "d_models", "n_heads",
                          "n_layers", "ffn_dims"):
                    cols[k].append(0)
                for k in ("context_durations", "max_periods", "layer_scales"):
                    cols[k].append(0.0)
            else:
                cols["module_types"].append(1)
                cols["patch_sizes"].append(0)
                cols["in_dims"].append(int(mod["input_dimension"]))
                cols["out_dims"].append(int(mod["output_dimension"]))
                cols["d_models"].append(int(mod["d_model"]))
                cols["n_heads"].append(int(mod["num_heads"]))
                cols["n_layers"].append(int(mod["num_layers"]))
                cols["ffn_dims"].append(int(mod["dim_feedforward"]))
                cols["context_durations"].append(
                    float(mod.get("context_duration", 10.0)))
                cols["max_periods"].append(float(mod.get("max_period", 10000.0)))
                cols["layer_scales"].append(
                    float(mod.get("layer_scale", 0.0) or 0.0))
        base = f"moss.{side}"
        w.add_uint32(base + ".n_modules", len(modules))
        for k, v in cols.items():
            w.add_array(f"{base}.{k}", v)

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        cfg = self.config
        T = lambda n: np.asarray(sd[n])

        def first(*names):
            for n in names:
                if n in sd:
                    return n
            raise KeyError(f"none of {names} in state dict")

        def layer(src, dst):
            for ln in ("norm1", "norm2"):
                self.add_tensor(w, f"{dst}.{ln}.w", T(f"{src}.{ln}.weight"))
                self.add_tensor(w, f"{dst}.{ln}.b", T(f"{src}.{ln}.bias"))
            self.add_tensor(w, dst + ".attn.qkv.w", T(first(
                src + ".self_attn.in_proj.weight",
                src + ".self_attn.in_projs.0.weight")))
            self.add_tensor(w, dst + ".attn.out.w", T(first(
                src + ".self_attn.out_proj.weight",
                src + ".self_attn.out_projs.0.weight")))
            self.add_tensor(w, dst + ".ffn.fc1.w", T(first(
                src + ".ffn.0.weight", src + ".linear1.weight")))
            self.add_tensor(w, dst + ".ffn.fc2.w", T(first(
                src + ".ffn.2.weight", src + ".linear2.weight")))
            self.add_tensor(w, dst + ".ls1", T(src + ".layer_scale_1.scale"))
            self.add_tensor(w, dst + ".ls2", T(src + ".layer_scale_2.scale"))

        for side, key in (("enc", "encoder_kwargs"), ("dec", "decoder_kwargs")):
            src_root = "encoder" if side == "enc" else "decoder"
            for mi, mod in enumerate(cfg[key]):
                if mod["module_type"] != "Transformer":
                    continue
                base_in = f"{src_root}.{mi}"
                base_out = f"moss.{side}.b{mi}"
                for proj in ("input_proj", "output_proj"):
                    if f"{base_in}.{proj}.weight" in sd:
                        self.add_tensor(w, f"{base_out}.{proj}.w",
                                        T(f"{base_in}.{proj}.weight"))
                for li in range(int(mod["num_layers"])):
                    layer(f"{base_in}.transformer.layers.{li}",
                          f"{base_out}.l{li}")

        def wn(src, dst):
            mat = apply_weight_norm(T(src + ".weight_v"), T(src + ".weight_g"))
            self.add_tensor(w, dst + ".w", mat)
            if src + ".bias" in sd:
                self.add_tensor(w, dst + ".b", T(src + ".bias"))

        wn("quantizer.input_proj", "moss.q.input_proj")
        wn("quantizer.output_proj", "moss.q.output_proj")
        for qi in range(int(cfg["quantizer_kwargs"]["num_quantizers"])):
            base = f"quantizer.quantizers.{qi}"
            o = f"moss.q.{qi}"
            wn(base + ".in_proj", o + ".in_proj")
            wn(base + ".out_proj", o + ".out_proj")
            cb = T(base + ".codebook.weight").astype(np.float32)
            self.add_tensor(w, o + ".codebook", cb)
            self.add_tensor(w, o + ".codebook_norm",
                            cb / (np.linalg.norm(cb, axis=1, keepdims=True)
                                  + 1e-12))

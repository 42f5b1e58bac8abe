"""NeMo Nano Codec checkpoint → codec GGUF (schema per reference
scripts/converters/nemo_nano_codec.py: nemo.* names, weight-norm
materialization, grouped-convtr densify, FSQ constants + codebooks)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register


def map_key(key: str) -> Optional[str]:
    flat = {
        "audio_encoder.pre_conv.conv.weight": "nemo.enc.pre.w",
        "audio_encoder.pre_conv.conv.bias": "nemo.enc.pre.b",
        "audio_encoder.post_conv.conv.weight": "nemo.enc.post.w",
        "audio_encoder.post_conv.conv.bias": "nemo.enc.post.b",
        "audio_decoder.pre_conv.conv.weight": "nemo.dec.pre.w",
        "audio_decoder.pre_conv.conv.bias": "nemo.dec.pre.b",
        "audio_decoder.post_conv.conv.weight": "nemo.dec.post.w",
        "audio_decoder.post_conv.conv.bias": "nemo.dec.post.b",
        "audio_decoder.post_activation.activation.snake_act.alpha": "nemo.dec.post.a",
    }
    if key in flat:
        return flat[key]
    for side, pre in (("audio_encoder", "nemo.enc"), ("audio_decoder", "nemo.dec")):
        scv = f"{side}.down_sample_conv_layers." if side == "audio_encoder" \
            else f"{side}.up_sample_conv_layers."
        out = "down" if side == "audio_encoder" else "up"
        if key.startswith(scv):
            parts = key[len(scv):].split(".")
            if parts[-1] in ("weight", "bias"):
                return f"{pre}.{out}.{parts[0]}.{'w' if parts[-1] == 'weight' else 'b'}"
        res = f"{side}.res_layers."
        if key.startswith(res):
            parts = key[len(res):].split(".")
            if len(parts) < 6:
                return None
            li, bi, ri, which = parts[0], parts[2], parts[4], parts[5]
            base = f"{pre}.res.l{li}.b{bi}.r{ri}"
            if which in ("input_conv", "skip_conv") and parts[-1] in ("weight", "bias"):
                return base + (".in" if which == "input_conv" else ".sk") + \
                    (".w" if parts[-1] == "weight" else ".b")
            if which in ("input_activation", "skip_activation") and parts[-1] == "alpha":
                return base + (".in" if which == "input_activation" else ".sk") + ".a"
    if key.startswith("audio_decoder.activations.") and key.endswith("activation.snake_act.alpha"):
        return f"nemo.dec.act.{key.split('.')[2]}.a"
    return None


@register("nemo_nano_codec")
class NemoNanoConverter(BaseConverter):
    architecture = "nemo_nano_codec"

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        levels = list(cfg["num_levels"])
        writer.add_name("NeMo-Nano-Codec")
        writer.add_uint32("codec.sample_rate", int(cfg.get("sample_rate", 22050)))
        writer.add_uint32("codec.hop_size", int(cfg.get("samples_per_frame", 1764)))
        writer.add_uint32("codec.n_q", int(cfg["num_groups"]))
        writer.add_uint32("codec.codebook_size", int(np.prod(levels)))
        writer.add_uint32("codec.codebook_dim", len(levels))
        writer.add_uint32("codec.latent_dim", int(cfg["num_groups"]) * len(levels))
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)
        if "down_rates" in cfg:
            writer.add_array("nemo.down_rates", list(cfg["down_rates"]))
            writer.add_array("nemo.up_rates", list(cfg["up_rates"]))

    def write_tensors(self, writer: GGUFWriter) -> None:
        sd = self.state_dict
        mapped = {}
        for key, v in sd.items():
            if key.endswith(".weight_g"):
                base = key[: -len(".weight_g")]
                v_arr = np.asarray(sd[base + ".weight_v"], np.float32)
                g_arr = np.asarray(v, np.float32)
                axes = tuple(range(1, v_arr.ndim))
                norm = np.maximum(np.linalg.norm(v_arr, axis=axes, keepdims=True), 1e-12)
                out = map_key(base + ".weight")
                if out:
                    mapped[out] = v_arr * (g_arr.reshape(norm.shape) / norm)
            elif key.endswith(".weight_v"):
                continue
            else:
                out = map_key(key)
                if out:
                    mapped[out] = np.asarray(v)

        # grouped ConvTranspose1d (in, 1, k) with groups=in/2 → dense (in, in/2, k)
        for li in range(8):
            name = f"nemo.dec.up.{li}.w"
            if name in mapped and mapped[name].ndim == 3 and mapped[name].shape[1] == 1:
                w = mapped[name]
                in_ch, _, k = w.shape
                dense = np.zeros((in_ch, in_ch // 2, k), w.dtype)
                for i in range(in_ch):
                    dense[i, i // 2] = w[i, 0]
                mapped[name] = dense

        # FSQ constants (reference: nemo converter lines 318-343)
        levels = np.asarray(self.config["num_levels"], np.float32)
        scale = (levels // 2).astype(np.float32)
        out_scale = ((levels - 1.0) / 2.0 * (1.0 - 1e-3)).astype(np.float32)
        out_offset = np.where(levels.astype(np.int32) % 2 == 0, 0.5, 0.0).astype(np.float32)
        in_shift = np.tan(out_offset / out_scale).astype(np.float32)
        dim_base = np.cumprod(np.concatenate([[1.0], levels[:-1]])).astype(np.float32)
        mapped["nemo.fsq.scale"] = scale
        mapped["nemo.fsq.out_scale"] = out_scale
        mapped["nemo.fsq.out_offset"] = out_offset
        mapped["nemo.fsq.in_shift"] = in_shift
        mapped["nemo.fsq.dim_base"] = dim_base

        v_total = int(np.prod(levels))
        d = len(levels)
        bases = dim_base.astype(np.int64)
        ilevels = levels.astype(np.int64)
        cb = np.zeros((v_total, d), np.float32)
        for idx in range(v_total):
            digits = [(idx // bases[i]) % ilevels[i] for i in range(d)]
            cb[idx] = (np.asarray(digits, np.float32) - scale) / scale
        for g in range(int(self.config["num_groups"])):
            mapped[f"nemo.fsq.codebook.{g}"] = cb

        for name in sorted(mapped):
            arr = mapped[name]
            st = "F32" if name.startswith("nemo.fsq.") or arr.ndim == 1 else None
            if st:
                writer.add_tensor(name, arr.astype(np.float32), st)
            else:
                self.add_tensor(writer, name, arr)

"""Qwen3-TTS-Tokenizer checkpoint → codec GGUF.

Schema per reference scripts/converters/qwen3_tts_tokenizer.py: encoder
tensors reuse the mimi rename map (with `.cb.embed` codebook aliases,
denominator clamp 1e-5); decoder tensors under q3t.dec.* with snake-beta
params pre-baked (alpha → exp(alpha), beta → 1/(exp(beta)+1e-9))."""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter, shorten_name
from .mimi import map_name as mimi_map_name, MimiConverter
from .registry import register

RE_PT_LAYER = re.compile(r"^decoder\.pre_transformer\.layers\.(\d+)\.(.+)$")
RE_UPSAMPLE = re.compile(r"^decoder\.upsample\.(\d+)\.(\d+)\.(.+)$")
RE_DEC_BLOCK = re.compile(r"^decoder\.decoder\.(\d+)\.block\.(\d+)\.(.+)$")
RE_DEC_SIMPLE = re.compile(r"^decoder\.decoder\.(\d+)\.(.+)$")

_PT_MAP = {
    "input_layernorm.weight": ("inln.w", "norm"),
    "post_attention_layernorm.weight": ("paln.w", "norm"),
    "self_attn.q_proj.weight": ("attn.q.w", "linear"),
    "self_attn.q_proj.bias": ("attn.q.b", "bias"),
    "self_attn.k_proj.weight": ("attn.k.w", "linear"),
    "self_attn.k_proj.bias": ("attn.k.b", "bias"),
    "self_attn.v_proj.weight": ("attn.v.w", "linear"),
    "self_attn.v_proj.bias": ("attn.v.b", "bias"),
    "self_attn.o_proj.weight": ("attn.o.w", "linear"),
    "self_attn.o_proj.bias": ("attn.o.b", "bias"),
    "mlp.gate_proj.weight": ("mlp.gate.w", "linear"),
    "mlp.up_proj.weight": ("mlp.up.w", "linear"),
    "mlp.down_proj.weight": ("mlp.down.w", "linear"),
    "self_attn_layer_scale.scale": ("sa.scale", "scale"),
    "mlp_layer_scale.scale": ("mlp.scale", "scale"),
}
_CNX_MAP = {
    "dwconv.conv.weight": ("cnx.dw.w", "conv"), "dwconv.conv.bias": ("cnx.dw.b", "bias"),
    "norm.weight": ("cnx.norm.w", "norm"), "norm.bias": ("cnx.norm.b", "bias"),
    "pwconv1.weight": ("cnx.pw1.w", "linear"), "pwconv1.bias": ("cnx.pw1.b", "bias"),
    "pwconv2.weight": ("cnx.pw2.w", "linear"), "pwconv2.bias": ("cnx.pw2.b", "bias"),
    "gamma": ("cnx.gamma", "gamma"),
}


def map_decoder_key(key: str) -> Optional[Tuple[str, str]]:
    m = RE_PT_LAYER.match(key)
    if m:
        got = _PT_MAP.get(m.group(2))
        return (f"q3t.dec.pt.l{m.group(1)}.{got[0]}", got[1]) if got else None
    if key.startswith("decoder.pre_transformer."):
        rest = key[len("decoder.pre_transformer."):]
        flat = {"norm.weight": ("q3t.dec.pt.norm.w", "norm"),
                "input_proj.weight": ("q3t.dec.pt.in.w", "linear"),
                "input_proj.bias": ("q3t.dec.pt.in.b", "bias"),
                "output_proj.weight": ("q3t.dec.pt.out.w", "linear"),
                "output_proj.bias": ("q3t.dec.pt.out.b", "bias")}
        return flat.get(rest)
    if key == "decoder.quantizer.rvq_first.output_proj.weight":
        return "q3t.dec.q.s.op.w", "linear_raw"
    if key == "decoder.quantizer.rvq_rest.output_proj.weight":
        return "q3t.dec.q.a.op.w", "linear_raw"
    if key.startswith("decoder.pre_conv.conv."):
        s = key.rsplit(".", 1)[1]
        return (f"q3t.dec.pre.conv.{'w' if s == 'weight' else 'b'}",
                "conv" if s == "weight" else "bias")
    m = RE_UPSAMPLE.match(key)
    if m:
        ui, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if block == 0 and rest == "conv.weight":
            return f"q3t.dec.up{ui}.tr.w", "convtr"
        if block == 0 and rest == "conv.bias":
            return f"q3t.dec.up{ui}.tr.b", "bias"
        if block == 1 and rest in _CNX_MAP:
            suf, kind = _CNX_MAP[rest]
            return f"q3t.dec.up{ui}.{suf}", kind
        return None
    m = RE_DEC_BLOCK.match(key)
    if m:
        bi_raw, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if bi_raw <= 0:
            return None
        bi = bi_raw - 1
        if idx == 0:
            if rest == "alpha":
                return f"q3t.dec.b{bi}.s0.a", "snake_alpha"
            if rest == "beta":
                return f"q3t.dec.b{bi}.s0.binv", "snake_beta"
        if idx == 1:
            if rest == "conv.weight":
                return f"q3t.dec.b{bi}.tr.w", "convtr"
            if rest == "conv.bias":
                return f"q3t.dec.b{bi}.tr.b", "bias"
        if idx in (2, 3, 4):
            ri = idx - 2
            rmap = {"act1.alpha": (f"r{ri}.s1.a", "snake_alpha"),
                    "act1.beta": (f"r{ri}.s1.binv", "snake_beta"),
                    "conv1.conv.weight": (f"r{ri}.c1.w", "conv"),
                    "conv1.conv.bias": (f"r{ri}.c1.b", "bias"),
                    "act2.alpha": (f"r{ri}.s2.a", "snake_alpha"),
                    "act2.beta": (f"r{ri}.s2.binv", "snake_beta"),
                    "conv2.conv.weight": (f"r{ri}.c2.w", "conv"),
                    "conv2.conv.bias": (f"r{ri}.c2.b", "bias")}
            got = rmap.get(rest)
            return (f"q3t.dec.b{bi}.{got[0]}", got[1]) if got else None
        return None
    m = RE_DEC_SIMPLE.match(key)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if rest == "conv.weight":
            return ("q3t.dec.d0.w", "conv") if idx == 0 else \
                (("q3t.dec.final.w", "conv") if idx == 6 else None)
        if rest == "conv.bias":
            return ("q3t.dec.d0.b", "bias") if idx == 0 else \
                (("q3t.dec.final.b", "bias") if idx == 6 else None)
        if rest == "alpha" and idx == 5:
            return "q3t.dec.final.s.a", "snake_alpha"
        if rest == "beta" and idx == 5:
            return "q3t.dec.final.s.binv", "snake_beta"
    return None


@register("qwen3_tts_tokenizer")
class Qwen3TTSTokenizerConverter(BaseConverter):
    architecture = "qwen3_tts_tokenizer"

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        dec = cfg.get("decoder_config", cfg)
        enc = cfg.get("encoder_config", cfg)
        sr = int(cfg.get("output_sample_rate", cfg.get("input_sample_rate", 24000)))
        hop = int(cfg.get("decode_upsample_rate", 0))
        if hop <= 0:
            fr = float(cfg.get("frame_rate", dec.get("frame_rate", 12.5)))
            hop = int(round(sr / fr))
        writer.add_name("Qwen3-TTS-Tokenizer")
        writer.add_uint32("codec.sample_rate", sr)
        writer.add_uint32("codec.hop_size", hop)
        writer.add_uint32("codec.n_q", int(dec.get("num_quantizers", 16)))
        writer.add_uint32("codec.num_semantic_quantizers", 1)
        writer.add_uint32("codec.codebook_size", int(dec.get("codebook_size", 2048)))
        writer.add_uint32("codec.codebook_dim", int(dec.get("codebook_dim", 1024)))
        writer.add_uint32("codec.latent_dim", int(dec.get("latent_dim", dec.get("output_dim", 1024))))
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)
        for k, d in (("codebook_size", 2048), ("codebook_dim", 1024), ("n_q", 16)):
            writer.add_uint32(f"qwen3.encoder.{k}",
                              int(enc.get("num_quantizers" if k == "n_q" else k, d)))
        writer.add_uint32("qwen3.encoder.hidden_size", int(enc.get("hidden_size", 512)))
        writer.add_uint32("qwen3.encoder.num_hidden_layers", int(enc.get("num_hidden_layers", 8)))
        writer.add_uint32("qwen3.encoder.num_attention_heads", int(enc.get("num_attention_heads", 8)))
        writer.add_uint32("qwen3.encoder.head_dim", int(enc.get("head_dim", 64)))
        writer.add_uint32("qwen3.encoder.intermediate_size", int(enc.get("intermediate_size", 2048)))
        writer.add_float32("qwen3.encoder.rope_theta", float(enc.get("rope_theta", 10000.0)))
        writer.add_float32("qwen3.encoder.rope_scaling_factor", float(enc.get("rope_scaling_factor", 1.0)))
        writer.add_uint32("qwen3.decoder.hidden_size", int(dec.get("hidden_size", 1024)))
        writer.add_uint32("qwen3.decoder.num_hidden_layers", int(dec.get("num_hidden_layers", 8)))
        writer.add_uint32("qwen3.decoder.num_attention_heads", int(dec.get("num_attention_heads", 16)))
        writer.add_uint32("qwen3.decoder.num_key_value_heads",
                          int(dec.get("num_key_value_heads", dec.get("num_attention_heads", 16))))
        writer.add_uint32("qwen3.decoder.head_dim", int(dec.get("head_dim", 64)))
        writer.add_uint32("qwen3.decoder.intermediate_size", int(dec.get("intermediate_size", 3072)))
        writer.add_float32("qwen3.decoder.rope_theta", float(dec.get("rope_theta", 10000.0)))
        writer.add_uint32("qwen3.decoder.sliding_window", int(dec.get("sliding_window", 0)))
        writer.add_uint32("qwen3.decoder.decoder_dim", int(dec.get("decoder_dim", 1536)))
        if dec.get("upsample_rates"):
            writer.add_array("qwen3.decoder.upsample_rates", [int(v) for v in dec["upsample_rates"]])
        if dec.get("upsampling_ratios"):
            writer.add_array("qwen3.decoder.upsampling_ratios", [int(v) for v in dec["upsampling_ratios"]])

    def write_tensors(self, writer: GGUFWriter) -> None:
        used: set = set()
        # --- encoder (mimi schema) ---------------------------------------
        enc_sd = {k[len("encoder."):]: v for k, v in self.state_dict.items()
                  if k.startswith("encoder.")}
        if enc_sd:
            mc = MimiConverter(quantization=self.quantization)
            mc.load_from_state_dict(enc_sd, {})
            for key in sorted(enc_sd):
                if key.endswith((".codebook.embed_sum", ".codebook.cluster_usage",
                                 ".codebook.initialized")):
                    continue
                arr = mc.transform(key, np.asarray(enc_sd[key]))
                self.add_tensor(writer, shorten_name(mimi_map_name(key), used), arr)
            for prefix, short in (
                ("quantizer.semantic_residual_vector_quantizer.layers.", "q.s.layers."),
                ("quantizer.acoustic_residual_vector_quantizer.layers.", "q.a.layers."),
            ):
                qi = 0
                while f"{prefix}{qi}.codebook.embed_sum" in enc_sd:
                    es = np.asarray(enc_sd[f"{prefix}{qi}.codebook.embed_sum"], np.float32)
                    cu = np.asarray(enc_sd[f"{prefix}{qi}.codebook.cluster_usage"], np.float32)
                    embed = es / np.maximum(cu[:, None], 1e-5)
                    writer.add_tensor(shorten_name(f"{short}{qi}.cb.embed", used),
                                      embed, "F32")
                    qi += 1

        # --- decoder ------------------------------------------------------
        for key in sorted(self.state_dict):
            if not key.startswith("decoder.") or ".embedding_sum" in key \
                    or ".cluster_usage" in key:
                continue
            mapped = map_decoder_key(key)
            if mapped is None:
                continue
            name, kind = mapped
            arr = np.asarray(self.state_dict[key])
            if kind in ("linear", "linear_raw") and arr.ndim == 3 and arr.shape[-1] == 1:
                arr = arr[..., 0]
            elif kind == "snake_alpha":
                arr = np.exp(np.asarray(arr, np.float32))
            elif kind == "snake_beta":
                arr = 1.0 / (np.exp(np.asarray(arr, np.float32)) + 1e-9)
            self.add_tensor(writer, shorten_name(name, used), arr)

        # decoder RVQ codebooks (rvq_first sem + rvq_rest acoustic)
        for group, offset in (("rvq_first", 0), ("rvq_rest", 1)):
            qi = 0
            while True:
                es_key = f"decoder.quantizer.{group}.vq.layers.{qi}._codebook.embedding_sum"
                cu_key = f"decoder.quantizer.{group}.vq.layers.{qi}._codebook.cluster_usage"
                if es_key not in self.state_dict:
                    break
                es = np.asarray(self.state_dict[es_key], np.float32)
                cu = np.asarray(self.state_dict[cu_key], np.float32)
                embed = es / np.maximum(cu[:, None], 1e-5)
                writer.add_tensor(shorten_name(f"q3t.dec.q.l{qi + offset}.codebook", used),
                                  embed, "F32")
                qi += 1

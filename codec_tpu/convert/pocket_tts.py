"""Pocket-TTS (Pocket-Mimi codec section) checkpoint → codec GGUF.

Schema per reference scripts/converters/pocket_tts.py (_emit_mimi):
pocket_mimi.* names, fused attention in_proj split into q/k/v, depthwise
upsample convtr densified. (The flow_lm section is emitted separately once
the LM layer lands.)"""

from __future__ import annotations

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register


@register("pocket_tts")
class PocketTTSConverter(BaseConverter):
    architecture = "pocket_mimi"

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        hop = int(cfg.get("hop_size", 1920))
        writer.add_name("Pocket-Mimi")
        writer.add_uint32("codec.sample_rate", int(cfg.get("sample_rate", 24000)))
        writer.add_uint32("codec.encode_sample_rate", int(cfg.get("sample_rate", 24000)))
        writer.add_uint32("codec.hop_size", hop)
        writer.add_uint32("codec.decode_hop_size", hop)
        writer.add_uint32("codec.latent_dim", int(cfg.get("ldim", 32)))
        writer.add_uint32("codec.n_q", 0)
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)
        writer.add_float32("codec.frame_rate", float(cfg.get("frame_rate", 12.5)))
        writer.add_array("pocket_mimi.decoder_ratios", list(cfg["decoder_ratios"]))
        writer.add_array("pocket_mimi.encoder_ratios", list(cfg["encoder_ratios"]))
        writer.add_uint32("pocket_mimi.outer_dim", int(cfg.get("outer_dim", 512)))
        writer.add_uint32("pocket_mimi.tf_layers", int(cfg.get("tf_layers", 2)))
        writer.add_uint32("pocket_mimi.tf_heads", int(cfg.get("tf_heads", 8)))
        writer.add_uint32("pocket_mimi.tf_head_dim", int(cfg.get("tf_head_dim", 64)))
        writer.add_uint32("pocket_mimi.tf_context", int(cfg.get("tf_context", 250)))
        writer.add_float32("pocket_mimi.tf_max_period", float(cfg.get("tf_max_period", 10000.0)))

    def write_tensors(self, writer: GGUFWriter) -> None:
        sd = self.state_dict

        def t(name):
            return np.asarray(sd[name])

        def add_w(name, arr):
            writer.add_tensor(name, np.asarray(arr, np.float32),
                              "F32" if self.quantization == "F32" else "F16")

        def add_conv(src, out):
            add_w(out + ".w", t(src + ".weight"))
            if src + ".bias" in sd:
                writer.add_tensor(out + ".b", t(src + ".bias").astype(np.float32), "F32")

        for src, out in (
            ("mimi.decoder.model.0.conv", "pocket_mimi.dec.l0"),
            ("mimi.decoder.model.2.convtr", "pocket_mimi.dec.l2"),
            ("mimi.decoder.model.3.block.1.conv", "pocket_mimi.dec.r0.c1"),
            ("mimi.decoder.model.3.block.3.conv", "pocket_mimi.dec.r0.c2"),
            ("mimi.decoder.model.5.convtr", "pocket_mimi.dec.l5"),
            ("mimi.decoder.model.6.block.1.conv", "pocket_mimi.dec.r1.c1"),
            ("mimi.decoder.model.6.block.3.conv", "pocket_mimi.dec.r1.c2"),
            ("mimi.decoder.model.8.convtr", "pocket_mimi.dec.l8"),
            ("mimi.decoder.model.9.block.1.conv", "pocket_mimi.dec.r2.c1"),
            ("mimi.decoder.model.9.block.3.conv", "pocket_mimi.dec.r2.c2"),
            ("mimi.decoder.model.11.conv", "pocket_mimi.dec.l11"),
            ("mimi.encoder.model.0.conv", "pocket_mimi.enc.l0"),
            ("mimi.encoder.model.1.block.1.conv", "pocket_mimi.enc.r0.c1"),
            ("mimi.encoder.model.1.block.3.conv", "pocket_mimi.enc.r0.c2"),
            ("mimi.encoder.model.3.conv", "pocket_mimi.enc.l3"),
            ("mimi.encoder.model.4.block.1.conv", "pocket_mimi.enc.r1.c1"),
            ("mimi.encoder.model.4.block.3.conv", "pocket_mimi.enc.r1.c2"),
            ("mimi.encoder.model.6.conv", "pocket_mimi.enc.l6"),
            ("mimi.encoder.model.7.block.1.conv", "pocket_mimi.enc.r2.c1"),
            ("mimi.encoder.model.7.block.3.conv", "pocket_mimi.enc.r2.c2"),
            ("mimi.encoder.model.9.conv", "pocket_mimi.enc.l9"),
            ("mimi.encoder.model.11.conv", "pocket_mimi.enc.l11"),
        ):
            if src + ".weight" in sd:
                add_conv(src, out)

        add_w("pocket_mimi.quant.out_proj.w", t("mimi.quantizer.output_proj.weight"))

        up = t("mimi.upsample.convtr.convtr.weight")     # (in, 1, k) depthwise
        c, _, k = up.shape
        dense = np.zeros((c, c, k), np.float32)
        for ci in range(c):
            dense[ci, ci] = up[ci, 0]
        add_w("pocket_mimi.upsample.w", dense)
        add_w("pocket_mimi.downsample.w", t("mimi.downsample.conv.conv.weight"))

        for src, out in (("mimi.encoder_transformer.transformer", "pocket_mimi.etr"),
                         ("mimi.decoder_transformer.transformer", "pocket_mimi.dtr")):
            li = 0
            while f"{src}.layers.{li}.self_attn.in_proj.weight" in sd:
                s = f"{src}.layers.{li}"
                o = f"{out}.l{li}"
                q, k_, v = np.split(t(f"{s}.self_attn.in_proj.weight"), 3, axis=0)
                add_w(o + ".attn.q_proj.w", q)
                add_w(o + ".attn.k_proj.w", k_)
                add_w(o + ".attn.v_proj.w", v)
                add_w(o + ".attn.o_proj.w", t(f"{s}.self_attn.out_proj.weight"))
                add_w(o + ".mlp.fc1.w", t(f"{s}.linear1.weight"))
                add_w(o + ".mlp.fc2.w", t(f"{s}.linear2.weight"))
                for nm, srcn in (("inln.w", "norm1.weight"), ("inln.b", "norm1.bias"),
                                 ("paln.w", "norm2.weight"), ("paln.b", "norm2.bias"),
                                 ("sa_ls.scale", "layer_scale_1.scale"),
                                 ("mlp_ls.scale", "layer_scale_2.scale")):
                    writer.add_tensor(f"{o}.{nm}", t(f"{s}.{srcn}").astype(np.float32), "F32")
                li += 1

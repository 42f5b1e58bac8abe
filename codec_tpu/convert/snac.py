"""SNAC checkpoint → codec GGUF (schema per reference
scripts/converters/snac.py: snac.enc/dec/q.* names, weight-norm
materialization from torch parametrizations, pre-baked L2-normalized
codebooks)."""

from __future__ import annotations

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register


def _wn(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.float32)
    g = np.asarray(g, np.float32)
    axes = tuple(range(1, v.ndim))
    norm = np.maximum(np.linalg.norm(v, axis=axes, keepdims=True), 1e-12)
    return v * (g / norm)


@register("snac")
class SnacConverter(BaseConverter):
    architecture = "snac"

    def write_metadata(self, writer: GGUFWriter) -> None:
        cfg = self.config
        hop = int(np.prod(cfg["encoder_rates"]))
        writer.add_name("SNAC")
        writer.add_uint32("codec.sample_rate", int(cfg["sample_rate"]))
        writer.add_uint32("codec.encode_sample_rate", int(cfg["sample_rate"]))
        writer.add_uint32("codec.hop_size", hop)
        writer.add_uint32("codec.pad_to", hop * int(max(cfg["vq_strides"])))
        writer.add_uint32("codec.n_q", len(cfg["vq_strides"]))
        writer.add_uint32("codec.codebook_size", int(cfg["codebook_size"]))
        writer.add_uint32("codec.codebook_dim", int(cfg["codebook_dim"]))
        writer.add_uint32("codec.latent_dim", int(cfg["latent_dim"]))
        writer.add_bool("codec.has_encoder", True)
        writer.add_bool("codec.has_decoder", True)
        writer.add_array("snac.encoder_rates", list(cfg["encoder_rates"]))
        writer.add_array("snac.decoder_rates", list(cfg["decoder_rates"]))
        writer.add_array("snac.vq_strides", list(cfg["vq_strides"]))
        writer.add_uint32("snac.encoder_dim", int(cfg["encoder_dim"]))
        writer.add_uint32("snac.decoder_dim", int(cfg["decoder_dim"]))
        writer.add_bool("snac.depthwise", bool(cfg.get("depthwise", True)))
        writer.add_bool("snac.noise", bool(cfg.get("noise", True)))

    def write_tensors(self, writer: GGUFWriter) -> None:
        sd = self.state_dict
        cfg = self.config

        def t(name):
            return np.asarray(sd[name])

        def wn_conv(prefix, out):
            w = _wn(t(prefix + ".parametrizations.weight.original1"),
                    t(prefix + ".parametrizations.weight.original0"))
            self.add_tensor(writer, out + ".w", w)
            if prefix + ".bias" in sd:
                writer.add_tensor(out + ".b", t(prefix + ".bias").astype(np.float32), "F32")

        def alpha(prefix, out):
            writer.add_tensor(out + ".alpha",
                              t(prefix + ".alpha").reshape(-1).astype(np.float32), "F32")

        def res_unit(prefix, out):
            alpha(prefix + ".block.0", out + ".act1")
            wn_conv(prefix + ".block.1", out + ".conv1")
            alpha(prefix + ".block.2", out + ".act2")
            wn_conv(prefix + ".block.3", out + ".conv2")

        wn_conv("encoder.block.0", "snac.enc.conv0")
        for bi, _s in enumerate(cfg["encoder_rates"], start=1):
            base = f"encoder.block.{bi}.block"
            o = f"snac.enc.b{bi}"
            for ri in range(3):
                res_unit(f"{base}.{ri}", f"{o}.r{ri}")
            alpha(f"{base}.3", f"{o}.act")
            wn_conv(f"{base}.4", f"{o}.down")
        wn_conv("encoder.block.5", "snac.enc.conv_final")

        for qi in range(len(cfg["vq_strides"])):
            base = f"quantizer.quantizers.{qi}"
            wn_conv(base + ".in_proj", f"snac.q.{qi}.in_proj")
            wn_conv(base + ".out_proj", f"snac.q.{qi}.out_proj")
            cb = t(base + ".codebook.weight").astype(np.float32)
            cb_norm = cb / (np.linalg.norm(cb, axis=1, keepdims=True) + 1e-12)
            writer.add_tensor(f"snac.q.{qi}.codebook", cb, "F32")
            writer.add_tensor(f"snac.q.{qi}.codebook_norm", cb_norm, "F32")

        wn_conv("decoder.model.0", "snac.dec.conv_in_dw")
        wn_conv("decoder.model.1", "snac.dec.conv_in_pw")
        for bi, _s in enumerate(cfg["decoder_rates"], start=2):
            base = f"decoder.model.{bi}.block"
            o = f"snac.dec.b{bi - 2}"
            alpha(base + ".0", o + ".act")
            wn_conv(base + ".1", o + ".convtr")
            if base + ".2.linear.parametrizations.weight.original0" in sd:
                wn_conv(base + ".2.linear", o + ".noise")
                res_base = 3
            else:
                res_base = 2
            for ri in range(3):
                res_unit(f"{base}.{res_base + ri}", f"{o}.r{ri}")
        alpha("decoder.model.6", "snac.dec.act_final")
        wn_conv("decoder.model.7", "snac.dec.conv_final")

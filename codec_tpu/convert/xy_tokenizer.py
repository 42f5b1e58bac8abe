"""XY-Tokenizer checkpoint → codec GGUF (reference:
scripts/converters/xy_tokenizer.py — Whisper-style transformer modules,
ConvNeXt Vocos + iSTFT head, ResidualDownConv/UpConv, Euclid RVQ with baked
codebook squared norms)."""

from __future__ import annotations

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register
from .xcodec2 import apply_weight_norm


@register("xy_tokenizer")
class XyTokenizerConverter(BaseConverter):
    architecture = "xy_tokenizer"

    def _p(self, key):
        return self.config["params"][key]

    def write_metadata(self, w: GGUFWriter) -> None:
        cfg = self.config
        qz = self._p("quantizer_kwargs")
        fe = self._p("feature_extractor_kwargs")
        w.add_name("XY-Tokenizer")
        w.add_uint32("codec.sample_rate", int(cfg["output_sample_rate"]))
        w.add_uint32("codec.encode_sample_rate", int(cfg["input_sample_rate"]))
        w.add_uint32("codec.hop_size", int(cfg["decoder_upsample_rate"]))
        w.add_uint32("codec.n_q", int(qz["num_quantizers"]))
        w.add_uint32("codec.codebook_size", int(qz["codebook_size"]))
        w.add_uint32("codec.codebook_dim", int(qz["codebook_dim"]))
        w.add_uint32("codec.latent_dim", int(cfg["code_dim"]))
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        w.add_uint32("xy.encoder_downsample_rate",
                     int(cfg["encoder_downsample_rate"]))
        w.add_uint32("xy.decoder_upsample_rate",
                     int(cfg["decoder_upsample_rate"]))
        w.add_uint32("xy.rvq_dim", int(qz["rvq_dim"]))
        w.add_uint32("xy.mel.n_mels", int(fe["feature_size"]))
        w.add_uint32("xy.mel.n_fft", int(fe["n_fft"]))
        w.add_uint32("xy.mel.hop_length", int(fe["hop_length"]))
        w.add_uint32("xy.mel.sample_rate", int(fe["sampling_rate"]))
        w.add_uint32("xy.mel.chunk_length_seconds",
                     int(fe.get("chunk_length", 30)))
        sem = self._p("semantic_encoder_kwargs")
        if "num_heads" in sem:
            w.add_uint32("xy.sem_enc.n_heads", int(sem["num_heads"]))
        vocos = self._p("vocos_kwargs")
        w.add_uint32("xy.vocos.head.n_fft", int(vocos["n_fft"]))
        w.add_uint32("xy.vocos.head.hop_size", int(vocos["hop_size"]))
        # layer-count KVs are emitted alongside the tensors
        sd = self.state_dict
        for src, dst in self._MODULES:
            n = 0
            while f"{src}.layers.{n}.self_attn.q_proj.weight" in sd:
                n += 1
            w.add_uint32(dst + ".n_layers", n)
        n_blocks = 0
        while f"enhanced_vocos.backbone.convnext.{n_blocks}.dwconv.weight" in sd:
            n_blocks += 1
        w.add_uint32("xy.vocos.n_blocks", n_blocks)
        w.add_uint32("xy.downsample.avg_pooler",
                     int(self._p("downsample_kwargs")["avg_pooler"]))
        w.add_uint32("xy.upsample.stride",
                     int(self._p("upsample_kwargs")["stride"]))

    _MODULES = (
        ("semantic_encoder", "xy.sem_enc"),
        ("acoustic_encoder", "xy.acoust_enc"),
        ("semantic_encoder_adapter", "xy.sem_enc_adapter"),
        ("pre_rvq_adapter", "xy.pre_rvq_adapter"),
        ("post_rvq_adapter", "xy.post_rvq_adapter"),
        ("acoustic_decoder", "xy.acoust_dec"),
    )

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        T = lambda n: np.asarray(sd[n])

        def opt(src, dst):
            if src + ".weight" in sd:
                self.add_tensor(w, dst + ".w", T(src + ".weight"))
                if src + ".bias" in sd:
                    self.add_tensor(w, dst + ".b", T(src + ".bias"))

        for src, dst in self._MODULES:
            if src + ".positional_embedding" in sd:
                self.add_tensor(w, dst + ".pos_emb",
                                T(src + ".positional_embedding"))
            opt(src + ".layer_norm", dst + ".layer_norm")
            for part in ("conv1", "conv2", "deconv1", "deconv2", "proj",
                         "out_proj"):
                opt(f"{src}.{part}", f"{dst}.{part}")
            li = 0
            while f"{src}.layers.{li}.self_attn.q_proj.weight" in sd:
                lp, lo = f"{src}.layers.{li}", f"{dst}.l{li}"
                opt(lp + ".self_attn_layer_norm", lo + ".norm1")
                opt(lp + ".self_attn.q_proj", lo + ".attn.q")
                self.add_tensor(w, lo + ".attn.k.w",
                                T(lp + ".self_attn.k_proj.weight"))
                opt(lp + ".self_attn.v_proj", lo + ".attn.v")
                opt(lp + ".self_attn.out_proj", lo + ".attn.out")
                opt(lp + ".final_layer_norm", lo + ".norm2")
                opt(lp + ".mlp.fc1", lo + ".mlp.fc1")
                opt(lp + ".mlp.fc2", lo + ".mlp.fc2")
                li += 1

        # Vocos + iSTFT head
        opt("enhanced_vocos.backbone.embed", "xy.vocos.embed")
        opt("enhanced_vocos.backbone.norm", "xy.vocos.norm")
        opt("enhanced_vocos.backbone.final_layer_norm",
            "xy.vocos.final_layer_norm")
        bi = 0
        while f"enhanced_vocos.backbone.convnext.{bi}.dwconv.weight" in sd:
            sp = f"enhanced_vocos.backbone.convnext.{bi}"
            op = f"xy.vocos.b{bi}"
            for part in ("dwconv", "norm", "pwconv1", "pwconv2"):
                opt(f"{sp}.{part}", f"{op}.{part}")
            self.add_tensor(w, op + ".gamma", T(sp + ".gamma"))
            bi += 1
        opt("enhanced_vocos.head.out", "xy.vocos.head.out")
        if "enhanced_vocos.head.istft.window" in sd:
            self.add_tensor(w, "xy.vocos.head.istft_window",
                            T("enhanced_vocos.head.istft.window"))

        # ResidualDownConv + UpConv
        for part, dst in (("gate_proj", "gate"), ("up_proj", "up"),
                          ("down_proj", "down")):
            self.add_tensor(w, f"xy.downsample.{dst}.w",
                            T(f"downsample.{part}.weight"))
        opt("downsample.layer_norm", "xy.downsample.layer_norm")
        self.add_tensor(w, "xy.upsample.up_conv.w", T("upsample.up_conv.weight"))

        # quantizer projections (WN 1×1 convs) + codebooks with sq norms
        for src, dst in (("quantizer.input_proj", "xy.q.in_proj"),
                         ("quantizer.output_proj", "xy.q.out_proj")):
            mat = apply_weight_norm(T(src + ".weight_v"), T(src + ".weight_g"))
            self.add_tensor(w, dst + ".w", mat)
            if src + ".bias" in sd:
                self.add_tensor(w, dst + ".b", T(src + ".bias"))
        n_q = int(self._p("quantizer_kwargs")["num_quantizers"])
        for qi in range(n_q):
            cb = T(f"quantizer.quantizers.{qi}.codebook").astype(np.float32)
            self.add_tensor(w, f"xy.q.{qi}.codebook", cb)
            self.add_tensor(w, f"xy.q.{qi}.codebook_sq_norm",
                            (cb * cb).sum(axis=1).astype(np.float32))

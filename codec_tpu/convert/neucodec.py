"""NeuCodec / Distill-NeuCodec checkpoint → codec GGUF.

Wire schema per the reference converter (reference:
scripts/converters/neucodec.py): Vocos decoder under `neucodec.decode.*`
with an implicit-FSQ codebook; encode-side tensors stored under FNV-1a-64
digests (`nce.<hex>`, see models/neucodec.neu_encode_name) — base acoustic
(BigCodec) under `neucodec.encode.acoustic.*`, distill encoder pass-through
under `neucodec.encode.distill.<source_key>` with torch parametrized
weight-norm materialized, HuBERT (ntu-spml/distilhubert) semantic weights
under `neucodec.encode.hubert.*`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..io.gguf import GGUFWriter
from ..models.neucodec import neu_encode_name
from .base import BaseConverter
from .registry import register
from .xcodec2 import FSQ_LEVELS, apply_weight_norm, fsq_implicit_codebook


def is_distill_state_dict(sd) -> bool:
    return any(k.startswith("codec_encoder.") for k in sd)


@register("neucodec", "distill_neucodec")
class NeuCodecConverter(BaseConverter):
    architecture = "neucodec"        # overridden to distill at save time

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.hubert_state: Optional[Dict[str, np.ndarray]] = None
        self.hubert_config: Optional[Dict] = None

    def set_hubert(self, state_dict, config: Dict) -> None:
        """Distill conversions need the distilhubert weights (the reference
        pulls ntu-spml/distilhubert; here the caller supplies them)."""
        self.hubert_state = {k: np.asarray(v) for k, v in state_dict.items()}
        self.hubert_config = dict(config)

    def _cfg(self, key, default):
        return (self.config or {}).get(key, default)

    @property
    def encoder_type(self) -> str:
        return "distill" if is_distill_state_dict(self.state_dict) else "base"

    def convert_and_save(self, output_path) -> None:
        # architecture depends on the checkpoint flavor
        self.architecture = ("distill_neucodec"
                             if self.encoder_type == "distill" else "neucodec")
        super().convert_and_save(output_path)

    def write_metadata(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        hidden = sd["generator.backbone.final_layer_norm.weight"].shape[0]
        vq_dim = sd["generator.quantizer.project_out.bias"].shape[0]
        n_layers = 0
        while f"generator.backbone.transformers.{n_layers}.att_norm.weight" in sd:
            n_layers += 1
        head_dim = int(self._cfg("head_dim", 64))
        n_fft = sd["generator.head.out.bias"].shape[0] - 2

        w.add_name("NeuCodec")
        w.add_uint32("codec.sample_rate", int(self._cfg("sample_rate", 24000)))
        w.add_uint32("codec.encode_sample_rate",
                     int(self._cfg("encode_sample_rate", 16000)))
        w.add_uint32("codec.hop_size", int(self._cfg("hop_size", 480)))
        w.add_uint32("codec.n_fft", n_fft)
        w.add_uint32("codec.n_q", 1)
        w.add_uint32("codec.codebook_size", int(np.prod(FSQ_LEVELS)))
        w.add_uint32("codec.codebook_dim", len(FSQ_LEVELS))
        w.add_uint32("codec.latent_dim", hidden)
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        w.add_uint32("neucodec.hidden_dim", hidden)
        w.add_uint32("neucodec.vq_dim", vq_dim)
        w.add_uint32("neucodec.num_layers", n_layers)
        w.add_uint32("neucodec.num_heads", hidden // head_dim)
        w.add_uint32("neucodec.head_dim", head_dim)
        w.add_float32("neucodec.rope_theta", 10000.0)
        w.add_string("neucodec.encoder_type", self.encoder_type)
        if self.encoder_type == "distill" and self.hubert_config is not None:
            hc = self.hubert_config
            w.add_uint32("neucodec.hubert.hidden_size", int(hc["hidden_size"]))
            w.add_uint32("neucodec.hubert.num_heads",
                         int(hc["num_attention_heads"]))
            w.add_uint32("neucodec.hubert.intermediate_size",
                         int(hc["intermediate_size"]))
            w.add_uint32("neucodec.hubert.num_layers",
                         int(hc["num_hidden_layers"]))
            w.add_uint32("neucodec.hubert.num_conv_pos_embeddings",
                         int(hc["num_conv_pos_embeddings"]))
            w.add_uint32("neucodec.hubert.num_conv_pos_embedding_groups",
                         int(hc["num_conv_pos_embedding_groups"]))
            w.add_float32("neucodec.hubert.layer_norm_eps",
                          float(hc.get("layer_norm_eps", 1e-5)))
            w.add_array("neucodec.hubert.conv_dim", list(hc["conv_dim"]))
            w.add_array("neucodec.hubert.conv_kernel", list(hc["conv_kernel"]))
            w.add_array("neucodec.hubert.conv_stride", list(hc["conv_stride"]))
            for k in ("heads", "down_window", "local_window"):
                if k in (self.config or {}):
                    w.add_uint32(f"neucodec.distill.{k}", int(self.config[k]))

    def _enc(self, w, name, arr):
        self.add_tensor(w, neu_encode_name(name), np.asarray(arr))

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        T = lambda n: np.asarray(sd[n])

        self.add_tensor(w, "neucodec.decode.codebook",
                        fsq_implicit_codebook(FSQ_LEVELS))

        def lin(src, dst, enc=False):
            add = self._enc if enc else self.add_tensor
            add(w, dst + ".w", T(src + ".weight"))
            if src + ".bias" in sd:
                add(w, dst + ".b", T(src + ".bias"))

        # ---- decoder (plain names) ----
        lin("generator.quantizer.project_out", "neucodec.decode.quant.project_out")
        lin("fc_post_a", "neucodec.decode.fc_post_a")
        lin("generator.backbone.embed", "neucodec.decode.embed")
        for group, src in (("prior", "prior_net"), ("post", "post_net")):
            for i in range(2):
                base = f"generator.backbone.{src}.{i}"
                for part in ("norm1", "conv1", "norm2", "conv2"):
                    lin(f"{base}.{part}", f"neucodec.decode.{group}.{i}.{part}")
        i = 0
        while f"generator.backbone.transformers.{i}.att_norm.weight" in sd:
            base = f"generator.backbone.transformers.{i}"
            dst = f"neucodec.decode.transformer.{i}"
            self.add_tensor(w, dst + ".att_norm.w", T(base + ".att_norm.weight"))
            self.add_tensor(w, dst + ".ffn_norm.w", T(base + ".ffn_norm.weight"))
            for part in ("att.c_attn", "att.c_proj", "mlp.fc1", "mlp.fc2"):
                self.add_tensor(w, f"{dst}.{part}.w", T(f"{base}.{part}.weight"))
            i += 1
        lin("generator.backbone.final_layer_norm", "neucodec.decode.final_ln")
        lin("generator.head.out", "neucodec.decode.head.out")
        if "generator.head.istft.window" in sd:
            self.add_tensor(w, "neucodec.decode.istft.window",
                            T("generator.head.istft.window"))

        # ---- shared encoder tensors (hashed names) ----
        lin("generator.quantizer.project_in", "neucodec.encode.quant.project_in",
            enc=True)
        lin("fc_prior", "neucodec.encode.fc_prior", enc=True)
        if "fc_sq_prior.weight" in sd:
            lin("fc_sq_prior", "neucodec.encode.fc_sq_prior", enc=True)
        if "SemanticEncoder_module.initial_conv.weight" in sd:
            self._enc(w, "neucodec.encode.semantic_encoder.initial_conv.w",
                      T("SemanticEncoder_module.initial_conv.weight"))
            for n, src in (("residual.1", "residual_blocks.1"),
                           ("residual.3", "residual_blocks.3")):
                self._enc(w, f"neucodec.encode.semantic_encoder.{n}.w",
                          T(f"SemanticEncoder_module.{src}.weight"))
                self._enc(w, f"neucodec.encode.semantic_encoder.{n}.b",
                          T(f"SemanticEncoder_module.{src}.bias"))
            self._enc(w, "neucodec.encode.semantic_encoder.final_conv.w",
                      T("SemanticEncoder_module.final_conv.weight"))

        if self.encoder_type == "base":
            self._write_base_acoustic(w)
        else:
            self._write_distill(w)
            self._write_hubert(w)

    # -- base (BigCodec) acoustic encoder --------------------------------
    def _write_base_acoustic(self, w) -> None:
        sd = self.state_dict
        T = lambda n: np.asarray(sd[n])

        def wn(src, dst):
            self._enc(w, dst + ".w", apply_weight_norm(
                T(src + ".weight_v"), T(src + ".weight_g")))
            if src + ".bias" in sd:
                self._enc(w, dst + ".b", T(src + ".bias"))

        def act(src, dst):
            for part, key in (("alpha", ".act.alpha"), ("beta", ".act.beta"),
                              ("up.filter", ".upsample.filter"),
                              ("down.filter", ".downsample.lowpass.filter")):
                self._enc(w, f"{dst}.{part}", T(src + key))

        wn("CodecEnc.conv_blocks.0", "neucodec.encode.acoustic.conv0")
        for bi in range(1, 6):
            base = f"CodecEnc.conv_blocks.{bi}.block"
            for ri in range(3):
                rb = f"{base}.{ri}.block"
                o = f"neucodec.encode.acoustic.b{bi}.r{ri}"
                act(f"{rb}.0", o + ".act1")
                wn(f"{rb}.1", o + ".conv1")
                act(f"{rb}.2", o + ".act2")
                wn(f"{rb}.3", o + ".conv2")
            act(f"{base}.3", f"neucodec.encode.acoustic.b{bi}.act")
            wn(f"{base}.4", f"neucodec.encode.acoustic.b{bi}.down")
        act("CodecEnc.conv_final_block.0", "neucodec.encode.acoustic.final.act")
        wn("CodecEnc.conv_final_block.1", "neucodec.encode.acoustic.final.conv")

    # -- distill encoder pass-through ------------------------------------
    def _write_distill(self, w) -> None:
        sd = self.state_dict
        handled = set()
        for k in list(sd):
            if k.endswith(".parametrizations.weight.original0"):
                base = k[: -len(".parametrizations.weight.original0")]
                mat = apply_weight_norm(
                    np.asarray(sd[base + ".parametrizations.weight.original1"]),
                    np.asarray(sd[k]))
                self._enc(w, "neucodec.encode.distill." + base + ".weight", mat)
                handled.add(base + ".weight")
                if base + ".bias" in sd:
                    self._enc(w, "neucodec.encode.distill." + base + ".bias",
                              np.asarray(sd[base + ".bias"]))
                    handled.add(base + ".bias")
        prefixes = ("codec_encoder.",)
        for k, v in sd.items():
            if not k.startswith(prefixes) or k in handled:
                continue
            if ".parametrizations.weight.original" in k:
                continue
            if k.endswith((".weight", ".bias", ".alpha", ".beta", ".gamma")):
                self._enc(w, "neucodec.encode.distill." + k, np.asarray(v))

    # -- HuBERT semantic stack -------------------------------------------
    def _write_hubert(self, w) -> None:
        if self.hubert_state is None or self.hubert_config is None:
            raise RuntimeError(
                "distill conversion needs set_hubert(state_dict, config) "
                "(ntu-spml/distilhubert)")
        hs = self.hubert_state
        hc = self.hubert_config
        H = lambda n: np.asarray(hs[n])

        for i in range(len(hc["conv_stride"])):
            self._enc(w, f"neucodec.encode.hubert.feat.conv.{i}.w",
                      H(f"feature_extractor.conv_layers.{i}.conv.weight"))
        self._enc(w, "neucodec.encode.hubert.feat.conv.0.gn.w",
                  H("feature_extractor.conv_layers.0.layer_norm.weight"))
        self._enc(w, "neucodec.encode.hubert.feat.conv.0.gn.b",
                  H("feature_extractor.conv_layers.0.layer_norm.bias"))
        self._enc(w, "neucodec.encode.hubert.feature_projection.w",
                  H("feature_projection.projection.weight"))
        self._enc(w, "neucodec.encode.hubert.feature_projection.b",
                  H("feature_projection.projection.bias"))
        pos_w = apply_weight_norm(
            H("encoder.pos_conv_embed.conv.parametrizations.weight.original1"),
            H("encoder.pos_conv_embed.conv.parametrizations.weight.original0"),
            dim=2)
        self._enc(w, "neucodec.encode.hubert.encoder.pos_conv.w", pos_w)
        self._enc(w, "neucodec.encode.hubert.encoder.pos_conv.b",
                  H("encoder.pos_conv_embed.conv.bias"))
        self._enc(w, "neucodec.encode.hubert.encoder.layer_norm.w",
                  H("encoder.layer_norm.weight"))
        self._enc(w, "neucodec.encode.hubert.encoder.layer_norm.b",
                  H("encoder.layer_norm.bias"))
        hf_map = (
            ("att.q", "attention.q_proj"), ("att.k", "attention.k_proj"),
            ("att.v", "attention.v_proj"), ("att.o", "attention.out_proj"),
            ("ln", "layer_norm"), ("ffn.fc1", "feed_forward.intermediate_dense"),
            ("ffn.fc2", "feed_forward.output_dense"),
            ("ffn_ln", "final_layer_norm"),
        )
        for i in range(int(hc["num_hidden_layers"])):
            for mine, hf in hf_map:
                dst = f"neucodec.encode.hubert.encoder.layers.{i}.{mine}"
                self._enc(w, dst + ".w", H(f"encoder.layers.{i}.{hf}.weight"))
                self._enc(w, dst + ".b", H(f"encoder.layers.{i}.{hf}.bias"))

"""XCodec2 (HKUSTAudio/xcodec2) checkpoint → codec GGUF.

Wire schema per the reference converter (reference:
scripts/converters/xcodec2.py): Vocos decoder under `xcodec2.decode.*` with
an implicit-FSQ codebook baked from levels [4]^8, BigCodec acoustic encoder
under `xcodec2.enc.codec.*` (weight-norm materialized, snake-beta
alpha/inv_beta pre-baked — the HF checkpoint's `act.beta` key is dropped by
strict=False loading upstream, so inv_beta = 1/(1+1e-9)), W2V-BERT semantic
slice under `xcodec2.w2v.*`, SeamlessM4T mel tables recomputed.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..dsp.audio import mel_filter_bank, povey_window
from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register

FSQ_LEVELS = [4] * 8
W2V_MEL = dict(n_fft=512, win=400, hop=160, n_mels=80, stride=2,
               preemphasis=0.97, mel_floor=1.192092955078125e-07)
UP_RATIOS = [2, 2, 4, 4, 5]
DILATIONS = [1, 3, 9]


def apply_weight_norm(v: np.ndarray, g: np.ndarray, dim: int = 0) -> np.ndarray:
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.linalg.norm(v, axis=axes, keepdims=True)
    return v * (g.reshape(norm.shape) / (norm + 1e-12))


def fsq_implicit_codebook(levels: List[int]) -> np.ndarray:
    """[codebook_size, codebook_dim] implicit FSQ codebook."""
    lv = np.asarray(levels, np.int64)
    basis = np.cumprod(np.asarray([1] + levels[:-1], np.int64))
    idx = np.arange(int(np.prod(lv)), dtype=np.int64)
    digits = (idx[:, None] // basis[None, :]) % lv[None, :]
    half = lv // 2
    return ((digits - half) / half).astype(np.float32)


def count_layers(sd, fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


@register("xcodec2")
class XCodec2Converter(BaseConverter):
    """Dims are derived from the checkpoint where shapes allow (so tiny
    roundtrip fixtures work); head counts fall back to the real
    HKUSTAudio/xcodec2 values unless overridden via `config`."""

    architecture = "xcodec2"

    def _cfg(self, key, default):
        return (self.config or {}).get(key, default)

    def write_metadata(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        hidden = sd["generator.backbone.final_layer_norm.weight"].shape[0]
        vq_dim = sd["generator.quantizer.project_out.bias"].shape[0]
        n_layers = count_layers(sd, "generator.backbone.transformers.{}.att_norm.weight")
        w2v_hidden = sd["semantic_model.feature_projection.projection.bias"].shape[0]
        w2v_layers = count_layers(sd, "semantic_model.encoder.layers.{}.ffn1_layer_norm.weight")
        w2v_inter = sd["semantic_model.encoder.layers.0.ffn1.intermediate_dense.bias"].shape[0]
        w2v_input = sd["semantic_model.feature_projection.layer_norm.weight"].shape[0]
        dist = sd["semantic_model.encoder.layers.0.self_attn.distance_embedding.weight"]
        dwk = sd["semantic_model.encoder.layers.0.conv_module.depthwise_conv.weight"].shape[-1]
        head_dim = int(self._cfg("head_dim", 64))
        w2v_head_dim = dist.shape[1]
        n_fft = sd["generator.head.out.bias"].shape[0] - 2

        w.add_name("XCodec2")
        w.add_uint32("codec.sample_rate", int(self._cfg("sample_rate", 16000)))
        w.add_uint32("codec.encode_sample_rate", int(self._cfg("sample_rate", 16000)))
        w.add_uint32("codec.hop_size", 320)
        w.add_uint32("codec.n_fft", n_fft)
        w.add_uint32("codec.n_q", 1)
        w.add_uint32("codec.codebook_size", int(np.prod(FSQ_LEVELS)))
        w.add_uint32("codec.codebook_dim", len(FSQ_LEVELS))
        w.add_uint32("codec.latent_dim", hidden)
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        w.add_uint32("xcodec2.hidden_dim", hidden)
        w.add_uint32("xcodec2.vq_dim", vq_dim)
        w.add_uint32("xcodec2.num_layers", n_layers)
        w.add_uint32("xcodec2.num_heads", hidden // head_dim)
        w.add_uint32("xcodec2.head_dim", head_dim)
        w.add_float32("xcodec2.rope_theta", 10000.0)
        w.add_uint32("xcodec2.enc.ngf",
                     sd["CodecEnc.conv_blocks.0.weight_v"].shape[0])
        w.add_array("xcodec2.enc.up_ratios", UP_RATIOS)
        w.add_array("xcodec2.enc.dilations", DILATIONS)
        w.add_uint32("xcodec2.w2v.layers", w2v_layers)
        w.add_uint32("xcodec2.w2v.hidden", w2v_hidden)
        w.add_uint32("xcodec2.w2v.heads", w2v_hidden // w2v_head_dim)
        w.add_uint32("xcodec2.w2v.head_dim", w2v_head_dim)
        w.add_uint32("xcodec2.w2v.intermediate", w2v_inter)
        w.add_uint32("xcodec2.w2v.left_max_pos", int(self._cfg("left_max_pos", 64)))
        w.add_uint32("xcodec2.w2v.right_max_pos",
                     dist.shape[0] - 1 - int(self._cfg("left_max_pos", 64)))
        w.add_uint32("xcodec2.w2v.dw_kernel", dwk)
        w.add_float32("xcodec2.w2v.layer_norm_eps", 1e-5)
        w.add_uint32("xcodec2.w2v.input_dim", w2v_input)
        mel = dict(W2V_MEL)
        mel.update((self.config or {}).get("mel", {}))
        w.add_uint32("codec.mel.sample_rate", int(self._cfg("sample_rate", 16000)))
        w.add_uint32("codec.mel.n_mels", mel["n_mels"])
        w.add_uint32("codec.mel.n_fft", mel["n_fft"])
        w.add_uint32("codec.mel.win_length", mel["win"])
        w.add_uint32("codec.mel.hop_length", mel["hop"])
        w.add_float32("codec.mel.preemphasis", mel["preemphasis"])
        w.add_float32("codec.mel.mel_floor", mel["mel_floor"])
        w.add_uint32("codec.mel.stride", mel["stride"])
        w.add_bool("codec.mel.remove_dc_offset", True)
        w.add_bool("codec.mel.normalize_per_mel_bins", True)

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        T = lambda n: np.asarray(sd[n])

        self.add_tensor(w, "xcodec2.decode.codebook",
                        fsq_implicit_codebook(FSQ_LEVELS))

        def lin(src, dst):
            self.add_tensor(w, dst + ".w", T(src + ".weight"))
            self.add_tensor(w, dst + ".b", T(src + ".bias"))

        def norm(src, dst):
            lin(src, dst)

        # ---- Vocos decoder ----
        lin("generator.quantizer.project_out", "xcodec2.decode.quant.project_out")
        lin("fc_post_a", "xcodec2.decode.fc_post_a")
        lin("generator.backbone.embed", "xcodec2.decode.embed")
        for group, src in (("prior", "prior_net"), ("post", "post_net")):
            for i in range(2):
                base = f"generator.backbone.{src}.{i}"
                for part in ("norm1", "conv1", "norm2", "conv2"):
                    lin(f"{base}.{part}", f"xcodec2.decode.{group}.{i}.{part}")
        n_layers = count_layers(sd, "generator.backbone.transformers.{}.att_norm.weight")
        for i in range(n_layers):
            base = f"generator.backbone.transformers.{i}"
            dst = f"xcodec2.decode.transformer.{i}"
            self.add_tensor(w, dst + ".att_norm.w", T(base + ".att_norm.weight"))
            self.add_tensor(w, dst + ".ffn_norm.w", T(base + ".ffn_norm.weight"))
            for part in ("att.c_attn", "att.c_proj", "mlp.fc1", "mlp.fc2"):
                self.add_tensor(w, f"{dst}.{part}.w",
                                T(f"{base}.{part}.weight"))
        lin("generator.backbone.final_layer_norm", "xcodec2.decode.final_ln")
        lin("generator.head.out", "xcodec2.decode.head.out")
        if "generator.head.istft.window" in sd:
            self.add_tensor(w, "xcodec2.decode.istft.window",
                            T("generator.head.istft.window"))

        # ---- mel tables (recomputed; no transformers dep at runtime) ----
        mel = dict(W2V_MEL)
        mel.update((self.config or {}).get("mel", {}))
        self.add_tensor(w, "xcodec2.enc.mel.filters", mel_filter_bank(
            mel["n_fft"] // 2 + 1, mel["n_mels"], min_frequency=20.0,
            max_frequency=8000.0, sampling_rate=16000, norm=None,
            mel_scale="kaldi", triangularize_in_mel_space=True).astype(np.float32))
        self.add_tensor(w, "xcodec2.enc.mel.window",
                        povey_window(mel["win"]).astype(np.float32))

        # ---- BigCodec acoustic encoder ----
        def wn_conv(src, dst):
            wv = apply_weight_norm(T(src + ".weight_v"), T(src + ".weight_g"))
            self.add_tensor(w, dst + ".w", wv)
            if src + ".bias" in sd:
                self.add_tensor(w, dst + ".b", T(src + ".bias"))

        def snake(src, dst):
            # HF strict=False drops the renamed `beta` key → effective
            # runtime beta is the zero default (see module docstring)
            alpha = np.exp(T(src + ".alpha"))
            self.add_tensor(w, dst + ".alpha", alpha.astype(np.float32))
            self.add_tensor(w, dst + ".inv_beta",
                            np.full_like(alpha, 1.0 / (1.0 + 1e-9),
                                         dtype=np.float32))

        shared = T("CodecEnc.conv_blocks.1.block.0.block.0.upsample.filter"
                   ).reshape(-1).astype(np.float32)
        for k, v in sd.items():
            if "upsample.filter" in k or "downsample.lowpass.filter" in k:
                if not np.allclose(np.asarray(v).reshape(-1), shared, atol=1e-7):
                    raise RuntimeError(f"alias-free FIR mismatch at {k}")
        self.add_tensor(w, "xcodec2.enc.alias.filter", shared)

        wn_conv("CodecEnc.conv_blocks.0", "xcodec2.enc.codec.conv0")
        for bi in range(1, len(UP_RATIOS) + 1):
            base = f"CodecEnc.conv_blocks.{bi}.block"
            for ri in range(len(DILATIONS)):
                rb = f"{base}.{ri}.block"
                o = f"xcodec2.enc.codec.b{bi}.r{ri}"
                snake(f"{rb}.0.act", o + ".act1")
                wn_conv(f"{rb}.1", o + ".conv1")
                snake(f"{rb}.2.act", o + ".act2")
                wn_conv(f"{rb}.3", o + ".conv2")
            snake(f"{base}.3.act", f"xcodec2.enc.codec.b{bi}.act")
            wn_conv(f"{base}.4", f"xcodec2.enc.codec.b{bi}.down")
        snake("CodecEnc.conv_final_block.0.act", "xcodec2.enc.codec.final.act")
        wn_conv("CodecEnc.conv_final_block.1", "xcodec2.enc.codec.final.conv")

        # ---- W2V-BERT semantic slice ----
        self.add_tensor(w, "xcodec2.w2v.feat_ln.w",
                        T("semantic_model.feature_projection.layer_norm.weight"))
        self.add_tensor(w, "xcodec2.w2v.feat_ln.b",
                        T("semantic_model.feature_projection.layer_norm.bias"))
        lin("semantic_model.feature_projection.projection", "xcodec2.w2v.feat_proj")
        hf_map = {
            "ffn1_ln": "ffn1_layer_norm", "ffn1.fc1": "ffn1.intermediate_dense",
            "ffn1.fc2": "ffn1.output_dense", "attn_ln": "self_attn_layer_norm",
            "attn.q": "self_attn.linear_q", "attn.k": "self_attn.linear_k",
            "attn.v": "self_attn.linear_v", "attn.o": "self_attn.linear_out",
            "conv.ln": "conv_module.layer_norm",
            "conv.dw_ln": "conv_module.depthwise_layer_norm",
            "ffn2_ln": "ffn2_layer_norm", "ffn2.fc1": "ffn2.intermediate_dense",
            "ffn2.fc2": "ffn2.output_dense", "final_ln": "final_layer_norm",
        }
        w2v_layers = count_layers(sd, "semantic_model.encoder.layers.{}.ffn1_layer_norm.weight")
        for li in range(w2v_layers):
            base = f"semantic_model.encoder.layers.{li}"
            o = f"xcodec2.w2v.l{li}"
            for mine, hf in hf_map.items():
                lin(f"{base}.{hf}", f"{o}.{mine}")
            self.add_tensor(w, f"{o}.attn.dist.w",
                            T(f"{base}.self_attn.distance_embedding.weight"))
            for mine, hf in (("conv.pw1", "conv_module.pointwise_conv1"),
                             ("conv.dw", "conv_module.depthwise_conv"),
                             ("conv.pw2", "conv_module.pointwise_conv2")):
                self.add_tensor(w, f"{o}.{mine}.w", T(f"{base}.{hf}.weight"))

        # ---- SemanticEncoder + fc_prior + project_in ----
        self.add_tensor(w, "xcodec2.sem.initial.w",
                        T("SemanticEncoder_module.initial_conv.weight"))
        for n, src in (("r1", "residual_blocks.1"), ("r3", "residual_blocks.3")):
            self.add_tensor(w, f"xcodec2.sem.{n}.w",
                            T(f"SemanticEncoder_module.{src}.weight"))
            self.add_tensor(w, f"xcodec2.sem.{n}.b",
                            T(f"SemanticEncoder_module.{src}.bias"))
        self.add_tensor(w, "xcodec2.sem.final.w",
                        T("SemanticEncoder_module.final_conv.weight"))
        lin("fc_prior", "xcodec2.enc.fc_prior")
        lin("generator.quantizer.project_in", "xcodec2.enc.quant.project_in")

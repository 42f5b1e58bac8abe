"""BlueMagpie AudioVAE checkpoint → codec GGUF (reference:
scripts/converters/bluemagpie.py — causal encoder/decoder with weight-norm
snake residual units, per-block sr_cond scale/bias baked for the 48 kHz
bucket; optional continuous-CFM LM section with fused QKV/gate-up MiniCPM
stacks and a baked LongRoPE table)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register
from .xcodec2 import apply_weight_norm

SR_BUCKET_48K = 3


@register("bluemagpie_audiovae", "bluemagpie")
class BlueMagpieConverter(BaseConverter):
    architecture = "bluemagpie_audiovae"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.lm_state: Optional[Dict[str, np.ndarray]] = None

    def set_lm(self, state_dict) -> None:
        """Barbet TTS LM weights (LocEnc/LocDiT/RALM/FSQ/...); keys as in
        the upstream checkpoint minus the `base_lm.` backbone."""
        self.lm_state = {k: np.asarray(v) for k, v in state_dict.items()
                         if not k.startswith("base_lm.")}

    def write_metadata(self, w: GGUFWriter) -> None:
        cfg = self.config
        rates = list(cfg["decoder_rates"])
        w.add_name("BlueMagpie-AudioVAE")
        w.add_uint32("codec.sample_rate", int(cfg["out_sample_rate"]))
        w.add_uint32("codec.encode_sample_rate", int(cfg["sample_rate"]))
        w.add_uint32("codec.hop_size", int(np.prod(cfg["encoder_rates"])))
        w.add_uint32("codec.decode_hop_size", int(np.prod(rates)))
        w.add_uint32("codec.latent_dim", int(cfg["latent_dim"]))
        w.add_uint32("codec.n_q", 0)
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        w.add_bool("codec.continuous_latent", True)
        w.add_array("bluemagpie.decoder_rates", rates)
        w.add_array("bluemagpie.encoder_rates", list(cfg["encoder_rates"]))
        w.add_uint32("bluemagpie.decoder_dim", int(cfg["decoder_dim"]))
        w.add_uint32("bluemagpie.encoder_dim", int(cfg["encoder_dim"]))
        w.add_bool("bluemagpie.depthwise", True)
        if self.lm_state is not None:
            w.add_bool("codec.lm.has_adaptor", True)
            w.add_string("codec.lm.kind", "continuous_latent_cfm")
            w.add_string("codec.lm.host_arch", "barbet")
            for k, kv in (("hidden_dim", "h_barbet"), ("h_vox", "h_vox"),
                          ("h_enc", "h_enc"), ("h_dit", "h_dit"),
                          ("patch_size", "patch_size"),
                          ("latent_dim", "feat_dim"), ("n_locenc", "n_locenc"),
                          ("n_locdit", "n_locdit"), ("n_ralm", "n_ralm"),
                          ("n_heads", "n_heads"), ("n_kv", "n_kv"),
                          ("head_dim", "kv_channels"),
                          ("fsq_latent", "fsq_latent"),
                          ("fsq_scale", "fsq_scale"),
                          ("speaker_dim", "speaker_dim")):
                if kv in cfg:
                    w.add_uint32(f"codec.lm.{k}", int(cfg[kv]))
            if "rms_eps" in cfg:
                w.add_float32("codec.lm.rms_eps", float(cfg["rms_eps"]))
            if "cfm" in cfg:
                w.add_float32("codec.lm.cfm_sigma_min",
                              float(cfg["cfm"]["sigma_min"]))
                w.add_string("codec.lm.cfm_solver", str(cfg["cfm"]["solver"]))
            if "rope_theta" in cfg:
                w.add_float32("codec.lm.rope_theta", float(cfg["rope_theta"]))

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict
        cfg = self.config
        T = lambda n: np.asarray(sd[n])

        def wn(src, dst):
            mat = apply_weight_norm(T(src + ".weight_v"), T(src + ".weight_g"))
            self.add_tensor(w, dst + ".w", mat)
            if src + ".bias" in sd:
                self.add_tensor(w, dst + ".b", T(src + ".bias"))

        def alpha(src, dst):
            self.add_tensor(w, dst + ".alpha",
                            T(src + ".alpha").reshape(-1).astype(np.float32))

        def residual_unit(src, dst):
            alpha(src + ".block.0", dst + ".act1")
            wn(src + ".block.1", dst + ".conv1")
            alpha(src + ".block.2", dst + ".act2")
            wn(src + ".block.3", dst + ".conv2")

        rates = list(cfg["decoder_rates"])
        wn("decoder.model.0", "bluemagpie.dec.conv_in_dw")
        wn("decoder.model.1", "bluemagpie.dec.conv_in_pw")
        for bi in range(len(rates)):
            idx = bi + 2
            base = f"decoder.model.{idx}.block"
            o = f"bluemagpie.dec.b{bi}"
            self.add_tensor(w, o + ".cond.scale", T(
                f"decoder.sr_cond_model.{idx}.scale_embed.weight"
            )[SR_BUCKET_48K].astype(np.float32))
            self.add_tensor(w, o + ".cond.bias", T(
                f"decoder.sr_cond_model.{idx}.bias_embed.weight"
            )[SR_BUCKET_48K].astype(np.float32))
            alpha(base + ".0", o + ".act")
            wn(base + ".1", o + ".convtr")
            for ri in range(3):
                residual_unit(f"{base}.{ri + 2}", f"{o}.r{ri}")
        n_blocks = len(rates)
        alpha(f"decoder.model.{n_blocks + 2}", "bluemagpie.dec.act_final")
        wn(f"decoder.model.{n_blocks + 3}", "bluemagpie.dec.conv_out")

        wn("encoder.block.0", "bluemagpie.enc.conv0")
        for bi in range(1, len(cfg["encoder_rates"]) + 1):
            base = f"encoder.block.{bi}.block"
            o = f"bluemagpie.enc.b{bi}"
            for ri in range(3):
                residual_unit(f"{base}.{ri}", f"{o}.r{ri}")
            alpha(f"{base}.3", o + ".act")
            wn(f"{base}.4", o + ".down")
        wn("encoder.fc_mu", "bluemagpie.enc.fc_mu")

        if self.lm_state is not None:
            self._write_lm(w)

    # -- continuous-CFM LM section ----------------------------------------
    def _write_lm(self, w) -> None:
        lm = self.lm_state
        cfg = self.config
        L = lambda n: np.asarray(lm[n])

        def lin(src, dst, bias=False):
            self.add_tensor(w, dst + ".w", L(src + ".weight"))
            if bias and src + ".bias" in lm:
                self.add_tensor(w, dst + ".b", L(src + ".bias"))

        def norm(src, dst):
            self.add_tensor(w, dst + ".w", L(src + ".weight"))

        def minicpm(src, dst, n_layers):
            for i in range(n_layers):
                s, o = f"{src}.layers.{i}", f"{dst}.layers.{i}"
                qkv = np.concatenate([L(f"{s}.self_attn.q_proj.weight"),
                                      L(f"{s}.self_attn.k_proj.weight"),
                                      L(f"{s}.self_attn.v_proj.weight")], 0)
                self.add_tensor(w, o + ".attn_qkv.w", qkv)
                lin(f"{s}.self_attn.o_proj", o + ".attn_o")
                gu = np.concatenate([L(f"{s}.mlp.gate_proj.weight"),
                                     L(f"{s}.mlp.up_proj.weight")], 0)
                self.add_tensor(w, o + ".gate_up.w", gu)
                lin(f"{s}.mlp.down_proj", o + ".down")
                norm(f"{s}.input_layernorm", o + ".ln1")
                norm(f"{s}.post_attention_layernorm", o + ".ln2")

        lin("feat_encoder.in_proj", "lm.locenc.in_proj", bias=True)
        self.add_tensor(w, "lm.locenc.special_token",
                        L("feat_encoder.special_token").reshape(-1))
        minicpm("feat_encoder.encoder", "lm.locenc", int(cfg["n_locenc"]))
        norm("feat_encoder.encoder.norm", "lm.locenc.norm")

        est = "feat_decoder.estimator"
        for src, dst in ((f"{est}.in_proj", "lm.locdit.in_proj"),
                         (f"{est}.cond_proj", "lm.locdit.cond_proj"),
                         (f"{est}.out_proj", "lm.locdit.out_proj"),
                         (f"{est}.time_mlp.linear_1", "lm.locdit.time_mlp.l1"),
                         (f"{est}.time_mlp.linear_2", "lm.locdit.time_mlp.l2"),
                         (f"{est}.delta_time_mlp.linear_1", "lm.locdit.dtime_mlp.l1"),
                         (f"{est}.delta_time_mlp.linear_2", "lm.locdit.dtime_mlp.l2")):
            lin(src, dst, bias=True)
        minicpm(f"{est}.decoder", "lm.locdit", int(cfg["n_locdit"]))
        norm(f"{est}.decoder.norm", "lm.locdit.norm")

        minicpm("residual_lm", "lm.ralm", int(cfg["n_ralm"]))
        norm("residual_lm.norm", "lm.ralm.norm")

        for src, dst in (("fsq_layer.in_proj", "lm.fsq.in_proj"),
                         ("fsq_layer.out_proj", "lm.fsq.out_proj"),
                         ("enc_to_lm_proj", "lm.proj.enc_to_lm"),
                         ("lm_to_dit_proj", "lm.proj.lm_to_dit"),
                         ("res_to_dit_proj", "lm.proj.res_to_dit"),
                         ("fusion_concat_proj", "lm.proj.fusion_concat"),
                         ("enc_to_tslm_proj", "lm.proj.enc_to_tslm"),
                         ("stop_proj", "lm.stop.proj"),
                         ("speaker_projector.proj", "lm.speaker.proj"),
                         ("tslm_adapter.proj", "lm.tslm_adapter.proj"),
                         ("tslm_adapter.blocks.0.gate_proj",
                          "lm.tslm_adapter.blk0.gate"),
                         ("tslm_adapter.blocks.0.up_proj",
                          "lm.tslm_adapter.blk0.up"),
                         ("tslm_adapter.blocks.0.down_proj",
                          "lm.tslm_adapter.blk0.down")):
            lin(src, dst, bias=True)
        self.add_tensor(w, "lm.stop.head.w", L("stop_head.weight"))
        norm("speaker_projector.norm", "lm.speaker.norm")
        norm("tslm_adapter.norm", "lm.tslm_adapter.norm")
        norm("tslm_adapter.blocks.0.norm", "lm.tslm_adapter.blk0.ln")

        # baked LongRoPE cos/sin (short_factor branch)
        head_dim = int(cfg["kv_channels"])
        n_pos = 16
        short = np.asarray(cfg["rope_short_factor"], np.float64)
        inv_freq = 1.0 / (float(cfg["rope_theta"]) **
                          (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        scale = cfg["max_position_embeddings"] / cfg["rope_orig_max"]
        scaling = (float(np.sqrt(1 + np.log(scale) /
                                 np.log(cfg["rope_orig_max"])))
                   if scale > 1 else 1.0)
        t = np.arange(n_pos, dtype=np.float64)
        freqs = np.outer(t, 1.0 / short) * inv_freq[None, :]
        emb = np.concatenate([freqs, freqs], axis=-1)
        self.add_tensor(w, "lm.rope.cos", (np.cos(emb) * scaling).astype(np.float32))
        self.add_tensor(w, "lm.rope.sin", (np.sin(emb) * scaling).astype(np.float32))
        self.add_tensor(w, "lm.rope.short_factor", short.astype(np.float32))
        w.add_float32("codec.lm.rope_attn_factor", scaling)

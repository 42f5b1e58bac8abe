"""Chatterbox S3Tokenizer / S3Gen checkpoint → codec GGUF (reference:
scripts/converters/chatterbox.py — tokenizer.* slice for s3t, the full
flow/CFM/HiFT map for s3g with builtin conds baked from conds.pt, and the
VoiceEncoder speaker section with a librosa-equivalent mel basis)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..dsp.audio import mel_filter_bank
from ..io.gguf import GGUFWriter
from .base import BaseConverter
from .registry import register

# VoiceEncoder constants (reference chatterbox.py:64-79)
VE = dict(num_mels=40, hidden=256, layers=3, embed=256, sample_rate=16000,
          n_fft=400, hop=160, win=400, partial_frames=160, final_relu=True,
          overlap=0.5, rate=1.3, min_coverage=0.8, trim_top_db=20.0)
S3G_FLOW_BLOCKS, S3G_FLOW_UP_BLOCKS = 6, 4
S3G_CFM_MID, S3G_CFM_TPB = 12, 4
S3G_HIFT_F0_LAYERS, S3G_HIFT_UPS = 5, 3


def ve_mel_basis() -> np.ndarray:
    """librosa.filters.mel(16000, 400, 40, fmin=0, fmax=8000) equivalent
    (slaney scale + slaney norm)."""
    return mel_filter_bank(VE["n_fft"] // 2 + 1, VE["num_mels"],
                           min_frequency=0.0, max_frequency=8000.0,
                           sampling_rate=VE["sample_rate"], norm="slaney",
                           mel_scale="slaney").T.astype(np.float32)


def ve_hann() -> np.ndarray:
    n = VE["win"]
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _common_meta(w: GGUFWriter, name: str, cfg: Dict[str, Any]) -> None:
    w.add_name(name)
    w.add_uint32("codec.sample_rate", int(cfg["sample_rate"]))
    if "encode_sample_rate" in cfg:
        w.add_uint32("codec.encode_sample_rate", int(cfg["encode_sample_rate"]))
    w.add_uint32("codec.hop_size", int(cfg["hop_size"]))
    w.add_uint32("codec.n_q", int(cfg["n_q"]))
    w.add_uint32("codec.codebook_size", int(cfg["codebook_size"]))
    w.add_bool("codec.has_encoder", bool(cfg["has_encoder"]))
    w.add_bool("codec.has_decoder", bool(cfg["has_decoder"]))
    for k in ("n_fft", "win_length", "n_mels", "token_rate_hz"):
        if k in cfg:
            w.add_uint32(f"codec.{k}", int(cfg[k]))


@register("chatterbox_s3t")
class ChatterboxS3TConverter(BaseConverter):
    architecture = "chatterbox_s3t"

    DEFAULTS = dict(sample_rate=24000, encode_sample_rate=16000, hop_size=960,
                    n_q=1, codebook_size=6561, n_fft=400, win_length=400,
                    n_mels=128, token_rate_hz=25, audio_state=1280,
                    audio_head=20, audio_layer=6, fsmn_kernel_size=31,
                    rope_theta=10000.0, has_encoder=True, has_decoder=False)

    def load_from_state_dict(self, state_dict, config) -> None:
        cfg = dict(self.DEFAULTS)
        cfg.update(config or {})
        sd = {k: np.asarray(v) for k, v in state_dict.items()
              if k.startswith("tokenizer.")}
        if not sd:
            raise ValueError("checkpoint has no tokenizer.* weights")
        super().load_from_state_dict(sd, cfg)

    def write_metadata(self, w: GGUFWriter) -> None:
        cfg = self.config
        _common_meta(w, "Chatterbox-S3T", cfg)
        for k in ("audio_state", "audio_head", "audio_layer",
                  "fsmn_kernel_size"):
            w.add_uint32(f"chatterbox_s3t.{k}", int(cfg[k]))
        w.add_float32("chatterbox_s3t.rope_theta", float(cfg["rope_theta"]))

    def write_tensors(self, w: GGUFWriter) -> None:
        sd = self.state_dict

        def add(name, key):
            self.add_tensor(w, name, np.asarray(sd[key]))

        add("s3t.mel_filters", "tokenizer._mel_filters")
        if "tokenizer.window" in sd:
            add("s3t.window", "tokenizer.window")
        for c in ("conv1", "conv2"):
            add(f"s3t.enc.{c}.w", f"tokenizer.encoder.{c}.weight")
            add(f"s3t.enc.{c}.b", f"tokenizer.encoder.{c}.bias")
        for li in range(int(self.config["audio_layer"])):
            p, d = f"tokenizer.encoder.blocks.{li}", f"s3t.enc.blk.{li}"
            pairs = (
                ("attn_ln.w", "attn_ln.weight"), ("attn_ln.b", "attn_ln.bias"),
                ("attn.q.w", "attn.query.weight"), ("attn.q.b", "attn.query.bias"),
                ("attn.k.w", "attn.key.weight"),
                ("attn.v.w", "attn.value.weight"), ("attn.v.b", "attn.value.bias"),
                ("attn.o.w", "attn.out.weight"), ("attn.o.b", "attn.out.bias"),
                ("attn.fsmn.w", "attn.fsmn_block.weight"),
                ("mlp_ln.w", "mlp_ln.weight"), ("mlp_ln.b", "mlp_ln.bias"),
                ("mlp.fc1.w", "mlp.0.weight"), ("mlp.fc1.b", "mlp.0.bias"),
                ("mlp.fc2.w", "mlp.2.weight"), ("mlp.fc2.b", "mlp.2.bias"),
            )
            for dst, src in pairs:
                add(f"{d}.{dst}", f"{p}.{src}")
        add("s3t.q.proj.w", "tokenizer.quantizer._codebook.project_down.weight")
        add("s3t.q.proj.b", "tokenizer.quantizer._codebook.project_down.bias")


def _take(state: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in state:
        raise KeyError(f"missing S3G tensor: {key}")
    return state.pop(key)


def build_s3g_tensor_map(state: Dict[str, np.ndarray],
                         meanflow: bool = False,
                         flow_blocks: int = S3G_FLOW_BLOCKS,
                         flow_up_blocks: int = S3G_FLOW_UP_BLOCKS,
                         cfm_mid: int = S3G_CFM_MID,
                         cfm_tpb: int = S3G_CFM_TPB
                         ) -> List[Tuple[str, np.ndarray]]:
    """S3Gen state_dict → stable wire names (reference
    _build_s3g_tensor_map). Raises on leftover (unmapped) tensors."""
    state = dict(state)
    out: List[Tuple[str, np.ndarray]] = []
    for key in list(state):
        if key.startswith(("tokenizer.", "speaker_encoder.")):
            del state[key]

    def emit(dst, src):
        out.append((dst, _take(state, src)))

    emit("s3g.flow.input_emb.w", "flow.input_embedding.weight")
    emit("s3g.flow.spk_aff.w", "flow.spk_embed_affine_layer.weight")
    emit("s3g.flow.spk_aff.b", "flow.spk_embed_affine_layer.bias")
    emit("s3g.flow.proj.w", "flow.encoder_proj.weight")
    emit("s3g.flow.proj.b", "flow.encoder_proj.bias")
    for dst, src in (("embed", "embed"), ("up_embed", "up_embed")):
        emit(f"s3g.flow.enc.{dst}.lin.w", f"flow.encoder.{src}.out.0.weight")
        emit(f"s3g.flow.enc.{dst}.lin.b", f"flow.encoder.{src}.out.0.bias")
        emit(f"s3g.flow.enc.{dst}.ln.w", f"flow.encoder.{src}.out.1.weight")
        emit(f"s3g.flow.enc.{dst}.ln.b", f"flow.encoder.{src}.out.1.bias")
    emit("s3g.flow.enc.after_norm.w", "flow.encoder.after_norm.weight")
    emit("s3g.flow.enc.after_norm.b", "flow.encoder.after_norm.bias")
    for c in ("cv1", "cv2"):
        src_c = "conv1" if c == "cv1" else "conv2"
        emit(f"s3g.flow.enc.pre.{c}.w",
             f"flow.encoder.pre_lookahead_layer.{src_c}.weight")
        emit(f"s3g.flow.enc.pre.{c}.b",
             f"flow.encoder.pre_lookahead_layer.{src_c}.bias")
    emit("s3g.flow.enc.up.w", "flow.encoder.up_layer.conv.weight")
    emit("s3g.flow.enc.up.b", "flow.encoder.up_layer.conv.bias")

    def conformer(src, dst):
        a, f = src + ".self_attn", src + ".feed_forward"
        for d, s in (("norm_mha.w", src + ".norm_mha.weight"),
                     ("norm_mha.b", src + ".norm_mha.bias"),
                     ("norm_ff.w", src + ".norm_ff.weight"),
                     ("norm_ff.b", src + ".norm_ff.bias"),
                     ("attn.q.w", a + ".linear_q.weight"),
                     ("attn.q.b", a + ".linear_q.bias"),
                     ("attn.k.w", a + ".linear_k.weight"),
                     ("attn.k.b", a + ".linear_k.bias"),
                     ("attn.v.w", a + ".linear_v.weight"),
                     ("attn.v.b", a + ".linear_v.bias"),
                     ("attn.o.w", a + ".linear_out.weight"),
                     ("attn.o.b", a + ".linear_out.bias"),
                     ("attn.pos.w", a + ".linear_pos.weight"),
                     ("attn.pbu", a + ".pos_bias_u"),
                     ("attn.pbv", a + ".pos_bias_v"),
                     ("ff.w1.w", f + ".w_1.weight"),
                     ("ff.w1.b", f + ".w_1.bias"),
                     ("ff.w2.w", f + ".w_2.weight"),
                     ("ff.w2.b", f + ".w_2.bias")):
            emit(f"{dst}.{d}", s)

    for li in range(flow_blocks):
        conformer(f"flow.encoder.encoders.{li}", f"s3g.flow.enc.blk.{li}")
    for li in range(flow_up_blocks):
        conformer(f"flow.encoder.up_encoders.{li}", f"s3g.flow.enc.up_blk.{li}")

    est = "flow.decoder.estimator"
    emit("s3g.cfm.t.l1.w", est + ".time_mlp.linear_1.weight")
    emit("s3g.cfm.t.l1.b", est + ".time_mlp.linear_1.bias")
    emit("s3g.cfm.t.l2.w", est + ".time_mlp.linear_2.weight")
    emit("s3g.cfm.t.l2.b", est + ".time_mlp.linear_2.bias")
    if meanflow:
        emit("s3g.cfm.t_mix.w", est + ".time_embed_mixer.weight")

    def cfm_resnet(src, dst):
        for d, s in (("b1.cv.w", ".block1.block.0.weight"),
                     ("b1.cv.b", ".block1.block.0.bias"),
                     ("b1.ln.w", ".block1.block.2.weight"),
                     ("b1.ln.b", ".block1.block.2.bias"),
                     ("b2.cv.w", ".block2.block.0.weight"),
                     ("b2.cv.b", ".block2.block.0.bias"),
                     ("b2.ln.w", ".block2.block.2.weight"),
                     ("b2.ln.b", ".block2.block.2.bias"),
                     ("mlp.w", ".mlp.1.weight"), ("mlp.b", ".mlp.1.bias"),
                     ("res.w", ".res_conv.weight"), ("res.b", ".res_conv.bias")):
            emit(f"{dst}.{d}", src + s)

    def cfm_transformer(src, dst):
        a = src + ".attn1"
        for d, s in (("norm1.w", src + ".norm1.weight"),
                     ("norm1.b", src + ".norm1.bias"),
                     ("norm3.w", src + ".norm3.weight"),
                     ("norm3.b", src + ".norm3.bias"),
                     ("attn.q.w", a + ".to_q.weight"),
                     ("attn.k.w", a + ".to_k.weight"),
                     ("attn.v.w", a + ".to_v.weight"),
                     ("attn.o.w", a + ".to_out.0.weight"),
                     ("attn.o.b", a + ".to_out.0.bias"),
                     ("ff.w1.w", src + ".ff.net.0.proj.weight"),
                     ("ff.w1.b", src + ".ff.net.0.proj.bias"),
                     ("ff.w2.w", src + ".ff.net.2.weight"),
                     ("ff.w2.b", src + ".ff.net.2.bias")):
            emit(f"{dst}.{d}", s)

    for group, short, n_blocks, trailing in (
            ("down_blocks", "dn", 1, True), ("mid_blocks", "md", cfm_mid, False),
            ("up_blocks", "up", 1, True)):
        for bi in range(n_blocks):
            src_b = f"{est}.{group}.{bi}"
            dst_b = f"s3g.cfm.{short}.{bi}"
            cfm_resnet(src_b + ".0", dst_b + ".r")
            for ti in range(cfm_tpb):
                cfm_transformer(f"{src_b}.1.{ti}", f"{dst_b}.t.{ti}")
            if trailing:
                emit(dst_b + ".x.w", src_b + ".2.weight")
                emit(dst_b + ".x.b", src_b + ".2.bias")

    emit("s3g.cfm.final.cv.w", est + ".final_block.block.0.weight")
    emit("s3g.cfm.final.cv.b", est + ".final_block.block.0.bias")
    emit("s3g.cfm.final.ln.w", est + ".final_block.block.2.weight")
    emit("s3g.cfm.final.ln.b", est + ".final_block.block.2.bias")
    emit("s3g.cfm.proj.w", est + ".final_proj.weight")
    emit("s3g.cfm.proj.b", est + ".final_proj.bias")

    for li in range(S3G_HIFT_F0_LAYERS):
        emit(f"s3g.hift.f0.cn.{li}.w",
             f"mel2wav.f0_predictor.condnet.{li * 2}.weight")
        emit(f"s3g.hift.f0.cn.{li}.b",
             f"mel2wav.f0_predictor.condnet.{li * 2}.bias")
    emit("s3g.hift.f0.cls.w", "mel2wav.f0_predictor.classifier.weight")
    emit("s3g.hift.f0.cls.b", "mel2wav.f0_predictor.classifier.bias")
    emit("s3g.hift.src.lin.w", "mel2wav.m_source.l_linear.weight")
    emit("s3g.hift.src.lin.b", "mel2wav.m_source.l_linear.bias")
    emit("s3g.hift.conv_pre.w", "mel2wav.conv_pre.weight")
    emit("s3g.hift.conv_pre.b", "mel2wav.conv_pre.bias")
    emit("s3g.hift.conv_post.w", "mel2wav.conv_post.weight")
    emit("s3g.hift.conv_post.b", "mel2wav.conv_post.bias")

    def resblock(src, dst):
        for k in range(3):
            emit(f"{dst}.cv1.{k}.w", f"{src}.convs1.{k}.weight")
            emit(f"{dst}.cv1.{k}.b", f"{src}.convs1.{k}.bias")
            emit(f"{dst}.cv2.{k}.w", f"{src}.convs2.{k}.weight")
            emit(f"{dst}.cv2.{k}.b", f"{src}.convs2.{k}.bias")
            emit(f"{dst}.a1.{k}", f"{src}.activations1.{k}.alpha")
            emit(f"{dst}.a2.{k}", f"{src}.activations2.{k}.alpha")

    for ui in range(S3G_HIFT_UPS):
        emit(f"s3g.hift.up.{ui}.w", f"mel2wav.ups.{ui}.weight")
        emit(f"s3g.hift.up.{ui}.b", f"mel2wav.ups.{ui}.bias")
        emit(f"s3g.hift.src_dn.{ui}.w", f"mel2wav.source_downs.{ui}.weight")
        emit(f"s3g.hift.src_dn.{ui}.b", f"mel2wav.source_downs.{ui}.bias")
        resblock(f"mel2wav.source_resblocks.{ui}", f"s3g.hift.src_rb.{ui}")
        for ki in range(3):
            resblock(f"mel2wav.resblocks.{ui * 3 + ki}",
                     f"s3g.hift.rb.{ui * 3 + ki}")

    leftovers = sorted(state)
    if leftovers:
        raise RuntimeError(f"unmapped S3G tensors: {leftovers[:20]}"
                           f" (+{max(0, len(leftovers) - 20)} more)")
    return out


@register("chatterbox_s3g")
class ChatterboxS3GConverter(BaseConverter):
    architecture = "chatterbox_s3g"

    DEFAULTS = dict(sample_rate=24000, hop_size=960, n_q=1,
                    codebook_size=6561, token_rate_hz=25, meanflow=False,
                    has_encoder=False, has_decoder=True)

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.conds: Optional[Dict[str, Any]] = None
        self.ve_state: Optional[Dict[str, np.ndarray]] = None

    def set_conds(self, prompt_token, prompt_feat, embedding,
                  prompt_token_len: Optional[int] = None) -> None:
        """Builtin conditioning (reference: conds.pt)."""
        self.conds = dict(
            prompt_token=np.asarray(prompt_token, np.int32).reshape(-1),
            prompt_feat=np.asarray(prompt_feat, np.float32),
            embedding=np.asarray(embedding, np.float32).reshape(1, -1),
            prompt_token_len=prompt_token_len)

    def set_voice_encoder(self, state_dict) -> None:
        self.ve_state = {k: np.asarray(v) for k, v in state_dict.items()}

    def load_from_state_dict(self, state_dict, config) -> None:
        cfg = dict(self.DEFAULTS)
        cfg.update(config or {})
        super().load_from_state_dict(state_dict, cfg)

    def write_metadata(self, w: GGUFWriter) -> None:
        cfg = self.config
        _common_meta(w, "Chatterbox-S3G", cfg)
        w.add_bool("chatterbox_s3g.meanflow", bool(cfg.get("meanflow", False)))
        for k in ("mel_dim", "spk_dim", "enc_hidden", "enc_layers",
                  "enc_up_layers", "attn_heads", "attn_head_dim",
                  "cfm_mid_blocks", "cfm_transformers"):
            if k in cfg:
                w.add_uint32(f"chatterbox_s3g.{k}", int(cfg[k]))
        if self.conds is not None:
            pt = self.conds["prompt_token"]
            pf = self.conds["prompt_feat"].reshape(-1, self.conds["prompt_feat"].shape[-1])
            w.add_bool("chatterbox_s3g.has_builtin_conditioning", True)
            w.add_uint32("chatterbox_s3g.cond.prompt_token_len",
                         int(self.conds["prompt_token_len"] or len(pt)))
            w.add_uint32("chatterbox_s3g.cond.prompt_feat_frames", pf.shape[0])
            w.add_uint32("chatterbox_s3g.cond.prompt_feat_dim", pf.shape[1])
            w.add_uint32("chatterbox_s3g.cond.embedding_dim",
                         self.conds["embedding"].shape[1])
            w.add_array("chatterbox_s3g.cond.prompt_token", pt.tolist())
        else:
            w.add_bool("chatterbox_s3g.has_builtin_conditioning", False)

    def write_tensors(self, w: GGUFWriter) -> None:
        cfg = self.config
        if self.conds is not None:
            pf = self.conds["prompt_feat"].reshape(
                -1, self.conds["prompt_feat"].shape[-1])
            self.add_tensor(w, "s3g.cond.prompt_feat", pf.astype(np.float32))
            self.add_tensor(w, "s3g.cond.embedding",
                            self.conds["embedding"].astype(np.float32))
        tmap = build_s3g_tensor_map(
            self.state_dict, meanflow=bool(cfg.get("meanflow", False)),
            flow_blocks=int(cfg.get("enc_layers", S3G_FLOW_BLOCKS)),
            flow_up_blocks=int(cfg.get("enc_up_layers", S3G_FLOW_UP_BLOCKS)),
            cfm_mid=int(cfg.get("cfm_mid_blocks", S3G_CFM_MID)),
            cfm_tpb=int(cfg.get("cfm_transformers", S3G_CFM_TPB)))
        for name, arr in tmap:
            self.add_tensor(w, name, arr)
        if self.ve_state is not None:
            self._write_speaker_section(w)

    def _write_speaker_section(self, w: GGUFWriter) -> None:
        ve = self.ve_state
        for l in range(VE["layers"]):
            for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                dst = part.replace("weight_", "W_").replace("bias_", "b_")
                self.add_tensor(w, f"speaker.voice_encoder.lstm_{l}.{dst}",
                                np.asarray(ve[f"lstm.{part}_l{l}"]))
        self.add_tensor(w, "speaker.voice_encoder.proj.weight",
                        np.asarray(ve["proj.weight"]))
        self.add_tensor(w, "speaker.voice_encoder.proj.bias",
                        np.asarray(ve["proj.bias"]))
        self.add_tensor(w, "speaker.voice_encoder.mel_basis", ve_mel_basis())
        self.add_tensor(w, "speaker.voice_encoder.window", ve_hann())
        w.add_bool("codec.speaker.has_encoder", True)
        w.add_uint32("codec.speaker.n_rows", 34)
        w.add_uint32("codec.speaker.hidden_dim",
                     int(self.config.get("lm_hidden_dim", 1024)))
        w.add_bool("codec.speaker.needs_ref_pcm", True)
        w.add_bool("codec.speaker.needs_ref_speech_tokens", True)
        w.add_bool("codec.speaker.needs_emotion_scalar", True)
        w.add_uint32("codec.speaker.ref_sample_rate", VE["sample_rate"])
        w.add_uint32("codec.speaker.speaker_emb_dim", VE["embed"])
        w.add_float32("codec.speaker.emotion_default", 0.5)
        w.add_string("codec.speaker.encoder_arch", "chatterbox_voice_encoder")
        w.add_uint32("codec.speaker.ve.num_mels", VE["num_mels"])
        w.add_uint32("codec.speaker.ve.hidden_size", VE["hidden"])
        w.add_uint32("codec.speaker.ve.num_layers", VE["layers"])
        w.add_uint32("codec.speaker.ve.speaker_embed_dim", VE["embed"])
        w.add_uint32("codec.speaker.ve.n_fft", VE["n_fft"])
        w.add_uint32("codec.speaker.ve.hop_size", VE["hop"])
        w.add_uint32("codec.speaker.ve.win_size", VE["win"])
        w.add_uint32("codec.speaker.ve.partial_frames", VE["partial_frames"])
        w.add_bool("codec.speaker.ve.final_relu", VE["final_relu"])
        w.add_float32("codec.speaker.ve.overlap", VE["overlap"])
        w.add_float32("codec.speaker.ve.rate", VE["rate"])
        w.add_float32("codec.speaker.ve.min_coverage", VE["min_coverage"])
        w.add_float32("codec.speaker.ve.trim_top_db", VE["trim_top_db"])

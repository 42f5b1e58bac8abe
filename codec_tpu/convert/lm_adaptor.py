"""LM-adaptor dump helpers: write `lm.*` tensors + `codec.lm.*` metadata for
a TTS model family into a codec GGUF.

Reference behavior: scripts/converters/lm_adaptor/* — a codec converter
owns the GGUFWriter; when the user also supplies an LM source checkpoint,
`dump_lm_into` dispatches on `config.architectures[0]` and the per-family
writer appends the adaptor section (the backbone transformer itself stays
external, exactly as in the reference, where it is a llama.cpp GGUF).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def dump_lm_into(writer, sd: Dict[str, np.ndarray], cfg: Dict[str, Any],
                 arch: Optional[str] = None) -> None:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    archs = cfg.get("architectures") or []
    arch = arch or (archs[0] if archs else "")
    if arch in ("MossTTSDForCausalLM", "MossTTSDelayModel", "AsteroidTTSModel"):
        return dump_moss_ttsd(writer, sd, cfg, arch)
    if arch == "Qwen3TTSForConditionalGeneration":
        return dump_qwen3_tts(writer, sd, cfg)
    if arch == "CsmForConditionalGeneration":
        return dump_csm(writer, sd, cfg)
    if arch == "MoshiForConditionalGeneration":
        return dump_moshi(writer, sd, cfg)
    if arch == "Lfm2AudioForConditionalGeneration":
        return dump_lfm2_audio(writer, sd, cfg)
    if arch == "MossTTSRealtime":
        return dump_moss_tts_realtime(writer, sd, cfg)
    if arch == "ChatterboxT3":
        return dump_chatterbox_t3(writer, sd, cfg)
    raise NotImplementedError(f"unsupported LM-source architecture: {arch!r}")


def _f32(x) -> np.ndarray:
    return np.asarray(x).astype(np.float32)


def _req(sd, key) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"missing LM tensor: {key}")
    return np.asarray(sd[key])


# ---------------------------------------------------------------------
# MOSS-TTSD family (parallel_heads_delay, tied heads)
# ---------------------------------------------------------------------

def dump_moss_ttsd(w, sd, cfg, arch_name: str) -> None:
    """reference: lm_adaptor/moss_ttsd.py."""
    if arch_name in ("MossTTSDForCausalLM", "AsteroidTTSModel"):
        n_cb = int(cfg["channels"])
        hidden = int(cfg["hidden_size"])
        if "vocab_size_list" in cfg:
            sizes = [int(v) for v in cfg["vocab_size_list"]]
        else:
            sizes = [int(cfg["vocab_size"])] + \
                [int(cfg.get("speech_vocab_size", 1025))] * (n_cb - 1)
        embd_keys = [f"model.embedding_list.{i}.weight" for i in range(n_cb)]
        host = "qwen3"
        if any("Qwen3MoE" in a for a in
               (cfg.get("language_config", {}).get("architectures") or [])):
            host = "qwen3moe"
    else:                                           # MossTTSDelayModel (v1.0)
        lcfg = cfg["language_config"]
        n_vq = int(cfg["n_vq"])
        n_cb = 1 + n_vq
        hidden = int(lcfg["hidden_size"])
        sizes = [int(lcfg["vocab_size"])] + \
            [int(cfg["audio_vocab_size"]) + 1] * n_vq
        embd_keys = ["language_model.embed_tokens.weight"] + \
            [f"emb_ext.{i}.weight" for i in range(n_vq)]
        host = "qwen3"

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "parallel_heads_delay")
    w.add_string("codec.lm.host_arch", host)
    w.add_uint32("codec.lm.hidden_dim", hidden)
    w.add_uint32("codec.lm.audio_embed_dim", hidden)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", sizes)
    w.add_array("codec.lm.delay_pattern", list(range(n_cb)))
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", True)

    # prompt assembly metadata (informational; reference _write_prompt_metadata)
    gen = cfg.get("generation_config", {})
    if "bos_token_id" in cfg:
        w.add_uint32("codec.lm.text_bos_id", int(cfg["bos_token_id"]))
    if "eos_token_id" in cfg:
        w.add_uint32("codec.lm.text_eos_id", int(cfg["eos_token_id"]))
        eos_c0 = int(gen.get("eos_token_id", cfg["eos_token_id"]))
        w.add_int32("codec.lm.eos_code_c0", eos_c0)
        w.add_int32("codec.lm.eos_min_step", 0)
    if "pad_token" in cfg:
        w.add_array("codec.lm.pad_token_per_channel",
                    [int(v) for v in cfg["pad_token"]])
    if "speech_token_range" in cfg:
        rng = [int(v) for v in cfg["speech_token_range"]]
        w.add_array("codec.lm.speech_token_range", rng)
        w.add_int32("codec.lm.cb0_speech_offset", rng[0])
        if len(rng) > 1:
            w.add_int32("codec.lm.cb0_speech_range_end", rng[1])
    if "speech_pad_token" in cfg:
        w.add_uint32("codec.lm.speech_pad_token", int(cfg["speech_pad_token"]))

    for i, key in enumerate(embd_keys):
        t = _f32(_req(sd, key))
        if t.shape != (sizes[i], hidden):
            raise ValueError(f"{key} shape {t.shape} != {(sizes[i], hidden)}")
        w.add_tensor(f"lm.audio_embd_{i}.weight", t, "F16")


# ---------------------------------------------------------------------
# CSM (residual_depth_ar, shared layout)
# ---------------------------------------------------------------------

def llama3_freq_factors(head_dim: int, base: float, factor: float,
                        low_freq: float, high_freq: float,
                        orig_max: int) -> np.ndarray:
    """Llama3 RoPE scaling → per-frequency division factors
    (reference: lm_adaptor/csm.py tail; ops/rope.py consumes them)."""
    inv_freq = base ** (-np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    wavelen = 2 * np.pi / inv_freq
    low_wl = orig_max / low_freq
    high_wl = orig_max / high_freq
    out = np.ones_like(inv_freq)
    out[wavelen > low_wl] = factor
    mid = (wavelen <= low_wl) & (wavelen >= high_wl)
    smooth = (orig_max / wavelen[mid] - low_freq) / (high_freq - low_freq)
    out[mid] = 1.0 / ((1 - smooth) / factor + smooth)
    return out.astype(np.float32)


_DEPTH_LAYER_MAP = [
    ("input_layernorm.weight", "attn_norm.weight"),
    ("self_attn.q_proj.weight", "q.weight"),
    ("self_attn.k_proj.weight", "k.weight"),
    ("self_attn.v_proj.weight", "v.weight"),
    ("self_attn.o_proj.weight", "o.weight"),
    ("post_attention_layernorm.weight", "ffn_norm.weight"),
    ("mlp.gate_proj.weight", "ffn_gate.weight"),
    ("mlp.up_proj.weight", "ffn_up.weight"),
    ("mlp.down_proj.weight", "ffn_down.weight"),
]


def _dump_depth_layers(w, sd, src_root: str, n_layers: int,
                       extra: tuple = ()) -> None:
    for l in range(n_layers):
        for src_suf, dst_suf in list(_DEPTH_LAYER_MAP) + list(extra):
            arr = _f32(_req(sd, f"{src_root}.{l}.{src_suf}"))
            dt = "F32" if dst_suf.endswith("_norm.weight") else "F16"
            w.add_tensor(f"lm.depth.blk_{l}.{dst_suf}", arr, dt)


def _depth_meta(w, layers, hidden, nh, nkvh, hd, inter, eps,
                rope=None, maxpos=None, **flags) -> None:
    w.add_uint32("codec.lm.residual.depth_layers", layers)
    w.add_uint32("codec.lm.residual.depth_hidden", hidden)
    w.add_uint32("codec.lm.residual.depth_n_heads", nh)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", nkvh)
    w.add_uint32("codec.lm.residual.depth_head_dim", hd)
    w.add_uint32("codec.lm.residual.depth_intermediate", inter)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", eps)
    if rope is not None:
        w.add_float32("codec.lm.residual.depth_rope_theta", rope)
    if maxpos is not None:
        w.add_uint32("codec.lm.residual.depth_max_position", maxpos)
    for k, v in flags.items():
        if isinstance(v, bool):
            w.add_bool(f"codec.lm.residual.{k}", v)
        elif isinstance(v, str):
            w.add_string(f"codec.lm.residual.{k}", v)
        elif isinstance(v, int):
            w.add_uint32(f"codec.lm.residual.{k}", v)


def dump_csm(w, sd, cfg) -> None:
    """reference: lm_adaptor/csm.py."""
    n_cb = int(cfg["audio_num_codebooks"])
    audio_v = int(cfg["audio_vocab_size"])
    backbone_h = int(cfg["hidden_size"])
    d = cfg["depth_decoder_config"]
    layers, hidden = int(d["num_hidden_layers"]), int(d["hidden_size"])
    nh, nkvh, hd = (int(d["num_attention_heads"]),
                    int(d["num_key_value_heads"]), int(d["head_dim"]))

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", backbone_h)
    w.add_uint32("codec.lm.audio_embed_dim", backbone_h)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [audio_v] * n_cb)
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", False)
    w.add_int32("codec.lm.eos_code_c0", 0)
    w.add_int32("codec.lm.eos_min_step", 1)
    _depth_meta(w, layers, hidden, nh, nkvh, hd, int(d["intermediate_size"]),
                float(d["rms_norm_eps"]), rope=float(d["rope_theta"]),
                maxpos=int(d["max_position_embeddings"]),
                depth_has_in_proj=True, depth_has_qk_norm=False,
                weight_layout="shared", c0_input_modality="audio")

    rs = d.get("rope_scaling") or {}
    if rs.get("rope_type") == "llama3":
        w.add_float32("codec.lm.residual.depth_rope_scaling_factor",
                      float(rs["factor"]))
        w.add_float32("codec.lm.residual.depth_rope_scaling_low_freq",
                      float(rs["low_freq_factor"]))
        w.add_float32("codec.lm.residual.depth_rope_scaling_high_freq",
                      float(rs["high_freq_factor"]))
        w.add_uint32("codec.lm.residual.depth_rope_scaling_orig_max_pos",
                     int(rs["original_max_position_embeddings"]))
        w.add_tensor("lm.depth.rope_freq_factors", llama3_freq_factors(
            hd, float(d["rope_theta"]), float(rs["factor"]),
            float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"])), "F32")

    embd = _req(sd, "backbone_model.embed_tokens.embed_audio_tokens.weight")
    for i in range(n_cb):
        w.add_tensor(f"lm.audio_embd_{i}.weight",
                     _f32(embd[i * audio_v:(i + 1) * audio_v]), "F16")
    w.add_tensor("lm.c0_head.weight", _f32(_req(sd, "lm_head.weight")), "F16")
    heads = _req(sd, "depth_decoder.codebooks_head.weight")   # (N-1, H_d, V)
    for i in range(n_cb - 1):
        w.add_tensor(f"lm.depth.heads_{i}.weight",
                     np.ascontiguousarray(heads[i].T).astype(np.float32), "F16")
    w.add_tensor("lm.depth.in_proj.weight", _f32(
        _req(sd, "depth_decoder.model.inputs_embeds_projector.weight")), "F16")
    _dump_depth_layers(w, sd, "depth_decoder.model.layers", layers)
    w.add_tensor("lm.depth.output_norm.weight",
                 _f32(_req(sd, "depth_decoder.model.norm.weight")), "F32")


# ---------------------------------------------------------------------
# Qwen3-TTS (residual_depth_ar + ECAPA speaker section)
# ---------------------------------------------------------------------

def dump_qwen3_tts(w, sd, cfg) -> None:
    """reference: lm_adaptor/qwen3_tts.py."""
    tk = cfg["talker_config"]
    cp = tk["code_predictor_config"]
    talker_h = int(tk["hidden_size"])
    talker_v = int(tk["vocab_size"])
    n_cb = int(tk["num_code_groups"])
    layers, hidden = int(cp["num_hidden_layers"]), int(cp["hidden_size"])
    nh, nkvh, hd = (int(cp["num_attention_heads"]),
                    int(cp["num_key_value_heads"]), int(cp["head_dim"]))
    depth_v = int(cp["vocab_size"])
    has_in_proj = talker_h != hidden

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "qwen3")
    w.add_uint32("codec.lm.hidden_dim", talker_h)
    w.add_uint32("codec.lm.audio_embed_dim", talker_h)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [talker_v] + [depth_v] * (n_cb - 1))
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", False)
    if "codec_eos_token_id" in tk:
        w.add_int32("codec.lm.eos_code_c0", int(tk["codec_eos_token_id"]))
        w.add_int32("codec.lm.eos_min_step", 0)
    if "codec_bos_id" in tk:
        w.add_int32("codec.lm.bos_code_c0", int(tk["codec_bos_id"]))
    if "codec_pad_id" in tk:
        w.add_int32("codec.lm.pad_code_c0", int(tk["codec_pad_id"]))
    for meta_key, cfg_key in (
            ("nothink_id", "codec_nothink_id"), ("think_id", "codec_think_id"),
            ("think_bos_id", "codec_think_bos_id"),
            ("think_eos_id", "codec_think_eos_id"),
            ("tts_pad_id", "tts_pad_token_id"),
            ("tts_bos_id", "tts_bos_token_id"),
            ("tts_eos_id", "tts_eos_token_id")):
        val = tk.get(cfg_key, cfg.get(cfg_key))
        if val is not None:
            w.add_int32(f"codec.lm.qwen3tts.{meta_key}", int(val))
    lang_map = tk.get("codec_language_id", cfg.get("codec_language_id")) or {}
    for lang in ("chinese", "english"):
        if lang in lang_map:
            w.add_int32(f"codec.lm.qwen3tts.language_{lang}",
                        int(lang_map[lang]))
    _depth_meta(w, layers, hidden, nh, nkvh, hd, int(cp["intermediate_size"]),
                float(cp["rms_norm_eps"]), rope=float(cp["rope_theta"]),
                maxpos=int(cp["max_position_embeddings"]),
                depth_has_in_proj=has_in_proj, depth_has_qk_norm=True,
                weight_layout="shared", c0_input_modality="audio")

    w.add_tensor("lm.audio_embd_0.weight",
                 _f32(_req(sd, "talker.model.codec_embedding.weight")), "F16")
    for i in range(n_cb - 1):
        w.add_tensor(f"lm.audio_embd_{i + 1}.weight", _f32(_req(
            sd, f"talker.code_predictor.model.codec_embedding.{i}.weight")),
            "F16")
    for part in ("fc1", "fc2"):
        src = f"talker.text_projection.linear_{part}"
        w.add_tensor(f"lm.text_projection.{part}.weight",
                     _f32(_req(sd, src + ".weight")), "F16")
        w.add_tensor(f"lm.text_projection.{part}.bias",
                     _f32(_req(sd, src + ".bias")), "F32")
    txt = _req(sd, "talker.model.text_embedding.weight")
    w.add_uint32("codec.lm.qwen3tts.text_vocab", int(txt.shape[0]))
    w.add_uint32("codec.lm.qwen3tts.text_embed_dim", int(txt.shape[1]))
    w.add_tensor("lm.text_embd.weight", _f32(txt), "F16")
    w.add_tensor("lm.c0_head.weight",
                 _f32(_req(sd, "talker.codec_head.weight")), "F16")
    for i in range(n_cb - 1):
        w.add_tensor(f"lm.depth.heads_{i}.weight", _f32(_req(
            sd, f"talker.code_predictor.lm_head.{i}.weight")), "F16")
    if has_in_proj:
        w.add_tensor("lm.depth.in_proj.weight", _f32(_req(
            sd, "talker.code_predictor.small_to_mtp_projection.weight")),
            "F16")
        bkey = "talker.code_predictor.small_to_mtp_projection.bias"
        if bkey in sd:
            w.add_tensor("lm.depth.in_proj.bias", _f32(sd[bkey]), "F32")
    _dump_depth_layers(
        w, sd, "talker.code_predictor.model.layers", layers,
        extra=(("self_attn.q_norm.weight", "q_norm.weight"),
               ("self_attn.k_norm.weight", "k_norm.weight")))
    w.add_tensor("lm.depth.output_norm.weight", _f32(_req(
        sd, "talker.code_predictor.model.norm.weight")), "F32")

    dump_qwen3_tts_speaker(w, sd, cfg)


def dump_qwen3_tts_speaker(w, sd, cfg) -> None:
    """ECAPA speaker section (reference: _dump_qwen3_tts_speaker_encoder;
    skipped for zero-shot checkpoints without speaker_encoder.*)."""
    if "speaker_encoder.blocks.0.conv.weight" not in sd:
        return
    from ..dsp.audio import mel_filter_bank

    se = cfg.get("speaker_encoder_config") or {}
    mel_dim = int(se.get("mel_dim", 128))
    enc_dim = int(se.get("enc_dim", 1024))
    enc_channels = list(se.get("enc_channels", [512, 512, 512, 512, 1536]))
    enc_kernels = list(se.get("enc_kernel_sizes", [5, 3, 3, 3, 1]))
    enc_dilations = list(se.get("enc_dilations", [1, 2, 3, 4, 1]))
    attn_ch = int(se.get("enc_attention_channels", 128))
    scale = int(se.get("enc_res2net_scale", 8))
    se_ch = int(se.get("enc_se_channels", 128))
    sr = int(se.get("sample_rate", 24000))
    n_fft, hop, win = 1024, 256, 1024
    n_blocks = len(enc_channels)

    def emit(name, key):
        w.add_tensor(f"speaker.qwen3_tts.{name}", _f32(_req(
            sd, f"speaker_encoder.{key}")), "F16")

    emit("blocks.0.conv.weight", "blocks.0.conv.weight")
    emit("blocks.0.conv.bias", "blocks.0.conv.bias")
    for bi in range(1, n_blocks - 1):
        for part, src in (("tdnn1.conv", "tdnn1.conv"),
                          ("tdnn2.conv", "tdnn2.conv"),
                          ("se.conv1", "se_block.conv1"),
                          ("se.conv2", "se_block.conv2")):
            emit(f"blocks.{bi}.{part}.weight", f"blocks.{bi}.{src}.weight")
            emit(f"blocks.{bi}.{part}.bias", f"blocks.{bi}.{src}.bias")
        for ri in range(scale - 1):
            emit(f"blocks.{bi}.res2net.{ri}.conv.weight",
                 f"blocks.{bi}.res2net_block.blocks.{ri}.conv.weight")
            emit(f"blocks.{bi}.res2net.{ri}.conv.bias",
                 f"blocks.{bi}.res2net_block.blocks.{ri}.conv.bias")
    for part in ("mfa.conv", "asp.tdnn.conv", "asp.conv", "fc"):
        emit(f"{part}.weight", f"{part}.weight")
        emit(f"{part}.bias", f"{part}.bias")

    mel_basis = mel_filter_bank(
        n_fft // 2 + 1, mel_dim, min_frequency=0.0, max_frequency=sr / 2,
        sampling_rate=sr, norm="slaney", mel_scale="slaney").T.astype(np.float32)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
              ).astype(np.float32)
    w.add_tensor("speaker.qwen3_tts.mel_basis", mel_basis, "F32")
    w.add_tensor("speaker.qwen3_tts.window", window, "F32")

    talker_h = int(cfg["talker_config"]["hidden_size"])
    w.add_bool("codec.speaker.has_encoder", True)
    w.add_uint32("codec.speaker.n_rows", 1)
    w.add_uint32("codec.speaker.hidden_dim", talker_h)
    w.add_bool("codec.speaker.needs_ref_pcm", True)
    w.add_bool("codec.speaker.needs_ref_speech_tokens", False)
    w.add_bool("codec.speaker.needs_emotion_scalar", False)
    w.add_uint32("codec.speaker.ref_sample_rate", sr)
    w.add_uint32("codec.speaker.speaker_emb_dim", enc_dim)
    w.add_float32("codec.speaker.emotion_default", 0.5)
    w.add_string("codec.speaker.encoder_arch", "qwen3_tts_ecapa_tdnn")
    w.add_uint32("codec.speaker.ecapa.mel_dim", mel_dim)
    w.add_array("codec.speaker.ecapa.enc_channels", enc_channels)
    w.add_array("codec.speaker.ecapa.enc_kernel_sizes", enc_kernels)
    w.add_array("codec.speaker.ecapa.enc_dilations", enc_dilations)
    w.add_uint32("codec.speaker.ecapa.enc_attention_channels", attn_ch)
    w.add_uint32("codec.speaker.ecapa.enc_res2net_scale", scale)
    w.add_uint32("codec.speaker.ecapa.enc_se_channels", se_ch)
    w.add_uint32("codec.speaker.ecapa.enc_dim", enc_dim)
    w.add_uint32("codec.speaker.ecapa.n_fft", n_fft)
    w.add_uint32("codec.speaker.ecapa.hop_size", hop)
    w.add_uint32("codec.speaker.ecapa.win_size", win)
    w.add_bool("codec.speaker.ecapa.center", False)


# ---------------------------------------------------------------------
# Moshi (residual_depth_ar, flexible 3D layout, text c0)
# ---------------------------------------------------------------------

def dump_moshi(w, sd, cfg) -> None:
    """reference: lm_adaptor/moshi.py."""
    d = cfg["depth_decoder_config"]
    n_cb = int(cfg["num_codebooks"])
    backbone_h = int(cfg["hidden_size"])
    text_v = int(d["vocab_size"])
    audio_v = int(d["audio_vocab_size"])
    hidden, layers = int(d["hidden_size"]), int(d["num_hidden_layers"])
    nh, nkvh, hd = (int(d["num_attention_heads"]),
                    int(d["num_key_value_heads"]), int(d["head_dim"]))
    sw = int(d.get("sliding_window") or n_cb)
    fc1 = _req(sd, "depth_decoder.layers.0.mlp.fc1.weight")
    inter = int(fc1.shape[1]) // 2

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", backbone_h)
    w.add_uint32("codec.lm.audio_embed_dim", hidden)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [audio_v] * n_cb)
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", False)
    _depth_meta(w, layers, hidden, nh, nkvh, hd, inter,
                float(d["rms_norm_eps"]), maxpos=n_cb,
                depth_has_in_proj=True, depth_has_qk_norm=False,
                depth_has_output_norm=False, depth_use_rope=False,
                depth_sliding_window=sw, depth_text_vocab=text_v,
                weight_layout="flexible", c0_input_modality="text")

    w.add_tensor("lm.depth.text_embd.weight",
                 _f32(_req(sd, "depth_decoder.text_embed_tokens.weight")), "F16")
    for i in range(n_cb - 1):
        w.add_tensor(f"lm.depth.audio_embd_{i}.weight",
                     _f32(_req(sd, f"depth_decoder.embed_tokens.{i}.weight")),
                     "F16")
    w.add_tensor("lm.depth.in_proj.weight",
                 _f32(_req(sd, "depth_decoder.input_projections.weight")), "F16")
    w.add_tensor("lm.depth.heads.weight",
                 _f32(_req(sd, "depth_decoder.lm_heads.weight")), "F16")
    for l in range(layers):
        p_in, p_out = f"depth_decoder.layers.{l}", f"lm.depth.blk_{l}"
        for src, dst in (("self_attn.q_proj.linear.weight", "q.weight"),
                         ("self_attn.k_proj.linear.weight", "k.weight"),
                         ("self_attn.v_proj.linear.weight", "v.weight"),
                         ("self_attn.o_proj.linear.weight", "o.weight")):
            w.add_tensor(f"{p_out}.{dst}", _f32(_req(sd, f"{p_in}.{src}")),
                         "F16")
        for src, dst in (("input_layernorm.weight", "attn_norm.weight"),
                         ("post_attention_layernorm.weight",
                          "ffn_norm.weight")):
            w.add_tensor(f"{p_out}.{dst}", _f32(_req(sd, f"{p_in}.{src}")),
                         "F32")
        fc1 = _req(sd, f"{p_in}.mlp.fc1.weight")      # (N, 2I, H)
        gate, up = np.split(fc1, 2, axis=1)
        w.add_tensor(f"{p_out}.ffn_gate.weight",
                     np.ascontiguousarray(gate).astype(np.float32), "F16")
        w.add_tensor(f"{p_out}.ffn_up.weight",
                     np.ascontiguousarray(up).astype(np.float32), "F16")
        w.add_tensor(f"{p_out}.ffn_down.weight",
                     _f32(_req(sd, f"{p_in}.mlp.fc2.weight")), "F16")


# ---------------------------------------------------------------------
# LFM2-Audio (residual_depth_ar, per-pos in_proj, no-c0 modality)
# ---------------------------------------------------------------------

def dump_lfm2_audio(w, sd, cfg) -> None:
    """reference: lm_adaptor/lfm2_audio.py."""
    lfm = cfg["lfm"]
    dpf = cfg["depthformer"]
    n_cb = int(cfg["codebooks"])
    audio_v = int(cfg.get("audio_vocab_size", 2048)) + 1
    backbone_h = int(lfm["hidden_size"])
    hidden, layers = int(dpf["dim"]), int(dpf["layers"])
    nh, nkvh = 32, 8
    hd = hidden // nh
    inter = int(_req(sd, "depthformer.layers.0.feed_forward.w1.weight").shape[0])

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "lfm2")
    w.add_uint32("codec.lm.hidden_dim", backbone_h)
    w.add_uint32("codec.lm.audio_embed_dim", hidden)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [audio_v] * n_cb)
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_bool("codec.lm.parallel.tied_heads_to_embd",
               bool(dpf.get("tie", False)))
    w.add_int32("codec.lm.eos_code_c0", audio_v - 1)
    w.add_int32("codec.lm.eos_min_step", 0)
    _depth_meta(w, layers, hidden, nh, nkvh, hd, inter, 1e-5,
                rope=1_000_000.0, maxpos=128_000,
                depth_has_in_proj=True, depth_has_qk_norm=True,
                depth_has_output_norm=False, depth_use_rope=True,
                depth_rope_interleaved=True, depth_in_proj_per_pos=True,
                depth_in_proj_has_bias=True, depth_has_pre_head_norm=True,
                depth_emits_c0=True, weight_layout="shared",
                c0_input_modality="none")

    dl_w = _req(sd, "depth_linear.weight").reshape(n_cb, hidden, backbone_h)
    dl_b = _req(sd, "depth_linear.bias").reshape(n_cb, hidden)
    w.add_tensor("lm.depth.in_proj.weight",
                 np.ascontiguousarray(dl_w).astype(np.float32), "F16")
    w.add_tensor("lm.depth.in_proj.bias",
                 np.ascontiguousarray(dl_b).astype(np.float32), "F32")
    w.add_tensor("lm.compose.audio_embd.weight",
                 _f32(_req(sd, "audio_embedding.embedding.weight")), "F16")
    w.add_uint32("codec.lm.compose.audio_embed_dim", backbone_h)
    w.add_uint32("codec.lm.compose.codebook_stride", audio_v)
    for i in range(n_cb):
        w.add_tensor(f"lm.depth.audio_embd_{i}.weight",
                     _f32(_req(sd, f"depth_embeddings.{i}.embedding.weight")),
                     "F16")
        w.add_tensor(f"lm.depth.heads_{i}.weight",
                     _f32(_req(sd, f"depth_embeddings.{i}.to_logits.weight")),
                     "F16")
        w.add_tensor(f"lm.depth.heads_{i}_norm.weight", _f32(_req(
            sd, f"depth_embeddings.{i}.embedding_norm.weight")), "F32")

    q_dim, kv_dim = nh * hd, nkvh * hd
    for l in range(layers):
        p_in, p_out = f"depthformer.layers.{l}", f"lm.depth.blk_{l}"
        qkv = _req(sd, f"{p_in}.operator.qkv_proj.weight")
        for dst, arr in (("q.weight", qkv[:q_dim]),
                         ("k.weight", qkv[q_dim:q_dim + kv_dim]),
                         ("v.weight", qkv[q_dim + kv_dim:])):
            w.add_tensor(f"{p_out}.{dst}",
                         np.ascontiguousarray(arr).astype(np.float32), "F16")
        for src, dst in (("operator.out_proj.weight", "o.weight"),
                         ("operator.bounded_attention.q_layernorm.weight",
                          "q_norm.weight"),
                         ("operator.bounded_attention.k_layernorm.weight",
                          "k_norm.weight"),
                         ("operator_norm.weight", "attn_norm.weight"),
                         ("ffn_norm.weight", "ffn_norm.weight"),
                         ("feed_forward.w1.weight", "ffn_gate.weight"),
                         ("feed_forward.w3.weight", "ffn_up.weight"),
                         ("feed_forward.w2.weight", "ffn_down.weight")):
            dt = "F32" if dst.endswith("_norm.weight") else "F16"
            w.add_tensor(f"{p_out}.{dst}", _f32(_req(sd, f"{p_in}.{src}")), dt)


# ---------------------------------------------------------------------
# MOSS-TTS-Realtime (residual_depth_ar, c0 modality "none")
# ---------------------------------------------------------------------

def dump_moss_tts_realtime(w, sd, cfg) -> None:
    """reference: lm_adaptor/moss_tts_local.py (_dump_realtime)."""
    lcfg, ocfg = cfg["language_config"], cfg["local_config"]
    rvq = int(cfg["rvq"])
    audio_v = int(cfg["audio_vocab_size"])
    backbone_h = int(lcfg["hidden_size"])
    hidden, layers = int(ocfg["hidden_size"]), int(ocfg["num_hidden_layers"])
    nh, nkvh, hd = (int(ocfg["num_attention_heads"]),
                    int(ocfg["num_key_value_heads"]), int(ocfg["head_dim"]))
    has_in_proj = backbone_h != hidden

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "qwen3")
    w.add_uint32("codec.lm.hidden_dim", backbone_h)
    w.add_uint32("codec.lm.audio_embed_dim", hidden)
    w.add_uint32("codec.lm.n_codebook", rvq)
    w.add_array("codec.lm.codebook_sizes", [audio_v] * rvq)
    w.add_array("codec.lm.delay_pattern", [0] * rvq)
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", False)
    w.add_int32("codec.lm.eos_code_c0",
                int(cfg.get("audio_eos_token", audio_v - 1)))
    w.add_int32("codec.lm.eos_min_step", 0)
    w.add_int32("codec.lm.bos_code_c0",
                int(cfg.get("audio_bos_token", audio_v - 2)))
    _depth_meta(w, layers, hidden, nh, nkvh, hd,
                int(ocfg["intermediate_size"]), float(ocfg["rms_norm_eps"]),
                rope=float(ocfg["rope_theta"]),
                maxpos=int(ocfg["max_position_embeddings"]),
                depth_has_in_proj=has_in_proj, depth_has_qk_norm=True,
                depth_use_rope=True, depth_emits_c0=True,
                weight_layout="shared", c0_input_modality="none")
    w.add_string("codec.lm.depth.arch", "qwen3")
    w.add_bool("codec.lm.compose.text_externally_added", True)

    for i in range(rvq):
        key = f"local_transformer.model.embed_tokens.{i}.weight"
        if key not in sd:
            # placeholder for the never-read final slot (reference quirk)
            key = f"local_transformer.model.embed_tokens.{rvq - 2}.weight"
        w.add_tensor(f"lm.depth.audio_embd_{i}.weight",
                     _f32(_req(sd, key)), "F16")
    for i in range(rvq):
        w.add_tensor(f"lm.depth.heads_{i}.weight", _f32(_req(
            sd, f"local_transformer.local_lm_heads.{i}.weight")), "F16")
    _dump_depth_layers(
        w, sd, "local_transformer.model.layers", layers,
        extra=(("self_attn.q_norm.weight", "q_norm.weight"),
               ("self_attn.k_norm.weight", "k_norm.weight")))
    w.add_tensor("lm.depth.output_norm.weight", _f32(_req(
        sd, "local_transformer.model.norm.weight")), "F32")

    # backbone-side compose table: embed_tokens.{1..rvq} summed per frame
    compose = np.concatenate(
        [_f32(_req(sd, f"embed_tokens.{i + 1}.weight")) for i in range(rvq)],
        axis=0)
    w.add_tensor("lm.compose.audio_embd.weight", compose, "F16")
    w.add_uint32("codec.lm.compose.audio_embed_dim", backbone_h)
    w.add_uint32("codec.lm.compose.codebook_stride", audio_v)


# ---------------------------------------------------------------------
# Chatterbox T3 (parallel_heads_delay n_cb=1 + chatterbox section)
# ---------------------------------------------------------------------

CBX = dict(start_text=255, stop_text=0, start_speech=6561, stop_speech=6562,
           speech_vocab=8194, max_text=2048, max_speech=4096, cond_len=32,
           hidden=1024, speaker_embed=256)


def dump_chatterbox_t3(w, sd, cfg) -> None:
    """reference: lm_adaptor/chatterbox.py. `cfg` may carry `tokenizer`
    (parsed tokenizer.json dict) and `conds` (speaker_emb / cond_prompt
    tokens / emotion_adv) — the reference reads them from the checkpoint
    dir."""
    c = dict(CBX)
    c.update({k: int(v) for k, v in cfg.items() if k in c and
              not isinstance(v, (dict, list))})
    text_vocab = int(cfg.get("text_vocab_size",
                             _req(sd, "text_emb.weight").shape[0]))
    H = c["hidden"]

    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "parallel_heads_delay")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", 1)
    w.add_array("codec.lm.codebook_sizes", [c["speech_vocab"]])
    w.add_array("codec.lm.delay_pattern", [0])
    w.add_bool("codec.lm.parallel.tied_heads_to_embd", False)
    w.add_uint32("codec.lm.chatterbox.text_vocab_size", text_vocab)
    w.add_uint32("codec.lm.chatterbox.start_text_token", c["start_text"])
    w.add_uint32("codec.lm.chatterbox.stop_text_token", c["stop_text"])
    w.add_uint32("codec.lm.chatterbox.start_speech_token", c["start_speech"])
    w.add_uint32("codec.lm.chatterbox.stop_speech_token", c["stop_speech"])
    w.add_int32("codec.lm.eos_code_c0", c["stop_speech"])
    w.add_int32("codec.lm.eos_min_step", 0)
    w.add_int32("codec.lm.bos_code_c0", c["start_speech"])
    w.add_uint32("codec.lm.chatterbox.max_text_tokens", c["max_text"])
    w.add_uint32("codec.lm.chatterbox.max_speech_tokens", c["max_speech"])
    w.add_bool("codec.lm.chatterbox.is_multilingual",
               bool(cfg.get("is_multilingual", False)))
    w.add_bool("codec.lm.chatterbox.has_emotion_cond", True)
    w.add_uint32("codec.lm.chatterbox.speaker_embed_dim", c["speaker_embed"])
    w.add_uint32("codec.lm.chatterbox.cond_len", c["cond_len"])

    def emit(name, key, dt="F16"):
        w.add_tensor(name, _f32(_req(sd, key)), dt)

    emit("lm.audio_embd_0.weight", "speech_emb.weight")
    emit("lm.heads_0.weight", "speech_head.weight")
    emit("lm.chatterbox.text_emb.weight", "text_emb.weight")
    emit("lm.chatterbox.text_head.weight", "text_head.weight")
    emit("lm.chatterbox.text_pos_emb.weight", "text_pos_emb.emb.weight")
    emit("lm.chatterbox.speech_pos_emb.weight", "speech_pos_emb.emb.weight")
    emit("lm.chatterbox.cond.spkr_enc.weight", "cond_enc.spkr_enc.weight")
    emit("lm.chatterbox.cond.spkr_enc.bias", "cond_enc.spkr_enc.bias", "F32")
    emit("lm.chatterbox.cond.emotion_adv_fc.weight",
         "cond_enc.emotion_adv_fc.weight", "F32")
    emit("lm.chatterbox.cond.perceiver.queries",
         "cond_enc.perceiver.pre_attention_query")
    for suf in ("norm.weight", "norm.bias", "to_q.weight", "to_q.bias",
                "to_k.weight", "to_k.bias", "to_v.weight", "to_v.bias",
                "proj_out.weight", "proj_out.bias"):
        dt = "F32" if suf.endswith(".bias") or suf.startswith("norm") else "F16"
        emit(f"lm.chatterbox.cond.perceiver.{suf}",
             f"cond_enc.perceiver.attn.{suf}", dt)

    tok = cfg.get("tokenizer")
    if tok:
        vocab: Dict[str, int] = tok["vocab"]
        id_to_tok = [""] * (max(vocab.values()) + 1)
        for t, i in vocab.items():
            id_to_tok[i] = t
        merges = [m if isinstance(m, str) else " ".join(m)
                  for m in tok.get("merges", [])]
        added = tok.get("added_tokens", [])
        w.add_string("codec.lm.chatterbox.tokenizer.model", "bpe")
        w.add_uint32("codec.lm.chatterbox.tokenizer.n_vocab", len(id_to_tok))
        w.add_string("codec.lm.chatterbox.tokenizer.tokens",
                     "\n".join(id_to_tok))
        w.add_string("codec.lm.chatterbox.tokenizer.merges", "\n".join(merges))
        w.add_string("codec.lm.chatterbox.tokenizer.added", "\n".join(
            f"{a['content']}\t{int(a['id'])}" for a in added))
        w.add_string("codec.lm.chatterbox.tokenizer.unk_token",
                     str(tok.get("unk_token", "[UNK]")))

    conds = cfg.get("conds")
    if conds:
        w.add_bool("codec.lm.chatterbox.has_builtin_conds", True)
        w.add_array("codec.lm.chatterbox.builtin.speaker_emb",
                    [float(x) for x in np.asarray(
                        conds["speaker_emb"]).reshape(-1)])
        w.add_array("codec.lm.chatterbox.builtin.cond_prompt_speech_tokens",
                    [int(x) for x in np.asarray(
                        conds["cond_prompt_speech_tokens"]).reshape(-1)])
        w.add_float32("codec.lm.chatterbox.builtin.emotion_adv",
                      float(conds.get("emotion_adv", 0.5)))

"""LM-adaptor writer roundtrips: fake upstream TTS checkpoints → dump_lm_into
→ GGUF → create_lm loads and runs one frame through the step machine."""

import numpy as np
import pytest
import torch

from codec_tpu.convert.lm_adaptor import dump_lm_into
from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm import create_lm


def _mk(tmp_path, name, sd, cfg, arch=None):
    path = tmp_path / name
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", True)
    dump_lm_into(w, sd, cfg, arch=arch)
    w.add_tensor("dummy", np.zeros((2, 2), np.float32))
    w.write()
    return GGUFReader(path)


def _step_frame(lm, h=None):
    rng = np.random.default_rng(0)
    st = lm.new_state()
    st.step_begin(np.asarray(
        h if h is not None else rng.standard_normal(lm.info.hidden_dim),
        np.float32))
    codes = []
    while st.step_pending:
        logits, cb = st.step_logits()
        assert logits.shape == (lm.info.codebook_sizes[cb],)
        st.step_push_code(int(np.argmax(logits)))
    return st.step_finish()


def _randn(g, *shape, s=0.3):
    return (torch.randn(*shape, generator=g) * s).numpy()


def test_moss_ttsd_dump(tmp_path):
    g = torch.Generator().manual_seed(0)
    H, NCB, TV, SV = 16, 3, 40, 20
    sd = {f"model.embedding_list.{i}.weight":
          _randn(g, [TV, SV, SV][i], H) for i in range(NCB)}
    cfg = {"architectures": ["MossTTSDForCausalLM"], "channels": NCB,
           "hidden_size": H, "vocab_size": TV, "speech_vocab_size": SV,
           "eos_token_id": 39, "speech_token_range": [10, 30],
           "generation_config": {"eos_token_id": 38}}
    r = _mk(tmp_path, "ttsd.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "parallel_heads_delay"
    assert lm.info.codebook_sizes == (TV, SV, SV)
    assert lm.info.delay_pattern == (0, 1, 2)
    assert lm.info.eos_code_c0 == 38          # generation_config wins
    codes = _step_frame(lm)
    assert len(codes) == NCB


def test_csm_dump(tmp_path):
    g = torch.Generator().manual_seed(1)
    H, DH, NCB, AV = 16, 12, 3, 20
    NH, NKV, HD, INTER, LAYERS = 2, 2, 6, 24, 2
    sd = {
        "backbone_model.embed_tokens.embed_audio_tokens.weight":
            _randn(g, NCB * AV, H),
        "lm_head.weight": _randn(g, AV, H),
        "depth_decoder.codebooks_head.weight": _randn(g, NCB - 1, DH, AV),
        "depth_decoder.model.inputs_embeds_projector.weight": _randn(g, DH, H),
        "depth_decoder.model.norm.weight": _randn(g, DH, s=0.1) + 1.0,
    }
    for l in range(LAYERS):
        p = f"depth_decoder.model.layers.{l}"
        sd[p + ".input_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".self_attn.q_proj.weight"] = _randn(g, NH * HD, DH)
        sd[p + ".self_attn.k_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.v_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.o_proj.weight"] = _randn(g, DH, NH * HD)
        sd[p + ".post_attention_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".mlp.gate_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.up_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.down_proj.weight"] = _randn(g, DH, INTER)
    cfg = {"architectures": ["CsmForConditionalGeneration"],
           "audio_num_codebooks": NCB, "audio_vocab_size": AV,
           "hidden_size": H,
           "depth_decoder_config": dict(
               num_hidden_layers=LAYERS, hidden_size=DH,
               num_attention_heads=NH, num_key_value_heads=NKV, head_dim=HD,
               intermediate_size=INTER, rms_norm_eps=1e-5, rope_theta=1e4,
               max_position_embeddings=32,
               rope_scaling={"rope_type": "llama3", "factor": 8.0,
                             "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                             "original_max_position_embeddings": 16})}
    r = _mk(tmp_path, "csm.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "residual_depth_ar"
    assert lm.info.eos_code_c0 == 0 and lm.info.eos_min_step == 1
    assert r.has_tensor("lm.depth.rope_freq_factors")
    codes = _step_frame(lm)
    assert len(codes) == NCB


def test_moshi_dump(tmp_path):
    g = torch.Generator().manual_seed(2)
    H, DH, NCB, AV, TV = 16, 12, 3, 20, 30
    NH, NKV, HD, INTER, LAYERS = 2, 2, 6, 24, 2
    sd = {
        "depth_decoder.text_embed_tokens.weight": _randn(g, TV + 1, DH),
        "depth_decoder.input_projections.weight": _randn(g, NCB, DH, H),
        "depth_decoder.lm_heads.weight": _randn(g, NCB, AV, DH),
    }
    for i in range(NCB - 1):
        sd[f"depth_decoder.embed_tokens.{i}.weight"] = _randn(g, AV + 1, DH)
    for l in range(LAYERS):
        p = f"depth_decoder.layers.{l}"
        for n in ("q", "k", "v", "o"):
            sd[f"{p}.self_attn.{n}_proj.linear.weight"] = _randn(g, NCB, DH, DH)
        sd[p + ".input_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".post_attention_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".mlp.fc1.weight"] = _randn(g, NCB, 2 * INTER, DH)
        sd[p + ".mlp.fc2.weight"] = _randn(g, NCB, DH, INTER)
    cfg = {"architectures": ["MoshiForConditionalGeneration"],
           "num_codebooks": NCB, "hidden_size": H,
           "depth_decoder_config": dict(
               vocab_size=TV, audio_vocab_size=AV, hidden_size=DH,
               num_hidden_layers=LAYERS, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD, rms_norm_eps=1e-5,
               sliding_window=NCB)}
    r = _mk(tmp_path, "moshi.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "residual_depth_ar"
    # Moshi c0 is a text token fed by the host; depth emits all N codebooks
    rng = np.random.default_rng(0)
    st = lm.new_state()
    st.set_text_context(5)
    st.step_begin(rng.standard_normal(lm.info.hidden_dim).astype(np.float32))
    codes = []
    while st.step_pending:
        logits, cb = st.step_logits()
        st.step_push_code(int(np.argmax(logits)))
    codes = st.step_finish()
    assert len(codes) == NCB


def test_lfm2_dump(tmp_path):
    g = torch.Generator().manual_seed(3)
    H, DH, NCB = 16, 64, 3               # DH/32 heads → head_dim 2
    AV = 20 + 1
    INTER, LAYERS = 24, 2
    NH, NKV = 32, 8
    HD = DH // NH
    sd = {
        "depth_linear.weight": _randn(g, DH * NCB, H),
        "depth_linear.bias": _randn(g, DH * NCB),
        "audio_embedding.embedding.weight": _randn(g, NCB * AV, H),
    }
    for i in range(NCB):
        sd[f"depth_embeddings.{i}.embedding.weight"] = _randn(g, AV, DH)
        sd[f"depth_embeddings.{i}.to_logits.weight"] = _randn(g, AV, DH)
        sd[f"depth_embeddings.{i}.embedding_norm.weight"] = \
            _randn(g, DH, s=0.1) + 1.0
    for l in range(LAYERS):
        p = f"depthformer.layers.{l}"
        sd[p + ".operator.qkv_proj.weight"] = \
            _randn(g, NH * HD + 2 * NKV * HD, DH)
        sd[p + ".operator.out_proj.weight"] = _randn(g, DH, DH)
        sd[p + ".operator.bounded_attention.q_layernorm.weight"] = \
            _randn(g, HD, s=0.1) + 1.0
        sd[p + ".operator.bounded_attention.k_layernorm.weight"] = \
            _randn(g, HD, s=0.1) + 1.0
        sd[p + ".operator_norm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".ffn_norm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".feed_forward.w1.weight"] = _randn(g, INTER, DH)
        sd[p + ".feed_forward.w3.weight"] = _randn(g, INTER, DH)
        sd[p + ".feed_forward.w2.weight"] = _randn(g, DH, INTER)
    cfg = {"architectures": ["Lfm2AudioForConditionalGeneration"],
           "codebooks": NCB, "audio_vocab_size": AV - 1,
           "lfm": {"hidden_size": H}, "depthformer": {"dim": DH, "layers": LAYERS}}
    r = _mk(tmp_path, "lfm2.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "residual_depth_ar"
    assert lm.info.eos_code_c0 == AV - 1
    codes = _step_frame(lm)
    assert len(codes) == NCB
    # compose table present for the backbone-side embed
    e = lm.compose_audio_embd(codes)
    assert e.shape == (H,)


def test_moss_realtime_dump(tmp_path):
    g = torch.Generator().manual_seed(4)
    H = DH = 16
    RVQ, AV = 3, 20
    NH, NKV, HD, INTER, LAYERS = 2, 2, 8, 24, 2
    sd = {"local_transformer.model.norm.weight": _randn(g, DH, s=0.1) + 1.0}
    for i in range(RVQ - 1):
        sd[f"local_transformer.model.embed_tokens.{i}.weight"] = \
            _randn(g, AV, DH)
    for i in range(RVQ):
        sd[f"local_transformer.local_lm_heads.{i}.weight"] = _randn(g, AV, DH)
        sd[f"embed_tokens.{i + 1}.weight"] = _randn(g, AV, H)
    for l in range(LAYERS):
        p = f"local_transformer.model.layers.{l}"
        sd[p + ".input_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".self_attn.q_proj.weight"] = _randn(g, NH * HD, DH)
        sd[p + ".self_attn.k_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.v_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.o_proj.weight"] = _randn(g, DH, NH * HD)
        sd[p + ".self_attn.q_norm.weight"] = _randn(g, HD, s=0.1) + 1.0
        sd[p + ".self_attn.k_norm.weight"] = _randn(g, HD, s=0.1) + 1.0
        sd[p + ".post_attention_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".mlp.gate_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.up_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.down_proj.weight"] = _randn(g, DH, INTER)
    cfg = {"architectures": ["MossTTSRealtime"], "rvq": RVQ,
           "audio_vocab_size": AV, "audio_eos_token": 18, "audio_bos_token": 17,
           "language_config": {"hidden_size": H, "vocab_size": 100},
           "local_config": dict(hidden_size=DH, num_hidden_layers=LAYERS,
                                num_attention_heads=NH,
                                num_key_value_heads=NKV, head_dim=HD,
                                intermediate_size=INTER, rms_norm_eps=1e-5,
                                rope_theta=1e4, max_position_embeddings=33)}
    r = _mk(tmp_path, "rt.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "residual_depth_ar"
    assert lm.info.eos_code_c0 == 18
    codes = _step_frame(lm)
    assert len(codes) == RVQ

    from codec_tpu.lm.prompt_info import build_prompt_info

    pi = build_prompt_info(r, lm.info)
    assert pi.streaming_interleave            # c0_input_modality == "none"


def test_chatterbox_t3_dump(tmp_path):
    g = torch.Generator().manual_seed(5)
    H, SV, TV = 16, 30, 24
    sd = {
        "speech_emb.weight": _randn(g, SV, H),
        "speech_head.weight": _randn(g, SV, H),
        "text_emb.weight": _randn(g, TV, H),
        "text_head.weight": _randn(g, TV, H),
        "text_pos_emb.emb.weight": _randn(g, 10, H),
        "speech_pos_emb.emb.weight": _randn(g, 12, H),
        "cond_enc.spkr_enc.weight": _randn(g, H, 8),
        "cond_enc.spkr_enc.bias": _randn(g, H),
        "cond_enc.emotion_adv_fc.weight": _randn(g, H, 1),
        "cond_enc.perceiver.pre_attention_query": _randn(g, 1, 32, H),
    }
    for suf in ("norm.weight", "norm.bias", "to_q.weight", "to_q.bias",
                "to_k.weight", "to_k.bias", "to_v.weight", "to_v.bias",
                "proj_out.weight", "proj_out.bias"):
        shape = (H,) if suf.endswith(("norm.weight", "norm.bias", ".bias")) \
            else (H, H)
        sd[f"cond_enc.perceiver.attn.{suf}"] = _randn(g, *shape)
    cfg = {"architectures": ["ChatterboxT3"], "hidden": H,
           "speech_vocab": SV, "speaker_embed": 8,
           "start_speech": 25, "stop_speech": 26,
           "tokenizer": {"vocab": {"[UNK]": 1, "[STOP]": 0, "[SPACE]": 3,
                                   "a": 4, "b": 5, "ab": 6},
                         "merges": ["a b"],
                         "added_tokens": [{"content": "[SPACE]", "id": 3}],
                         "unk_token": "[UNK]"},
           "conds": {"speaker_emb": np.full(8, 0.1, np.float32),
                     "cond_prompt_speech_tokens": [1, 2, 3],
                     "emotion_adv": 0.4}}
    # dump key names expect hidden-dim CBX overrides via cfg keys
    cfg.update({"hidden": H, "speech_vocab": SV, "speaker_embed": 8})
    r = _mk(tmp_path, "cbx.gguf", sd, cfg)
    lm = create_lm(r)
    assert lm.info.kind == "parallel_heads_delay"
    assert lm.info.codebook_sizes == (SV,)
    codes = _step_frame(lm)
    assert len(codes) == 1

    from codec_tpu.lm.chatterbox_t3 import ChatterboxT3

    t3 = ChatterboxT3(r)
    assert t3.info.start_speech_token == 25
    ids = t3.tokenize("ab ab")
    # punc_norm capitalizes the first char ('A' → UNK in the toy vocab);
    # the second "ab" BPE-merges to id 6
    assert 6 in ids.tolist()
    assert t3.builtin_cond_tokens.tolist() == [1, 2, 3]

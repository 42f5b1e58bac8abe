"""Converter auto-detect + single-checkpoint CSM/Moshi bundles
(VERDICT r3 #3; reference: scripts/convert-to-gguf.py:29-64,
converters/csm.py, converters/moshi.py).

Builds tiny bundled checkpoints on disk (sharded safetensors + config
with codec sub-config), converts them through the scripts entry point
with NO --type, and asserts the resulting GGUF decodes through
load_model and steps through create_lm."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

from codec_tpu.convert.detect import detect_type
from codec_tpu.io.gguf import GGUFReader

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _randn(g, *shape, s=0.3):
    return (torch.randn(*shape, generator=g) * s).numpy()


def _tiny_mimi_sd_cfg():
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig(
        sampling_rate=24000, frame_rate=12.5, audio_channels=1,
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
        head_dim=32, num_key_value_heads=2, intermediate_size=128,
        num_filters=8, num_residual_layers=1, codebook_size=64,
        codebook_dim=32, vector_quantization_hidden_dimension=32,
        num_quantizers=4, num_semantic_quantizers=1, sliding_window=250,
        upsample_groups=64, upsampling_ratios=[8, 6, 5, 4],
        use_causal_conv=True)
    model = MimiModel(cfg).eval()
    gq = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("codebook.embed_sum"):
                buf.copy_(torch.randn(buf.shape, generator=gq))
    return {k: v.numpy() for k, v in model.state_dict().items()}, \
        cfg.to_dict()


def _csm_lm_sd_cfg():
    """Tiny CSM depth-AR LM half (same shapes as
    tests/test_lm_adaptor_writers.py::test_csm_dump)."""
    g = torch.Generator().manual_seed(1)
    H, DH, NCB, AV = 64, 12, 4, 64
    NH, NKV, HD, INTER, LAYERS = 2, 2, 6, 24, 2
    sd = {
        "backbone_model.embed_tokens.embed_audio_tokens.weight":
            _randn(g, NCB * AV, H),
        "lm_head.weight": _randn(g, AV, H),
        "depth_decoder.codebooks_head.weight": _randn(g, NCB - 1, DH, AV),
        "depth_decoder.model.inputs_embeds_projector.weight":
            _randn(g, DH, H),
        "depth_decoder.model.norm.weight": _randn(g, DH, s=0.1) + 1.0,
    }
    for l in range(LAYERS):
        p = f"depth_decoder.model.layers.{l}"
        sd[p + ".input_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".self_attn.q_proj.weight"] = _randn(g, NH * HD, DH)
        sd[p + ".self_attn.k_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.v_proj.weight"] = _randn(g, NKV * HD, DH)
        sd[p + ".self_attn.o_proj.weight"] = _randn(g, DH, NH * HD)
        sd[p + ".post_attention_layernorm.weight"] = \
            _randn(g, DH, s=0.1) + 1.0
        sd[p + ".mlp.gate_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.up_proj.weight"] = _randn(g, INTER, DH)
        sd[p + ".mlp.down_proj.weight"] = _randn(g, DH, INTER)
    cfg = {"audio_num_codebooks": NCB, "audio_vocab_size": AV,
           "hidden_size": H,
           "depth_decoder_config": dict(
               num_hidden_layers=LAYERS, hidden_size=DH,
               num_attention_heads=NH, num_key_value_heads=NKV, head_dim=HD,
               intermediate_size=INTER, rms_norm_eps=1e-5, rope_theta=1e4,
               max_position_embeddings=32)}
    return sd, cfg


def _moshi_lm_sd_cfg():
    g = torch.Generator().manual_seed(2)
    H, DH, NCB, AV, TV = 64, 12, 4, 64, 30
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
            sd[f"{p}.self_attn.{n}_proj.linear.weight"] = \
                _randn(g, NCB, DH, DH)
        sd[p + ".input_layernorm.weight"] = _randn(g, DH, s=0.1) + 1.0
        sd[p + ".post_attention_layernorm.weight"] = \
            _randn(g, DH, s=0.1) + 1.0
        sd[p + ".mlp.fc1.weight"] = _randn(g, NCB, 2 * INTER, DH)
        sd[p + ".mlp.fc2.weight"] = _randn(g, NCB, DH, INTER)
    cfg = {"num_codebooks": NCB, "hidden_size": H,
           "depth_decoder_config": dict(
               vocab_size=TV, audio_vocab_size=AV, hidden_size=DH,
               num_hidden_layers=LAYERS, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD, rms_norm_eps=1e-5,
               sliding_window=NCB)}
    return sd, cfg


def _write_ckpt(d: Path, sd, cfg, shards: int = 1):
    from safetensors.numpy import save_file

    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(cfg))
    keys = sorted(sd)
    if shards == 1:
        save_file({k: np.ascontiguousarray(sd[k]) for k in keys},
                  str(d / "model.safetensors"))
        return
    per = (len(keys) + shards - 1) // shards
    weight_map = {}
    for si in range(shards):
        part = keys[si * per:(si + 1) * per]
        fn = f"model-{si + 1:05d}-of-{shards:05d}.safetensors"
        save_file({k: np.ascontiguousarray(sd[k]) for k in part},
                  str(d / fn))
        weight_map.update({k: fn for k in part})
    (d / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}))


def _run_entry(args):
    import convert_to_gguf as entry

    old = sys.argv
    sys.argv = ["convert_to_gguf.py"] + args
    try:
        return entry.main()
    finally:
        sys.argv = old


def _check_codec_and_lm(gguf_path, n_q=4, text_ctx=None):
    import codec_tpu
    from codec_tpu.lm import create_lm

    m = codec_tpu.load_model(gguf_path)
    codes = np.random.default_rng(0).integers(
        0, 64, (1, 5, n_q)).astype(np.int32)
    pcm = m.decode(codes)
    assert pcm.shape[-1] == 5 * m.hop_size

    lm = create_lm(GGUFReader(gguf_path))
    assert lm.info.kind == "residual_depth_ar"
    st = lm.new_state()
    if text_ctx is not None:        # Moshi c0 is a host-fed text token
        st.set_text_context(text_ctx)
    st.step_begin(np.random.default_rng(1).standard_normal(
        lm.info.hidden_dim).astype(np.float32))
    while st.step_pending:
        logits, cb = st.step_logits()
        st.step_push_code(int(np.argmax(logits)))
    codes = st.step_finish()
    assert len(codes) == lm.info.n_codebook


# ---------------------------------------------------------------------
# detect_type unit cases
# ---------------------------------------------------------------------

@pytest.mark.parametrize("cfg,expect", [
    ({"architectures": ["CsmForConditionalGeneration"]}, ("csm", "bundled")),
    ({"architectures": ["MoshiForConditionalGeneration"]},
     ("moshi", "bundled")),
    ({"architectures": ["MimiModel"]}, ("mimi", "codec")),
    ({"architectures": ["DacModel"]}, ("dac", "codec")),
    ({"model_type": "mimi"}, ("mimi", "codec")),
    ({"model_type": "wavtokenizer-large"}, ("wavtokenizer", "codec")),
    ({"model_type": "snac"}, ("snac", "codec")),
    ({"model_type": "xcodec2"}, ("xcodec2", "codec")),
    ({"model_type": "bigcodec"}, ("xcodec2", "codec")),
    ({"model_type": "distill_neucodec"}, ("distill_neucodec", "codec")),
    ({"model_type": "neucodec"}, ("neucodec", "codec")),
    ({"model_type": "s3t"}, ("chatterbox_s3t", "codec")),
    ({"architectures": ["Qwen3TTSForConditionalGeneration"]},
     ("qwen3_tts_tokenizer", "lm")),
    ({"architectures": ["MossTTSDForCausalLM"]}, ("xy_tokenizer", "lm")),
    ({"architectures": ["Lfm2AudioForConditionalGeneration"]},
     ("mimi", "lm")),
    ({"architectures": ["WavTokenizerModel"]}, ("wavtokenizer", "codec")),
])
def test_detect_type(cfg, expect):
    assert detect_type(cfg) == expect


def test_detect_type_unknown():
    with pytest.raises(ValueError, match="cannot detect"):
        detect_type({"model_type": "resnet", "architectures": ["ResNet"]})


# ---------------------------------------------------------------------
# bundled conversion end-to-end (no --type)
# ---------------------------------------------------------------------

def test_csm_bundle_autodetect(tmp_path, capsys):
    codec_sd, codec_cfg = _tiny_mimi_sd_cfg()
    lm_sd, lm_cfg = _csm_lm_sd_cfg()
    sd = {f"codec_model.{k}": v for k, v in codec_sd.items()}
    sd.update(lm_sd)
    cfg = {"architectures": ["CsmForConditionalGeneration"],
           "codec_config": codec_cfg, **lm_cfg}
    ckpt = tmp_path / "csm_ckpt"
    _write_ckpt(ckpt, sd, cfg, shards=3)     # CSM ships sharded

    out = tmp_path / "csm.gguf"
    assert _run_entry(["--checkpoint", str(ckpt), "--out", str(out),
                       "--quant", "F32"]) == 0
    r = GGUFReader(out)
    assert r.architecture == "mimi"
    assert r.get_str("codec.lm.kind") == "residual_depth_ar"
    _check_codec_and_lm(out)


def test_moshi_bundle_autodetect(tmp_path):
    codec_sd, codec_cfg = _tiny_mimi_sd_cfg()
    lm_sd, lm_cfg = _moshi_lm_sd_cfg()
    sd = {f"audio_encoder.{k}": v for k, v in codec_sd.items()}
    sd.update(lm_sd)
    cfg = {"architectures": ["MoshiForConditionalGeneration"],
           "audio_encoder_config": codec_cfg, **lm_cfg}
    ckpt = tmp_path / "moshi_ckpt"
    _write_ckpt(ckpt, sd, cfg)

    out = tmp_path / "moshi.gguf"
    assert _run_entry(["--checkpoint", str(ckpt), "--out", str(out),
                       "--quant", "F32"]) == 0
    r = GGUFReader(out)
    assert r.architecture == "mimi"
    assert r.get_str("codec.lm.residual.weight_layout") == "flexible"
    _check_codec_and_lm(out, text_ctx=5)


def test_plain_codec_autodetect(tmp_path):
    """A bare Mimi checkpoint converts with no --type."""
    codec_sd, codec_cfg = _tiny_mimi_sd_cfg()
    codec_cfg["architectures"] = ["MimiModel"]
    ckpt = tmp_path / "mimi_ckpt"
    _write_ckpt(ckpt, codec_sd, codec_cfg)
    out = tmp_path / "mimi.gguf"
    assert _run_entry(["--checkpoint", str(ckpt), "--out", str(out),
                       "--quant", "F32"]) == 0
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.n_q == 4


def test_lm_only_checkpoint_guides_user(tmp_path, capsys):
    """An LM-family checkpoint without --lm-source exits 1 with the
    pairing instructions (we never auto-download the codec repo)."""
    ckpt = tmp_path / "lm_ckpt"
    ckpt.mkdir()
    (ckpt / "config.json").write_text(json.dumps(
        {"architectures": ["Qwen3TTSForConditionalGeneration"]}))
    out = tmp_path / "x.gguf"
    assert _run_entry(["--checkpoint", str(ckpt), "--out", str(out)]) == 1
    err = capsys.readouterr().err
    assert "qwen3_tts_tokenizer" in err and "--lm-source" in err


def test_csm_bundle_missing_codec_tensors(tmp_path, capsys):
    lm_sd, lm_cfg = _csm_lm_sd_cfg()
    cfg = {"architectures": ["CsmForConditionalGeneration"],
           "codec_config": {}, **lm_cfg}
    ckpt = tmp_path / "bad_ckpt"
    _write_ckpt(ckpt, lm_sd, cfg)
    assert _run_entry(["--checkpoint", str(ckpt),
                       "--out", str(tmp_path / "bad.gguf")]) == 1
    assert "codec_model" in capsys.readouterr().err

"""tts-cli and codec-lm-cli smoke tests: every subcommand driven through its
main() over fixture GGUFs (reference analog: tests/e2e/
ttscli_synthesize_smoke.py + examples/codec-lm-cli.cpp usage).

Fixtures:
  - pocket_flow_gguf: pocket_mimi codec (converted TorchPocket) merged with
    a tiny flow_lm adaptor + a baked SPM unigram tokenizer — the
    self-contained Pocket-TTS surface (synthesize, --stream).
  - mimi_rda_gguf + llama backbone: tiny HF Mimi codec merged with a
    CSM-style residual_depth_ar adaptor, synthesized through the JAX llama
    backbone with a baked tokenizer (synthesize --backbone).
"""

import base64
import os

import numpy as np
import pytest
import torch

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.io.wav import read_wav

from test_spm import _model, _piece


def _spm_b64() -> str:
    """Tiny unigram vocab with full byte fallback (so any text tokenizes)."""
    pieces = [("<unk>", 0.0, 2), ("▁", -1.0, 1),
              ("▁hello", -2.0, 1), ("▁there", -2.5, 1),
              ("lo", -3.0, 1), ("he", -3.0, 1)]
    pieces += [(f"<0x{b:02X}>", -20.0, 6) for b in range(256)]
    return base64.b64encode(_model(pieces)).decode()


def _merge_gguf(src_path, out_path, extra_fn, arch=None):
    """Copy every KV + tensor from src into a new GGUF, then let extra_fn
    add adaptor KVs/tensors (GGUF has no append — fixtures that need both a
    codec and an lm section are merged this way)."""
    r = GGUFReader(src_path)
    w = GGUFWriter(out_path, arch or r.architecture)
    for k, v in r.kv.items():
        if k in ("general.architecture", "general.alignment"):
            continue
        if isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, int):
            (w.add_int32 if v < 0 else w.add_uint32)(k, v)
        elif isinstance(v, float):
            w.add_float32(k, v)
        elif isinstance(v, str):
            w.add_string(k, v)
        elif isinstance(v, (list, tuple, np.ndarray)):
            w.add_array(k, list(v))
    for name in r.tensor_names():
        w.add_tensor(name, r.get(name))
    extra_fn(w)
    w.write()
    return out_path


# ---------------------------------------------------------------------------
# pocket_mimi + flow_lm (self-contained synthesize)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pocket_flow_gguf(tmp_path_factory):
    from test_pocket_mimi_parity import (HOP, LAT, OUTER, RATIOS, TFL,
                                         HEADS, HD as PHD, TorchPocket)
    from test_flow_lm import (TorchFlow, DM, L, H, HD as FHD, LDIM, FDIM,
                              FDEPTH, NBINS, LSD)
    from codec_tpu.convert import get_converter

    assert LDIM == LAT        # flow latent dim must match the vocoder's

    tmp = tmp_path_factory.mktemp("tts")
    ref = TorchPocket()
    c = get_converter("pocket_tts")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in ref.sd.items()}, {
        "sample_rate": 24000, "hop_size": HOP, "ldim": LAT,
        "decoder_ratios": list(RATIOS), "encoder_ratios": list(RATIOS[::-1]),
        "outer_dim": OUTER, "tf_layers": TFL, "tf_heads": HEADS,
        "tf_head_dim": PHD, "tf_context": 250, "tf_max_period": 10000.0,
    })
    codec_path = tmp / "pocket_codec.gguf"
    c.convert_and_save(codec_path)

    flow = TorchFlow()

    def add_flow(w):
        w.add_bool("codec.lm.has_adaptor", True)
        w.add_string("codec.lm.kind", "flow_lm")
        w.add_uint32("codec.lm.d_model", DM)
        w.add_uint32("codec.lm.n_layers", L)
        w.add_uint32("codec.lm.n_heads", H)
        w.add_uint32("codec.lm.head_dim", FHD)
        w.add_uint32("codec.lm.ldim", LDIM)
        w.add_uint32("codec.lm.flow_dim", FDIM)
        w.add_uint32("codec.lm.flow_depth", FDEPTH)
        w.add_uint32("codec.lm.lsd_decode_steps", LSD)
        w.add_bool("codec.lm.insert_bos_before_voice", True)
        w.add_float32("codec.lm.eos_threshold", -4.0)
        w.add_string("codec.lm.tokenizer.spm_b64", _spm_b64())
        for name, t in flow.t.items():
            if name == "lm.text.embed.w":
                # widen the text LUT to cover the byte-fallback token ids
                g = torch.Generator().manual_seed(11)
                t = torch.randn(300, t.shape[1], generator=g) * 0.25
            w.add_tensor(name, t.numpy())

    return _merge_gguf(codec_path, tmp / "pocket_flow.gguf", add_flow)


def test_tts_cli_info(pocket_flow_gguf, capsys):
    from codec_tpu.cli.tts_cli import main

    assert main(["info", "--model", str(pocket_flow_gguf)]) == 0
    out = capsys.readouterr().out
    assert "flow_lm" in out


def test_tts_cli_synthesize_flow(pocket_flow_gguf, tmp_path, capsys):
    from codec_tpu.cli.tts_cli import main

    out = tmp_path / "flow.wav"
    assert main(["synthesize", "--model", str(pocket_flow_gguf),
                 "--text", "hello there", "--out", str(out),
                 "--max-frames", "6", "--seed", "3"]) == 0
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] > 0
    assert "frames" in capsys.readouterr().out


def test_tts_cli_synthesize_flow_stream_matches_batch(pocket_flow_gguf,
                                                      tmp_path, capsys):
    from codec_tpu.cli.tts_cli import main

    a, b = tmp_path / "batch.wav", tmp_path / "stream.wav"
    assert main(["synthesize", "--model", str(pocket_flow_gguf),
                 "--text", "hello", "--out", str(a),
                 "--max-frames", "5", "--seed", "1"]) == 0
    assert main(["synthesize", "--model", str(pocket_flow_gguf),
                 "--text", "hello", "--out", str(b),
                 "--max-frames", "5", "--seed", "1", "--stream"]) == 0
    assert "time-to-first-audio" in capsys.readouterr().out
    pa, _ = read_wav(a)
    pb, _ = read_wav(b)
    # chunk-exact streaming vocoder: same audio as the batch decode
    np.testing.assert_allclose(pa[:, 0], pb[:, 0], atol=2.0 / 32768)


def test_tts_cli_synthesize_errors(pocket_flow_gguf, tmp_path, capsys):
    from codec_tpu.cli.tts_cli import main

    # missing model file -> error exit, not a traceback
    assert main(["synthesize", "--model", str(tmp_path / "nope.gguf"),
                 "--text", "x", "--out", str(tmp_path / "o.wav")]) == 1
    assert "error:" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# mimi codec + residual_depth_ar adaptor + llama backbone (codebook-AR)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mimi_rda_and_backbone(tmp_path_factory):
    from transformers import LlamaConfig, LlamaModel, MimiConfig, MimiModel
    from codec_tpu.convert import get_converter

    tmp = tmp_path_factory.mktemp("bbtts")
    hidden = 64

    torch.manual_seed(0)
    mimi_cfg = MimiConfig(
        sampling_rate=24000, frame_rate=12.5, audio_channels=1,
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
        head_dim=32, num_key_value_heads=2, intermediate_size=128,
        num_filters=8, num_residual_layers=1, codebook_size=64,
        codebook_dim=32, vector_quantization_hidden_dimension=32,
        num_quantizers=4, num_semantic_quantizers=1, sliding_window=250,
        upsample_groups=64, upsampling_ratios=[8, 6, 5, 4],
        use_causal_conv=True)
    hf_mimi = MimiModel(mimi_cfg).eval()
    # HF random init leaves the RVQ codebooks EMPTY (embed_sum == 0 until
    # k-means priming), which made decode(codes) code-INDEPENDENT — every
    # synthesize WAV was byte-identical no matter the codes, silently
    # robbing the serve/CLI byte-equality tests of discriminating power.
    # Randomize the buffers so decoded audio actually varies with codes.
    gq = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, buf in hf_mimi.named_buffers():
            if name.endswith("codebook.embed_sum"):
                buf.copy_(torch.randn(buf.shape, generator=gq))
    conv = get_converter("mimi")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf_mimi.state_dict().items()},
        mimi_cfg.to_dict())
    codec_path = tmp / "mimi_codec.gguf"
    conv.convert_and_save(codec_path)

    n_cb, vocab, dh = 4, 64, 24
    g = torch.Generator().manual_seed(7)
    W = lambda *s: torch.randn(*s, generator=g) * 0.3

    def add_rda(w):
        w.add_bool("codec.lm.has_adaptor", True)
        w.add_string("codec.lm.kind", "residual_depth_ar")
        w.add_string("codec.lm.host_arch", "llama")
        w.add_uint32("codec.lm.hidden_dim", hidden)
        w.add_uint32("codec.lm.audio_embed_dim", hidden)
        w.add_uint32("codec.lm.n_codebook", n_cb)
        w.add_array("codec.lm.codebook_sizes", [vocab] * n_cb)
        w.add_array("codec.lm.delay_pattern", [0] * n_cb)
        w.add_uint32("codec.lm.residual.depth_layers", 1)
        w.add_uint32("codec.lm.residual.depth_hidden", dh)
        w.add_uint32("codec.lm.residual.depth_n_heads", 2)
        w.add_uint32("codec.lm.residual.depth_n_kv_heads", 2)
        w.add_uint32("codec.lm.residual.depth_head_dim", 12)
        w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
        w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
        w.add_bool("codec.lm.residual.depth_has_in_proj", True)
        w.add_bool("codec.lm.residual.depth_has_output_norm", True)
        w.add_bool("codec.lm.residual.depth_use_rope", True)
        w.add_string("codec.lm.residual.c0_input_modality", "audio")
        w.add_tensor("lm.c0_head.weight", W(vocab, hidden).numpy())
        w.add_tensor("lm.depth.in_proj.weight", W(dh, hidden).numpy())
        w.add_tensor("lm.depth.output_norm.weight",
                     (W(dh) * 0.2 + 1.0).numpy())
        for i in range(n_cb):
            w.add_tensor(f"lm.audio_embd_{i}.weight", W(vocab, hidden).numpy())
        for i in range(n_cb - 1):
            w.add_tensor(f"lm.depth.heads_{i}.weight", W(vocab, dh).numpy())
        p = "lm.depth.blk_0"
        w.add_tensor(f"{p}.attn_norm.weight", (W(dh) * 0.2 + 1.0).numpy())
        w.add_tensor(f"{p}.q.weight", W(24, dh).numpy())
        w.add_tensor(f"{p}.k.weight", W(24, dh).numpy())
        w.add_tensor(f"{p}.v.weight", W(24, dh).numpy())
        w.add_tensor(f"{p}.o.weight", W(dh, 24).numpy())
        w.add_tensor(f"{p}.ffn_norm.weight", (W(dh) * 0.2 + 1.0).numpy())
        w.add_tensor(f"{p}.ffn_gate.weight", W(48, dh).numpy())
        w.add_tensor(f"{p}.ffn_up.weight", W(48, dh).numpy())
        w.add_tensor(f"{p}.ffn_down.weight", W(dh, 48).numpy())

    model_path = _merge_gguf(codec_path, tmp / "mimi_rda.gguf", add_rda)

    torch.manual_seed(1)
    bb_cfg = LlamaConfig(
        hidden_size=hidden, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=300, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128)
    hf_bb = LlamaModel(bb_cfg).eval()
    cfg_dict = bb_cfg.to_dict()
    cfg_dict["tokenizer_spm_b64"] = _spm_b64()
    bconv = get_converter("llama_backbone")(quantization="F32")
    bconv.load_from_state_dict(
        {k: v.numpy() for k, v in hf_bb.state_dict().items()}, cfg_dict)
    bb_path = tmp / "bb.gguf"
    bconv.convert_and_save(bb_path)
    return model_path, bb_path


def test_tts_cli_synthesize_backbone(mimi_rda_and_backbone, tmp_path, capsys):
    from codec_tpu.cli.tts_cli import main

    model_path, bb_path = mimi_rda_and_backbone
    out = tmp_path / "bb.wav"
    assert main(["synthesize", "--model", str(model_path),
                 "--backbone", str(bb_path), "--text", "hello there",
                 "--out", str(out), "--max-frames", "3"]) == 0
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] > 0
    assert "backbone AR done" in capsys.readouterr().out


def test_tts_cli_sampler_flags(mimi_rda_and_backbone, tmp_path):
    """--temp/--top-k/... override the family defaults (reference
    tts-cli.cpp:126-138): --temp 0 is greedy (deterministic, no --seed
    sensitivity) and differs from the sampled default; a hotter chain
    differs again; --prefill-bucket changes dispatch shape, not audio."""
    from codec_tpu.cli.tts_cli import main

    model_path, bb_path = mimi_rda_and_backbone

    def synth(name, *flags):
        out = tmp_path / f"{name}.wav"
        assert main(["synthesize", "--model", str(model_path),
                     "--backbone", str(bb_path), "--text", "hello there",
                     "--out", str(out), "--max-frames", "4",
                     *flags]) == 0
        return out.read_bytes()

    default = synth("d", "--seed", "3")
    g1 = synth("g1", "--temp", "0", "--seed", "3")
    g2 = synth("g2", "--temp", "0", "--seed", "99")
    assert g1 == g2                       # greedy ignores the seed
    assert g1 != default                  # and differs from sampled
    hot = synth("hot", "--temp", "8", "--top-k", "0", "--seed", "3")
    assert hot != default
    # greedy audio is invariant to HOW the prompt prefilled
    gb = synth("gb", "--temp", "0", "--prefill-bucket", "8", "--seed", "3")
    assert gb == g1


def test_tts_cli_synthesize_backbone_on_device(mimi_rda_and_backbone,
                                               tmp_path, capsys):
    """--on-device --chunk-frames: the chunked fused generation loop
    (lm/fused_gen.py) through the CLI surface."""
    from codec_tpu.cli.tts_cli import main

    model_path, bb_path = mimi_rda_and_backbone
    out = tmp_path / "bb_dev.wav"
    assert main(["synthesize", "--model", str(model_path),
                 "--backbone", str(bb_path), "--text", "hello there",
                 "--out", str(out), "--max-frames", "5",
                 "--on-device", "--chunk-frames", "3"]) == 0
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] > 0
    assert "backbone AR done" in capsys.readouterr().out


def test_tts_cli_synthesize_backbone_quant_exec(mimi_rda_and_backbone,
                                                 tmp_path, capsys,
                                                 monkeypatch):
    """--quant-exec over a Q8_0 backbone: packed quantized weights through
    the tts-cli surface (CPU fallback = dequant+dot; kernels are
    interpret-tested in test_qmat_pallas.py)."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.cli.tts_cli import main
    from codec_tpu.convert import get_converter

    model_path, _ = mimi_rda_and_backbone
    torch.manual_seed(1)
    bb_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=300, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128)
    hf_bb = LlamaModel(bb_cfg).eval()
    cfg_dict = bb_cfg.to_dict()
    cfg_dict["tokenizer_spm_b64"] = _spm_b64()
    bconv = get_converter("llama_backbone")(quantization="Q8_0")
    bconv.load_from_state_dict(
        {k: v.numpy() for k, v in hf_bb.state_dict().items()}, cfg_dict)
    bb_q8 = tmp_path / "bb_q8.gguf"
    bconv.convert_and_save(bb_q8)

    monkeypatch.delenv("CODEC_QUANT_EXEC", raising=False)
    out = tmp_path / "bbq.wav"
    try:
        assert main(["synthesize", "--model", str(model_path),
                     "--backbone", str(bb_q8), "--text", "hello there",
                     "--out", str(out), "--max-frames", "3",
                     "--quant-exec"]) == 0
    finally:
        os.environ.pop("CODEC_QUANT_EXEC", None)   # main() sets it
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] > 0
    assert "backbone AR done" in capsys.readouterr().out


def test_tts_cli_decode(mimi_rda_and_backbone, tmp_path):
    from codec_tpu.cli.tts_cli import main

    model_path, _ = mimi_rda_and_backbone
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 64, (5, 4)).astype(np.int32)
    codes_f = tmp_path / "c.npy"
    np.save(codes_f, codes)
    out = tmp_path / "dec.wav"
    assert main(["decode", "--model", str(model_path),
                 "--codes", str(codes_f), "--out", str(out)]) == 0
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] == 5 * 1920


# ---------------------------------------------------------------------------
# codec-lm-cli
# ---------------------------------------------------------------------------

def test_codec_lm_cli_all_subcommands(mimi_rda_and_backbone, tmp_path, capsys):
    from codec_tpu.cli.codec_lm_cli import main

    model_path, _ = mimi_rda_and_backbone
    assert main(["info", "--model", str(model_path)]) == 0
    assert "residual_depth_ar" in capsys.readouterr().out

    h = np.random.default_rng(2).standard_normal(64).astype(np.float32)
    h_f = tmp_path / "h.npy"
    np.save(h_f, h)
    codes_f = tmp_path / "codes.npy"
    assert main(["step", "--model", str(model_path), "--hidden", str(h_f),
                 "--logits-prefix", str(tmp_path / "lg"),
                 "--codes-out", str(codes_f)]) == 0
    codes = np.load(codes_f)
    assert codes.shape == (4,) and (codes >= 0).all() and (codes < 64).all()
    lg0 = np.load(str(tmp_path / "lg") + "_0.npy")
    assert lg0.shape == (64,)

    embd_f = tmp_path / "e.npy"
    assert main(["compose", "--model", str(model_path),
                 "--codes", str(codes_f), "--embd-out", str(embd_f)]) == 0
    e = np.load(embd_f)
    assert e.shape == (64,)

    # step codes match the fused on-device frame (greedy)
    import jax
    import jax.numpy as jnp
    from codec_tpu.lm import create_lm

    lm = create_lm(GGUFReader(model_path))
    fused = np.asarray(lm.fused_frame()(jnp.asarray(h), jax.random.PRNGKey(0),
                                        jnp.int32(0)))
    np.testing.assert_array_equal(codes, fused)


# ---------------------------------------------------------------------------
# mimi codec + MOSS-TTSD-style parallel_heads_delay adaptor (merged cb0,
# delay pattern) + llama backbone — exercises the composed prompt rows,
# the cb0 range constraint, the post-EOS delay flush, and the
# codes→decode transform end-to-end through the CLI surface
# (reference: audio_lm.cpp:218-263 init + :1513-1580 decode transform,
# tts_runner.cpp:767-793 composed prefill).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mimi_ttsd_and_backbone(tmp_path_factory, mimi_rda_and_backbone):
    from codec_tpu.convert import get_converter

    # reuse the rda fixture's codec tensors + backbone; only the adaptor
    # section differs
    rda_path, bb_path = mimi_rda_and_backbone
    tmp = tmp_path_factory.mktemp("ttsdtts")
    hidden, n_cb, cb_vocab, text_vocab = 64, 4, 64, 300
    g = torch.Generator().manual_seed(11)
    W = lambda *s: torch.randn(*s, generator=g) * 0.3

    r = GGUFReader(rda_path)
    codec_only = tmp / "codec_only.gguf"
    w = GGUFWriter(codec_only, r.architecture)
    for k, v in r.kv.items():
        if k.startswith("codec.lm.") or k in ("general.architecture",
                                              "general.alignment"):
            continue
        if isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, int):
            (w.add_int32 if v < 0 else w.add_uint32)(k, v)
        elif isinstance(v, float):
            w.add_float32(k, v)
        elif isinstance(v, str):
            w.add_string(k, v)
        elif isinstance(v, (list, tuple, np.ndarray)):
            w.add_array(k, list(v))
    for name in r.tensor_names():
        if not name.startswith("lm."):
            w.add_tensor(name, r.get(name))
    w.write()

    def add_phd(w):
        w.add_bool("codec.lm.has_adaptor", True)
        w.add_string("codec.lm.kind", "parallel_heads_delay")
        w.add_string("codec.lm.host_arch", "qwen3")
        w.add_uint32("codec.lm.hidden_dim", hidden)
        w.add_uint32("codec.lm.audio_embed_dim", hidden)
        w.add_uint32("codec.lm.n_codebook", n_cb)
        w.add_array("codec.lm.codebook_sizes",
                    [text_vocab] + [cb_vocab] * (n_cb - 1))
        w.add_array("codec.lm.delay_pattern", [0, 1, 2, 3])
        w.add_int32("codec.lm.eos_code_c0", 5)
        w.add_int32("codec.lm.eos_min_step", 1)
        # merged cb0: text ids [100, 164) are the speech range
        w.add_int32("codec.lm.cb0_speech_offset", 100)
        w.add_int32("codec.lm.cb0_speech_range_end", 164)
        w.add_int32("codec.lm.speech_pad_token", 99)
        sizes = [text_vocab] + [cb_vocab] * (n_cb - 1)
        for i, v in enumerate(sizes):
            w.add_tensor(f"lm.heads_{i}.weight", W(v, hidden).numpy())
            w.add_tensor(f"lm.audio_embd_{i}.weight", W(v, hidden).numpy())

    model_path = _merge_gguf(codec_only, tmp / "mimi_ttsd.gguf", add_phd)
    return model_path, bb_path


def test_tts_cli_synthesize_delay_transform(mimi_ttsd_and_backbone,
                                            tmp_path, capsys):
    """CLI synthesize on a delay-pattern merged-cb0 model: the composed
    prompt rows, range-constrained cb0 sampling, post-EOS flush, and the
    decode transform all run; the WAV length matches the transform's
    output frame count (n_rows - max_delay - one EOS row when stopped)."""
    import re

    from codec_tpu.cli.tts_cli import main

    model_path, bb_path = mimi_ttsd_and_backbone
    out = tmp_path / "ttsd.wav"
    assert main(["synthesize", "--model", str(model_path),
                 "--backbone", str(bb_path), "--text", "hello there",
                 "--out", str(out), "--max-frames", "6"]) == 0
    txt = capsys.readouterr().out
    m = re.search(r"eos=(True|False), codes \((\d+), (\d+)\)", txt)
    assert m, txt
    eos, n_rows = m.group(1) == "True", int(m.group(2))
    max_delay = 3
    t_out = (n_rows - 1 - max_delay) if eos else (n_rows - max_delay)
    pcm, sr = read_wav(out)
    assert sr == 24000
    assert pcm.shape[0] == t_out * 1920     # mimi hop 1920
    if eos:                                  # flush appended max_delay rows
        assert n_rows >= 1 + max_delay


def test_tts_cli_synthesize_backbone_tp_pp(mimi_rda_and_backbone, tmp_path,
                                           capsys):
    """--tp / --pp shard the backbone from the CLI surface; generated
    codes match the unsharded run (same PRNG stream)."""
    from codec_tpu.cli.tts_cli import main

    model_path, bb_path = mimi_rda_and_backbone
    ref = tmp_path / "plain.wav"
    assert main(["synthesize", "--model", str(model_path),
                 "--backbone", str(bb_path), "--text", "hello there",
                 "--out", str(ref), "--max-frames", "3"]) == 0
    y_ref, _ = read_wav(ref)

    for flag in ("--tp", "--pp"):
        out = tmp_path / f"bb{flag[2:]}.wav"
        assert main(["synthesize", "--model", str(model_path),
                     "--backbone", str(bb_path), "--text", "hello there",
                     "--out", str(out), "--max-frames", "3",
                     flag, "2"]) == 0
        pcm, sr = read_wav(out)
        assert sr == 24000 and pcm.shape[0] == y_ref.shape[0]
        assert "backbone AR done" in capsys.readouterr().out

    from codec_tpu.cli.tts_cli import _apply_backbone_mesh

    class _A:
        tp, pp, ep = 2, 2, 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        _apply_backbone_mesh(None, _A())


# ---------------------------------------------------------------------------
# byte-level-BPE backbone tokenizers (Llama-3 / Qwen hosts; VERDICT r3 #2)
# ---------------------------------------------------------------------------

def _bpe_backbone(tmp, style: str):
    """A second backbone GGUF over the same tiny llama weights, with a
    byte-level BPE tokenizer baked (tokenizer ids < vocab_size=300)."""
    from transformers import LlamaConfig, LlamaModel
    from codec_tpu.convert import get_converter
    from codec_tpu.lm.bpe import BpeByteLevel
    from test_bpe import LLAMA3_PATTERN, QWEN2_PATTERN, _train
    from tokenizers import Regex, pre_tokenizers

    pat = LLAMA3_PATTERN if style == "llama3" else QWEN2_PATTERN
    pre = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(pat), behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    oracle = _train(pre, vocab_size=280,
                    ignore_merges=(style == "llama3"),
                    specials=["<|begin_of_text|>"] if style == "llama3"
                    else ["<|im_start|>", "<|im_end|>"])

    torch.manual_seed(1)
    bb_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=300, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128)
    hf_bb = LlamaModel(bb_cfg).eval()
    cfg_dict = bb_cfg.to_dict()
    cfg_dict["tokenizer_bpe_json_zb64"] = BpeByteLevel.json_to_zb64(
        oracle.to_str().encode())
    bconv = get_converter("llama_backbone")(quantization="F32")
    bconv.load_from_state_dict(
        {k: v.numpy() for k, v in hf_bb.state_dict().items()}, cfg_dict)
    bb_path = tmp / f"bb_bpe_{style}.gguf"
    bconv.convert_and_save(bb_path)
    return bb_path, oracle


@pytest.mark.parametrize("style", ["llama3", "qwen2"])
def test_tts_cli_synthesize_backbone_bpe(mimi_rda_and_backbone, tmp_path,
                                         capsys, style):
    """synthesize --backbone with a byte-level-BPE-tokenizer backbone
    (the CSM Llama-3.2 / Qwen3 host shapes) — the gap VERDICT r3 #2
    names: codebook-AR families driven from raw text through the CLI."""
    from codec_tpu.cli.tts_cli import main

    model_path, _ = mimi_rda_and_backbone
    bb_path, _ = _bpe_backbone(tmp_path, style)
    out = tmp_path / f"bpe_{style}.wav"
    assert main(["synthesize", "--model", str(model_path),
                 "--backbone", str(bb_path), "--text", "hello there",
                 "--out", str(out), "--max-frames", "3"]) == 0
    pcm, sr = read_wav(out)
    assert sr == 24000 and pcm.shape[0] > 0
    assert "backbone AR done" in capsys.readouterr().out


def test_backbone_gguf_bpe_tokenizer_matches_oracle(tmp_path):
    """The baked KV round-trips: ids from the GGUF-loaded engine equal
    the HF tokenizers oracle on the same text."""
    from codec_tpu.cli.tts_cli import load_backbone_tokenizer

    bb_path, oracle = _bpe_backbone(tmp_path, "llama3")
    tok = load_backbone_tokenizer(GGUFReader(bb_path))
    for text in ("hello there", "Hello, wörld!  123", "<|begin_of_text|>hi"):
        assert tok.encode(text) == oracle.encode(
            text, add_special_tokens=True).ids


def test_backbone_converter_autodetects_tokenizer_json(tmp_path):
    """load_from_checkpoint picks up tokenizer.json next to the weights
    and bakes backbone.tokenizer.bpe_json_zb64 with no config injection."""
    import json as _json
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaModel
    from codec_tpu.convert import get_converter
    from test_bpe import LLAMA3_PATTERN, _train
    from tokenizers import Regex, pre_tokenizers

    pre = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_PATTERN), behavior="isolated",
                             invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    oracle = _train(pre, vocab_size=280, ignore_merges=True)

    torch.manual_seed(1)
    bb_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=300, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128)
    hf_bb = LlamaModel(bb_cfg).eval()
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "config.json").write_text(_json.dumps(bb_cfg.to_dict()))
    save_file({k: v.numpy() for k, v in hf_bb.state_dict().items()},
              str(ckpt / "model.safetensors"))
    (ckpt / "tokenizer.json").write_text(oracle.to_str())

    bconv = get_converter("llama_backbone")(quantization="F32")
    bconv.load_from_checkpoint(ckpt)
    out = tmp_path / "bb_auto.gguf"
    bconv.convert_and_save(out)

    from codec_tpu.cli.tts_cli import load_backbone_tokenizer
    tok = load_backbone_tokenizer(GGUFReader(out))
    assert tok.encode("hello there") == oracle.encode(
        "hello there", add_special_tokens=False).ids

"""Cross-engine artifact harness: reference-converter GGUFs through this
framework.

The round-2 review asked for a differential harness against the built
reference engine (codec-cli, CPU Release). That binary CANNOT be built in
this environment: `/root/reference/ggml` is an empty directory (the ggml
submodule was never checked out in the snapshot) and the sandbox has no
network egress to fetch it. The strongest available cross-engine signal is
therefore artifact-level:

  1. run the REFERENCE repo's own converters (pure Python, imported
     read-only from /root/reference/scripts) over a random-weight
     checkpoint saved to disk,
  2. load the resulting GGUF — the reference engine's exact wire format,
     produced by reference code, including the reference quantizer's
     Q8_0/Q4_K bit-streams — through this framework,
  3. assert code-level (bit-exact RVQ) and waveform parity against the
     in-process HF/torch model, at the reference e2e thresholds
     (tests/e2e/config.json: mimi corr >= 0.998; runner.py:40-56 quant
     relaxations).

This validates this repo's READER against the reference's WRITER (tensor
schema, layout prep, K-quant packing) rather than against our own
converter mirror — the same coverage direction the binary differential
would have added for the load path. The reference converters are used as
a test oracle only; no reference code is copied into the repo.
"""

import json
import sys

import numpy as np
import pytest
import torch

REF_SCRIPTS = "/root/reference/scripts"


@pytest.fixture(scope="module")
def ref_converters():
    import pathlib

    if not (pathlib.Path(REF_SCRIPTS) / "converters").is_dir():
        pytest.skip("reference scripts not available")
    if REF_SCRIPTS not in sys.path:
        sys.path.insert(0, REF_SCRIPTS)
    import converters  # the reference registry (scripts/converters)

    return converters


def _tiny_mimi_cfg():
    from transformers import MimiConfig

    return MimiConfig(
        sampling_rate=24000, frame_rate=12.5, audio_channels=1,
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        head_dim=32, num_key_value_heads=2, intermediate_size=128,
        num_filters=8, num_residual_layers=1, codebook_size=64,
        codebook_dim=32, vector_quantization_hidden_dimension=32,
        num_quantizers=4, num_semantic_quantizers=1, sliding_window=250,
        upsample_groups=64, upsampling_ratios=[8, 6, 5, 4],
        use_causal_conv=True)


@pytest.fixture(scope="module")
def mimi_ref_gguf(ref_converters, tmp_path_factory):
    """Tiny random HF Mimi → reference MimiConverter → {F32, Q8_0} GGUFs."""
    from transformers import MimiModel

    torch.manual_seed(0)
    cfg = _tiny_mimi_cfg()
    model = MimiModel(cfg).eval()
    ckpt = tmp_path_factory.mktemp("xeng_mimi_ckpt")
    model.save_pretrained(ckpt, safe_serialization=True)

    paths = {}
    for quant in ("F32", "Q8_0"):
        conv = ref_converters.MimiConverter(quantization=quant)
        conv.load_from_checkpoint(ckpt)
        out = ckpt / f"ref_mimi_{quant}.gguf"
        conv.convert_and_save(out)
        paths[quant] = out
    return model, cfg, paths


def test_mimi_ref_gguf_decode_parity(mimi_ref_gguf):
    import codec_tpu

    model, cfg, paths = mimi_ref_gguf
    ours = codec_tpu.load_model(paths["F32"])
    # reference converter hardcodes codec.n_q=32; the loader must clamp to
    # the codebook tensors present (reference runtime behavior:
    # codec_internal.h:143-152)
    assert ours.n_q == 4
    assert ours.sample_rate == 24000 and ours.hop_size == 1920

    codes = np.random.default_rng(0).integers(
        0, cfg.codebook_size, size=(12, 4)).astype(np.int32)
    pcm = np.asarray(ours.decode(codes)).reshape(-1)
    with torch.no_grad():
        ref = model.decode(
            torch.from_numpy(codes.T[None]).long()).audio_values[0, 0].numpy()
    assert pcm.shape[0] == ref.shape[0]
    corr = np.corrcoef(pcm, ref)[0, 1]
    assert corr >= 0.998, corr                 # e2e config mimi threshold


def test_mimi_ref_gguf_encode_bit_exact(mimi_ref_gguf):
    import codec_tpu

    model, cfg, paths = mimi_ref_gguf
    ours = codec_tpu.load_model(paths["F32"])
    x = (np.random.default_rng(1).standard_normal(1920 * 8)
         .astype(np.float32) * 0.1)
    got = np.asarray(ours.encode(x))
    with torch.no_grad():
        want = model.encode(
            torch.from_numpy(x)[None, None]).audio_codes[0].T.numpy()
    np.testing.assert_array_equal(got, want)


def test_mimi_ref_gguf_q8_0(mimi_ref_gguf):
    """Q8_0 quantized BY THE REFERENCE QUANTIZER (scripts/utils/
    quantization.py bit-stream) → our dequant-on-load → decode parity at
    the reference's relaxed threshold (runner.py:47: corr - 0.015)."""
    import codec_tpu

    model, cfg, paths = mimi_ref_gguf
    ours = codec_tpu.load_model(paths["Q8_0"])
    codes = np.random.default_rng(2).integers(
        0, cfg.codebook_size, size=(12, 4)).astype(np.int32)
    pcm = np.asarray(ours.decode(codes)).reshape(-1)
    with torch.no_grad():
        ref = model.decode(
            torch.from_numpy(codes.T[None]).long()).audio_values[0, 0].numpy()
    corr = np.corrcoef(pcm, ref)[0, 1]
    assert corr >= 0.998 - 0.015, corr


def test_mimi_wire_schema_equivalence(mimi_ref_gguf, tmp_path):
    """Our converter and the reference converter agree on the wire: every
    tensor our runtime loads exists under the same name in the
    reference-produced file with identical F32 content."""
    from codec_tpu.convert import get_converter
    from codec_tpu.io.gguf import GGUFReader
    from transformers import MimiModel

    model, cfg, paths = mimi_ref_gguf
    conv = get_converter("mimi")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg.to_dict())
    ours_path = tmp_path / "ours_mimi.gguf"
    conv.convert_and_save(ours_path)

    r_ref = GGUFReader(paths["F32"])
    r_ours = GGUFReader(ours_path)
    ref_names = set(r_ref.tensor_names())
    checked = 0
    for name in r_ours.tensor_names():
        assert name in ref_names, f"{name} missing from reference GGUF"
        a, b = r_ours.get(name), r_ref.get(name)
        assert a.shape == b.shape, name
        np.testing.assert_array_equal(a, b, err_msg=name)
        checked += 1
    assert checked > 100


@pytest.fixture(scope="module")
def dac_ref_gguf(ref_converters, tmp_path_factory):
    """Tiny random HF DacModel → reference DacConverter → F32 GGUF."""
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    cfg = DacConfig(
        encoder_hidden_size=8, decoder_hidden_size=32,
        downsampling_ratios=[2, 4, 5, 8], upsampling_ratios=[8, 5, 4, 2],
        n_codebooks=4, codebook_size=32, codebook_dim=4,
        hidden_size=64, sampling_rate=24000)
    model = DacModel(cfg).eval()
    ckpt = tmp_path_factory.mktemp("xeng_dac_ckpt")
    model.save_pretrained(ckpt, safe_serialization=True)
    (ckpt / "config.json").write_text(json.dumps(cfg.to_dict()))

    conv = ref_converters.DacConverter(quantization="F32")
    conv.load_from_checkpoint(ckpt)
    out = ckpt / "ref_dac_F32.gguf"
    conv.convert_and_save(out)
    return model, cfg, out


def test_dac_ref_gguf_roundtrip_parity(dac_ref_gguf):
    import codec_tpu

    model, cfg, path = dac_ref_gguf
    ours = codec_tpu.load_model(path)
    assert ours.n_q == cfg.n_codebooks

    x = (np.random.default_rng(3).standard_normal(320 * 20)
         .astype(np.float32) * 0.1)
    got_codes = np.asarray(ours.encode(x))
    with torch.no_grad():
        enc = model.encode(torch.from_numpy(x)[None, None])
        want_codes = enc.audio_codes[0].T.numpy()
    np.testing.assert_array_equal(got_codes, want_codes)

    pcm = np.asarray(ours.decode(got_codes)).reshape(-1)
    with torch.no_grad():
        ref = model.decode(enc.quantized_representation,
                           ).audio_values.reshape(-1).numpy()
    n = min(pcm.shape[0], ref.shape[0])
    corr = np.corrcoef(pcm[:n], ref[:n])[0, 1]
    assert corr >= 0.997, corr                 # e2e config dac threshold


@pytest.fixture(scope="module")
def wt_ref_gguf(ref_converters, tmp_path_factory):
    """Repo torch WavTokenizer mirror → upstream-named .ckpt → reference
    WavTokenizerConverter → F32 GGUF."""
    from test_wavtokenizer_parity import TorchWT

    torch.manual_seed(0)
    ref = TorchWT().eval()
    sd = {k: torch.as_tensor(np.asarray(v))
          for k, v in ref.source_state_dict().items()}
    ckpt = tmp_path_factory.mktemp("xeng_wt_ckpt") / "wavtokenizer.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    conv = ref_converters.WavTokenizerConverter(quantization="F32")
    conv.load_from_checkpoint(ckpt)
    out = ckpt.parent / "ref_wt_F32.gguf"
    conv.convert_and_save(out)
    return ref, out


def test_wt_ref_gguf_roundtrip_parity(wt_ref_gguf):
    import codec_tpu
    from test_wavtokenizer_parity import HOP, V

    ref, path = wt_ref_gguf
    ours = codec_tpu.load_model(path)
    assert ours.hop_size == HOP and ours.n_q == 1

    rng = np.random.default_rng(4)
    codes = rng.integers(0, V, (9, 1)).astype(np.int32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes.T)).numpy()[0]
    got = np.asarray(ours.decode(codes)).reshape(-1)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, corr

    pcm = (rng.standard_normal(HOP * 5) * 0.1).astype(np.float32)
    with torch.no_grad():
        want_codes = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got_codes = np.asarray(ours.encode(pcm))[:, 0]
    np.testing.assert_array_equal(got_codes, want_codes)


@pytest.fixture(scope="module")
def snac_ref_gguf(ref_converters, tmp_path_factory):
    """Repo torch SNAC mirror (upstream parametrizations naming) →
    upstream-format checkpoint dir → reference SnacConverter → F32 GGUF."""
    from test_snac_parity import (CB_DIM, DEC_DIM, DEC_RATES, ENC_DIM, RATES,
                                  V, VQ_STRIDES, TorchSNAC)

    ref = TorchSNAC()
    ckpt = tmp_path_factory.mktemp("xeng_snac")
    torch.save(ref.sd, ckpt / "pytorch_model.bin")
    (ckpt / "config.json").write_text(json.dumps({
        "sampling_rate": 24000, "encoder_dim": ENC_DIM,
        "encoder_rates": list(RATES), "decoder_dim": DEC_DIM,
        "decoder_rates": list(DEC_RATES), "attn_window_size": None,
        "codebook_size": V, "codebook_dim": CB_DIM,
        "vq_strides": list(VQ_STRIDES), "noise": True, "depthwise": True}))

    conv = ref_converters.SnacConverter(quantization="F32")
    conv.load_from_checkpoint(ckpt)
    out = ckpt / "ref_snac_F32.gguf"
    conv.convert_and_save(out)
    return ref, out


def test_snac_ref_gguf_roundtrip_parity(snac_ref_gguf):
    """Reference-written SNAC GGUF (multi-scale RVQ, Orpheus packing,
    depthwise stacks) through this framework: bit-exact encode codes and
    decode waveform parity vs the torch mirror."""
    import torch.nn.functional as F

    import codec_tpu
    from test_snac_parity import HOP, PAD_TO, V

    ref, path = snac_ref_gguf
    ours = codec_tpu.load_model(path)
    assert ours.hop_size == HOP and ours.n_q == 3

    rng = np.random.default_rng(6)
    packed = rng.integers(0, V, (1, 8, 3)).astype(np.int64)
    packed[:, :, 0] = np.repeat(packed[:, ::4, 0], 4, axis=1)
    packed[:, :, 1] = np.repeat(packed[:, ::2, 1], 2, axis=1)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(packed)).numpy()[0, 0]
    got = np.asarray(ours.decode(packed[0].astype(np.int32)))
    corr = np.corrcoef(got, want)[0, 1]
    # the reference converter reconstructs weight_norm in f64 (its
    # _apply_weight_norm) vs the mirror's f32 — float-dust weight deltas
    # that SNAC's snake stack amplifies; e2e gate for snac is corr>=0.99
    assert corr > 0.999, corr

    n = PAD_TO + 700
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    pad = -(-n // PAD_TO) * PAD_TO - n
    with torch.no_grad():
        want_codes = ref.encode(
            F.pad(torch.from_numpy(pcm)[None, None], (0, pad))).numpy()[0]
    got_codes = np.asarray(ours.encode(pcm))
    np.testing.assert_array_equal(got_codes, want_codes)


def test_dac_ref_gguf_q4_k_m(dac_ref_gguf, ref_converters, tmp_path):
    """The reference converter's Q4_K_M bit-stream (256-block K-quants,
    12-byte packed scales/mins) decoded by this framework: waveform parity
    within the e2e harness's Q4_K_M relaxation (corr −0.20 vs the F32
    gate; tests/e2e/runner.py:40-56)."""
    from transformers import DacConfig

    import codec_tpu

    model, cfg, _f32_path = dac_ref_gguf
    ckpt = tmp_path / "ckpt"
    model.save_pretrained(ckpt, safe_serialization=True)
    (ckpt / "config.json").write_text(json.dumps(cfg.to_dict()))
    conv = ref_converters.DacConverter(quantization="Q4_K_M")
    conv.load_from_checkpoint(ckpt)
    qpath = tmp_path / "ref_dac_q4km.gguf"
    conv.convert_and_save(qpath)

    ours = codec_tpu.load_model(qpath)
    rng = np.random.default_rng(8)
    codes = rng.integers(0, cfg.codebook_size, (15, cfg.n_codebooks)
                         ).astype(np.int32)
    got = np.asarray(ours.decode(codes)).reshape(-1)
    with torch.no_grad():
        q = model.quantizer.from_codes(
            torch.from_numpy(codes.T[None]))[0]
        want = model.decode(q).audio_values.reshape(-1).numpy()
    n = min(got.shape[0], want.shape[0])
    corr = np.corrcoef(got[:n], want[:n])[0, 1]
    assert corr >= 0.997 - 0.20, corr

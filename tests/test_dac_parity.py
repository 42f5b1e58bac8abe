"""DAC parity vs HF transformers DacModel (tiny random weights)."""

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def tiny_dac(tmp_path_factory):
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    cfg = DacConfig(
        encoder_hidden_size=8,
        decoder_hidden_size=32,
        downsampling_ratios=[2, 4, 5, 8],
        upsampling_ratios=[8, 5, 4, 2],
        n_codebooks=4,
        codebook_size=32,
        codebook_dim=4,
        hidden_size=64,
        sampling_rate=24000,
    )
    model = DacModel(cfg).eval()

    from codec_tpu.convert import get_converter

    conv = get_converter("dac")(quantization="F32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    conv.load_from_state_dict(sd, cfg.to_dict())
    path = tmp_path_factory.mktemp("dac") / "tiny_dac.gguf"
    conv.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return model, ours, cfg


def test_config(tiny_dac):
    _, ours, cfg = tiny_dac
    assert ours.arch == "dac"
    assert ours.hop_size == 320
    assert ours.n_q == 4
    assert ours.latent_dim == 64


def test_decode_parity(tiny_dac):
    hf, ours, cfg = tiny_dac
    rng = np.random.default_rng(0)
    t = 11
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.n_codebooks, t))
    with torch.no_grad():
        want = hf.decode(audio_codes=torch.from_numpy(codes)).audio_values.numpy()[0]
    got = ours.decode(codes[0].T)
    assert got.shape == want.shape
    corr = np.corrcoef(got, want)[0, 1]
    err = np.abs(got - want).max()
    assert corr > 0.9999, f"corr={corr}"
    assert err < 1e-3, f"err={err}"


def test_encode_parity_codes(tiny_dac):
    hf, ours, cfg = tiny_dac
    rng = np.random.default_rng(1)
    n = 320 * 6
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf.encode(torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]  # [Q, T]
    got = ours.encode(pcm)
    assert got.shape == (want.shape[1], want.shape[0])
    mismatch = int((got != want.T).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} codes differ"


def test_decode_latent(tiny_dac):
    hf, ours, cfg = tiny_dac
    rng = np.random.default_rng(2)
    z = rng.standard_normal((1, cfg.hidden_size, 7)).astype(np.float32)
    with torch.no_grad():
        want = hf.decode(quantized_representation=torch.from_numpy(z)).audio_values.numpy()[0]
    got = ours.decode_latent(z[0].T)
    assert np.corrcoef(got, want)[0, 1] > 0.9999

    # i16 output (the decode-latent CLI path): write_wav-exact conversion
    i16 = ours.decode_latent(z[0].T, pcm_format="i16")
    assert i16.dtype == np.int16 and i16.shape == got.shape
    host = np.clip(np.rint(got * 32767.0), -32768, 32767).astype(np.int16)
    # f32 and i16 outputs come from two separate compiles; allow the
    # documented cross-compile float-reorder drift (CLAUDE.md)
    assert np.abs(i16.astype(np.int32) - host.astype(np.int32)).max() <= 2


def test_partial_nq(tiny_dac):
    hf, ours, cfg = tiny_dac
    rng = np.random.default_rng(3)
    codes = rng.integers(0, cfg.codebook_size, (1, 2, 9))
    with torch.no_grad():
        # HF: from_codes with fewer codebooks
        q = hf.quantizer.from_codes(torch.from_numpy(codes))[0]
        want = hf.decoder(q).numpy()[0, 0]
    full = np.zeros((9, cfg.n_codebooks), dtype=np.int32)
    full[:, :2] = codes[0].T
    got = ours.decode(full, n_q=2)
    assert np.corrcoef(got, want)[0, 1] > 0.9999

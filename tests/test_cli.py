"""CLI smoke tests (reference analog: examples/codec-cli.cpp usage in
tests/e2e/runner.py subprocess drives)."""

import numpy as np
import pytest

from codec_tpu.io.wav import read_wav, write_wav


@pytest.fixture(scope="module")
def wt_gguf(tmp_path_factory):
    from test_wavtokenizer_parity import HOP, TorchWT
    from codec_tpu.convert import get_converter

    ref = TorchWT().eval()
    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    path = tmp_path_factory.mktemp("cli") / "wt.gguf"
    c.convert_and_save(path)
    return path


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 24000)
    y, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 16000)


def test_cli_info(wt_gguf, capsys):
    from codec_tpu.cli.codec_cli import main

    assert main(["info", "--model", str(wt_gguf)]) == 0
    out = capsys.readouterr().out
    assert "wavtokenizer_large" in out
    assert "codec.sample_rate = 24000" in out


def test_cli_e2e(wt_gguf, tmp_path, capsys):
    from codec_tpu.cli.codec_cli import main

    rng = np.random.default_rng(1)
    wav_in = tmp_path / "in.wav"
    write_wav(wav_in, (rng.standard_normal(320 * 4) * 0.2).astype(np.float32), 24000)

    codes_f = tmp_path / "c.npy"
    assert main(["encode", "--model", str(wt_gguf), "--in", str(wav_in),
                 "--codes", str(codes_f)]) == 0
    codes = np.load(codes_f)
    assert codes.shape == (4, 1) and codes.dtype == np.int32

    wav_out = tmp_path / "out.wav"
    assert main(["decode", "--model", str(wt_gguf), "--codes", str(codes_f),
                 "--out", str(wav_out)]) == 0
    y, sr = read_wav(wav_out)
    assert sr == 24000 and y.shape[0] == 4 * 320

    assert main(["e2e", "--model", str(wt_gguf), "--in", str(wav_in),
                 "--out", str(tmp_path / "e2e.wav")]) == 0


def test_batch_decode_cli(wt_gguf, tmp_path):
    from codec_tpu.cli.batch_decode import main

    rng = np.random.default_rng(2)
    files = []
    for i, t in enumerate((3, 5)):
        f = tmp_path / f"s{i}.npy"
        np.save(f, rng.integers(0, 64, (t, 1)).astype(np.int32))
        files.append(str(f))
    out_dir = tmp_path / "outs"
    assert main(["--model", str(wt_gguf), "--codes", *files,
                 "--out-dir", str(out_dir)]) == 0
    y0, _ = read_wav(out_dir / "s0.wav")
    y1, _ = read_wav(out_dir / "s1.wav")
    assert y0.shape[0] == 3 * 320 and y1.shape[0] == 5 * 320

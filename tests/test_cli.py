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


def test_model_metadata_accessors(wt_gguf):
    """Reference codec_model_* accessor parity (src/codec.cpp:815-877):
    n_fft/win_length/n_mels from codec.* KVs (-1 when absent), name,
    n_tensors."""
    import codec_tpu

    m = codec_tpu.load_model(str(wt_gguf))
    # WavTokenizer writes no mel/fft KVs (reference converter likewise):
    # the accessors fall back to -1 exactly like codec_model_n_fft
    assert m.n_fft == -1 and m.n_mels == -1 and m.win_length == -1
    assert m.n_tensors == len(m.reader.tensors) > 0
    assert m.name == "WavTokenizer"
    # present KV: NeuCodec's converter writes codec.n_fft — emulate via
    # metadata injection (the property reads the KV dict)
    m.metadata["codec.n_fft"] = 1280
    assert m.n_fft == 1280


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

    # --pipeline (decode_many) must match per-sequence decodes exactly.
    # (NOT the batched run above: WavTokenizer is non-causal, so the
    # batched pad-to-max graph legitimately differs from exact-length
    # decodes — the pipelined path is the one that matches the
    # reference's serial per-sequence semantics.)
    pipe_dir = tmp_path / "outs_pipe"
    assert main(["--model", str(wt_gguf), "--codes", *files,
                 "--out-dir", str(pipe_dir), "--pipeline"]) == 0
    for i, name in enumerate(("s0.wav", "s1.wav")):
        single_dir = tmp_path / f"out_single{i}"
        assert main(["--model", str(wt_gguf), "--codes", files[i],
                     "--out-dir", str(single_dir)]) == 0
        a, _ = read_wav(single_dir / name)
        b, _ = read_wav(pipe_dir / name)
        # separate main() calls retrace/recompile; XLA float-reorder can
        # flip a 16-bit sample by one LSB (CLAUDE.md)
        np.testing.assert_allclose(a, b, atol=1.5 / 32767)


def test_decode_many_and_async_match_decode(wt_gguf):
    import codec_tpu
    from codec_tpu.runtime.model import PendingPcm

    m = codec_tpu.load_model(wt_gguf)
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 64, (t, 1)).astype(np.int32) for t in (3, 9, 5)]
    want = [m.decode(s) for s in seqs]

    got = m.decode_many(seqs)
    assert len(got) == len(seqs)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)

    pending = [m.decode_async(s) for s in seqs]
    for w, p in zip(want, pending):
        np.testing.assert_array_equal(w, p.result())
    np.testing.assert_array_equal(
        want[0], PendingPcm.gather([m.decode_async(seqs[0])])[0])


def test_encode_i16_input_matches_f32(wt_gguf):
    import codec_tpu

    m = codec_tpu.load_model(wt_gguf)
    rng = np.random.default_rng(6)
    pcm_i16 = (rng.integers(-30000, 30000, 320 * 5)).astype(np.int16)
    codes_i = m.encode(pcm_i16)
    codes_f = m.encode(pcm_i16.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(codes_i, codes_f)


def test_decode_i16_matches_host_conversion(wt_gguf):
    import codec_tpu

    m = codec_tpu.load_model(wt_gguf)
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 64, (6, 1)).astype(np.int32)
    f = m.decode(codes)
    i = m.decode(codes, pcm_format="i16")
    assert i.dtype == np.int16 and i.shape == f.shape
    host = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int16)
    # separate compiles may reorder float math; allow 1 LSB on near-ties
    assert np.abs(i.astype(np.int32) - host.astype(np.int32)).max() <= 1
    many = m.decode_many([codes], pcm_format="i16")[0]
    np.testing.assert_array_equal(i, many)


def test_all_model_classes_accept_pcm_format():
    """Every registered arch's decode/decode_latent (and any encode
    override) must accept the keyword arguments the CLIs pass
    unconditionally — regression for overrides missing pcm_format."""
    import inspect

    from codec_tpu.models import registry
    from codec_tpu.models.registry import get_model_class, known_archs

    for arch in known_archs():
        cls = get_model_class(arch)
        for meth in ("decode", "decode_latent"):
            sig = inspect.signature(getattr(cls, meth))
            assert "pcm_format" in sig.parameters, (arch, meth)
        sig = inspect.signature(cls.encode)
        assert "n_q" in sig.parameters, arch


def test_exact_encode_flag(wt_gguf, tmp_path):
    """--exact-encode pins the encode graph to f32 HIGHEST matmul
    precision (TPU code-parity mode, tools/tpu_parity.py). On CPU f32 is
    f32 either way, so codes must be identical to the default path —
    this pins the flag plumbing (load_model kwarg, env fallback, jit
    cache keying) without needing the TPU."""
    import codec_tpu
    from codec_tpu.cli.codec_cli import main

    rng = np.random.default_rng(2)
    wav_in = tmp_path / "in.wav"
    write_wav(wav_in, (rng.standard_normal(320 * 4) * 0.2).astype(np.float32),
              24000)
    a, b = tmp_path / "a.npy", tmp_path / "b.npy"
    assert main(["encode", "--model", str(wt_gguf), "--in", str(wav_in),
                 "--codes", str(a)]) == 0
    assert main(["encode", "--model", str(wt_gguf), "--in", str(wav_in),
                 "--codes", str(b), "--exact-encode"]) == 0
    np.testing.assert_array_equal(np.load(a), np.load(b))

    m = codec_tpu.load_model(wt_gguf, exact_encode=True)
    assert m.exact_encode
    import os
    os.environ["CODEC_EXACT_ENCODE"] = "0"
    try:
        assert not codec_tpu.load_model(wt_gguf).exact_encode
    finally:
        del os.environ["CODEC_EXACT_ENCODE"]
    # exact is the f32-compute default (parity mode); 16-bit stays fast
    assert codec_tpu.load_model(wt_gguf).exact_encode
    assert not codec_tpu.load_model(
        wt_gguf, compute_dtype="bfloat16").exact_encode

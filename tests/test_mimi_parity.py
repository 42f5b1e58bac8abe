"""End-to-end Mimi parity vs HuggingFace transformers MimiModel.

Mirrors the reference e2e harness strategy (reference: tests/e2e/runner.py —
HF reference model vs engine output, code-level and waveform-level
comparison) but with a tiny random-weight model so no network is needed.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_mimi(tmp_path_factory):
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig(
        sampling_rate=24000,
        frame_rate=12.5,
        audio_channels=1,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        head_dim=32,
        num_key_value_heads=2,
        intermediate_size=128,
        num_filters=8,
        num_residual_layers=1,
        codebook_size=64,
        codebook_dim=32,
        vector_quantization_hidden_dimension=32,
        num_quantizers=4,
        num_semantic_quantizers=1,
        sliding_window=250,
        upsample_groups=64,
        upsampling_ratios=[8, 6, 5, 4],
        use_causal_conv=True,
    )
    model = MimiModel(cfg).eval()

    from codec_tpu.convert import get_converter

    conv = get_converter("mimi")(quantization="F32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    conv.load_from_state_dict(sd, cfg.to_dict())
    path = tmp_path_factory.mktemp("mimi") / "tiny_mimi.gguf"
    conv.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return model, ours, cfg


def test_config_load(tiny_mimi):
    _, ours, cfg = tiny_mimi
    assert ours.arch == "mimi"
    assert ours.sample_rate == 24000
    assert ours.hop_size == 1920
    assert ours.n_q == 4
    assert ours.codebook_size == 64
    assert ours.has_encoder and ours.has_decoder


def test_decode_parity(tiny_mimi):
    hf, ours, cfg = tiny_mimi
    rng = np.random.default_rng(0)
    t = 9
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, t))
    with torch.no_grad():
        want = hf.decode(torch.from_numpy(codes))[0].numpy()[0, 0]
    got = ours.decode(codes[0].T)  # ours: [T, Q]
    assert got.shape == want.shape == (t * 1920,)
    err = np.abs(got - want).max()
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert err < 1e-3, f"max abs err={err}"


def test_encode_parity_bit_exact_codes(tiny_mimi):
    hf, ours, cfg = tiny_mimi
    rng = np.random.default_rng(1)
    n = 4 * 1920 + 517  # not frame aligned → exercises ceil padding
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf.encode(torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]  # [Q, T]
    got = ours.encode(pcm)  # [T, Q]
    assert got.shape == (want.shape[1], want.shape[0])
    mismatch = (got != want.T).sum()
    assert mismatch == 0, f"{mismatch}/{got.size} RVQ codes differ"


def test_roundtrip_vs_hf_roundtrip(tiny_mimi):
    hf, ours, cfg = tiny_mimi
    rng = np.random.default_rng(2)
    n = 3 * 1920
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(pcm)[None, None]).audio_codes
        want = hf.decode(enc)[0].numpy()[0, 0]
    got = ours.decode(ours.encode(pcm))
    m = min(len(got), len(want))
    corr = np.corrcoef(got[:m], want[:m])[0, 1]
    assert corr > 0.9999, f"roundtrip corr vs HF: {corr}"


def test_partial_nq_decode(tiny_mimi):
    hf, ours, cfg = tiny_mimi
    rng = np.random.default_rng(3)
    codes = rng.integers(0, cfg.codebook_size, (6, cfg.num_quantizers)).astype(np.int32)
    with torch.no_grad():
        want = hf.decode(torch.from_numpy(codes.T[None, :2]))[0].numpy()[0, 0]
    got = ours.decode(codes, n_q=2)
    assert np.corrcoef(got, want)[0, 1] > 0.9999


def test_batched_decode_matches_single(tiny_mimi):
    _, ours, cfg = tiny_mimi
    rng = np.random.default_rng(4)
    codes = rng.integers(0, cfg.codebook_size, (3, 7, cfg.num_quantizers)).astype(np.int32)
    batched = ours.decode(codes)
    for i in range(3):
        single = ours.decode(codes[i])
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)


def test_bucketing_consistency(tiny_mimi):
    """Different lengths hitting the same bucket produce identical prefixes."""
    _, ours, cfg = tiny_mimi
    rng = np.random.default_rng(5)
    codes = rng.integers(0, cfg.codebook_size, (14, cfg.num_quantizers)).astype(np.int32)
    full = ours.decode(codes)
    short = ours.decode(codes[:10])
    np.testing.assert_allclose(short, full[: 10 * 1920], rtol=1e-5, atol=1e-6)


def test_streaming_decode_matches_full(tiny_mimi):
    """Chunked streaming decode == full-sequence decode (carried conv
    tails + sliding-window KV; reference has no streaming path)."""
    _, ours, cfg = tiny_mimi
    rng = np.random.default_rng(5)
    t = 24
    codes = rng.integers(0, cfg.codebook_size, (t, cfg.num_quantizers)).astype(np.int32)
    want = ours.decode(codes)

    for chunk in (1, 3, 8):
        dec = ours.streaming_decoder()
        got = np.concatenate([dec.push(codes[i:i + chunk])
                              for i in range(0, t, chunk)])
        err = np.abs(got - want).max()
        assert err < 2e-5, f"chunk={chunk}: max err {err}"


def test_streaming_decoder_reset_and_batch(tiny_mimi):
    _, ours, cfg = tiny_mimi
    rng = np.random.default_rng(6)
    codes = rng.integers(0, cfg.codebook_size, (2, 6, cfg.num_quantizers)).astype(np.int32)
    want = ours.decode(codes)
    dec = ours.streaming_decoder(batch=2)
    a = dec.push(codes[:, :4])
    b = dec.push(codes[:, 4:])
    got = np.concatenate([a, b], axis=1)
    np.testing.assert_allclose(got, want, atol=2e-5)
    dec.reset()
    a2 = dec.push(codes[:, :4])
    np.testing.assert_allclose(a2, a, atol=1e-6)


def test_streaming_encode_matches_full(tiny_mimi):
    """Chunked streaming encode emits the same codes as full encode
    (incl. the replicate-pad stride-2 downsample's first-chunk edge pad)."""
    _, ours, cfg = tiny_mimi
    rng = np.random.default_rng(7)
    hop = ours.hop_size
    n = hop * 12
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    want = ours.encode(pcm)

    for chunk in (hop, 3 * hop, 5 * hop):
        enc = ours.streaming_encoder()
        got = np.concatenate([enc.push(pcm[i:i + chunk])
                              for i in range(0, n, chunk)
                              if i + chunk <= n or (n - i) % hop == 0])
        m = min(len(got), len(want))
        mism = int((got[:m] != want[:m]).sum())
        assert mism == 0, f"chunk={chunk}: {mism} code mismatches"

    enc = ours.streaming_encoder()
    with pytest.raises(ValueError):
        enc.push(pcm[: hop + 7])


def test_decode_many_groups_same_bucket(tiny_mimi):
    """Causal arch: sequences with different T but the same length bucket
    decode as ONE batched graph and crop to each T — results match
    per-sequence decode() exactly (same jit cache in one process)."""
    _, ours, _ = tiny_mimi
    rng = np.random.default_rng(9)
    seqs = [rng.integers(0, ours.codebook_size,
                         (t, ours.n_q)).astype(np.int32) for t in (5, 3, 7)]
    want = [ours.decode(s) for s in seqs]
    got = ours.decode_many(seqs)
    # all three land in one bucket (bucket_length<=16) -> at most one new
    # batched graph beyond whatever earlier tests compiled
    assert ("dec", 4, 16, ours.n_q, "f32") in ours._jit_cache
    for w, g in zip(want, got):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=1e-5)

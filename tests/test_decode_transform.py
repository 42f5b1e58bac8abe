"""LM codes→codec codes decode transform (reference: init_decode_transform
common/audio_lm.cpp:218-263 + audio_lm_decode_audio :1513-1580).

The oracle mirrors the HF MOSS-TTSD processor's `shifting_outputs()` in
torch (per-codebook roll to reverse the delay-pattern emission shift, then
the merged-vocab speech remap on the first audio codebook) — implemented
independently of codec_tpu.lm.decode_transform so agreement is evidence,
not tautology.
"""

import numpy as np
import pytest
import torch

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm.audio_lm import AudioLM
from codec_tpu.lm.base import LmError
from codec_tpu.lm.decode_transform import (DecodeTransform,
                                           build_decode_transform,
                                           transform_lm_codes)

from test_lm_adaptors import H, N_CB, SIZES  # noqa: F401
from test_audio_lm import StubBackbone  # noqa: F401


# ── torch oracle (HF shifting_outputs semantics) ────────────────────────

def shifting_outputs_oracle(grid: np.ndarray, delays, audio_offset: int,
                            speech_offset: int, codebook_size: int,
                            t_out: int) -> np.ndarray:
    """grid [T, n_cb] → [t_out, n_q] via per-codebook torch.roll unshift."""
    g = torch.from_numpy(np.asarray(grid, np.int64))
    cols = []
    for q, d in enumerate(delays):
        col = torch.roll(g[:, audio_offset + q], shifts=-int(d), dims=0)
        cols.append(col[:t_out])
    out = torch.stack(cols, dim=1)
    if speech_offset:
        out[:, 0] -= speech_offset
    if codebook_size > 0:
        out = out.clamp(0, codebook_size - 1)
    return out.numpy().astype(np.int32)


def test_transform_matches_oracle_moss_ttsd_shape():
    """MOSS-TTSD: 8 codebooks, delay [0..7], merged-cb0 speech remap."""
    rng = np.random.default_rng(0)
    n_cb, T, cbsz, spoff = 8, 40, 1024, 151665
    delays = tuple(range(n_cb))
    grid = rng.integers(0, cbsz, size=(T, n_cb)).astype(np.int32)
    grid[:, 0] += spoff                       # merged text+speech cb0 ids
    tr = DecodeTransform(audio_cb_offset=0, cb0_speech_offset=spoff,
                         delay_pattern=delays)
    got = transform_lm_codes(grid, tr, codebook_size=cbsz)
    want = shifting_outputs_oracle(grid, delays, 0, spoff, cbsz,
                                   T - max(delays))
    assert got.shape == (T - 7, n_cb)
    np.testing.assert_array_equal(got, want)


def test_transform_matches_oracle_moshi_shape():
    """Moshi: cb0 is a text channel (dropped), acoustic delay on cbs 2+."""
    rng = np.random.default_rng(1)
    n_cb, T, cbsz = 9, 25, 2048
    full_delays = (0, 0, 1, 1, 1, 1, 1, 1, 1)   # over the FULL n_cb
    grid = rng.integers(0, cbsz, size=(T, n_cb)).astype(np.int32)
    grid[:, 0] = rng.integers(0, 32000, size=T)  # text tokens
    tr = DecodeTransform(audio_cb_offset=1, delay_pattern=full_delays)
    got = transform_lm_codes(grid, tr, codebook_size=cbsz)
    audio_delays = full_delays[1:]
    want = shifting_outputs_oracle(grid, audio_delays, 1, 0, cbsz, T - 1)
    assert got.shape == (T - 1, n_cb - 1)
    np.testing.assert_array_equal(got, want)


def test_transform_identity_and_errors():
    rng = np.random.default_rng(2)
    grid = rng.integers(0, 50, size=(6, 4)).astype(np.int32)
    tr = DecodeTransform()
    np.testing.assert_array_equal(transform_lm_codes(grid, tr), grid)
    # identity layout passes codes through RAW — the reference only clamps
    # inside the rewrite loop (audio_lm.cpp:1556 gates it on offset/delay/
    # remap; the codec's own decode clamps into codebook range)
    out = transform_lm_codes(grid, tr, codebook_size=10)
    np.testing.assert_array_equal(out, grid)
    # any active transform does clamp
    out = transform_lm_codes(grid, DecodeTransform(cb0_speech_offset=1),
                             codebook_size=10)
    assert out.max() <= 9 and out.min() >= 0
    with pytest.raises(LmError):                # offset >= n_cb
        transform_lm_codes(grid, DecodeTransform(audio_cb_offset=4))
    with pytest.raises(LmError):                # too few frames for delay
        transform_lm_codes(grid[:3], DecodeTransform(
            delay_pattern=(0, 1, 2, 3)), n_frames_out=None)
    with pytest.raises(LmError):                # explicit out too long
        transform_lm_codes(grid, DecodeTransform(delay_pattern=(0, 1, 1, 1)),
                           n_frames_out=6)


def test_transform_explicit_n_frames_out():
    """A host that flushed the delay tail passes the speech-frame count so
    the EOS row's cb0 never lands in the output."""
    rng = np.random.default_rng(3)
    n_cb, n_speech, md = 4, 10, 3
    delays = (0, 1, 2, 3)
    grid = rng.integers(0, 100, size=(n_speech + 1 + md, n_cb)).astype(np.int32)
    tr = DecodeTransform(delay_pattern=delays)
    got = transform_lm_codes(grid, tr, n_frames_out=n_speech)
    want = shifting_outputs_oracle(grid, delays, 0, 0, 0, n_speech)
    np.testing.assert_array_equal(got, want)


# ── metadata derivation (init_decode_transform) ─────────────────────────

def _mk_reader(tmp_path, name, kvs, arrays=()):
    path = tmp_path / name
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.lm.has_adaptor", True)
    for k, v in kvs.items():
        if isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, int):
            w.add_int32(k, v)
        else:
            w.add_string(k, v)
    for k, v in arrays:
        w.add_array(k, v)
    w.add_tensor("dummy", np.zeros((2, 2), np.float32))
    w.write()
    return GGUFReader(path)


class _Info:
    def __init__(self, n_cb, delays):
        self.n_codebook = n_cb
        self.delay_pattern = tuple(delays)


def test_build_transform_families(tmp_path):
    # MOSS-TTSD: merged cb0, delay, composed prompt
    r = _mk_reader(tmp_path, "ttsd.gguf",
                   {"codec.lm.kind": "parallel_heads_delay",
                    "codec.lm.cb0_speech_offset": 151665,
                    "codec.lm.speech_pad_token": 152694})
    tr = build_decode_transform(r, _Info(8, range(8)))
    assert tr.cb0_speech_offset == 151665
    assert tr.delay_pattern == tuple(range(8))
    assert tr.prompt_needs_composed and tr.speech_pad_code == 152694
    assert tr.audio_cb_offset == 0 and tr.max_delay(8) == 7

    # Moshi: residual_depth_ar + c0 text modality → drop cb0
    r = _mk_reader(tmp_path, "moshi.gguf",
                   {"codec.lm.kind": "residual_depth_ar",
                    "codec.lm.residual.c0_input_modality": "text"})
    tr = build_decode_transform(r, _Info(9, [0, 0] + [1] * 7))
    assert tr.audio_cb_offset == 1 and not tr.prompt_needs_composed
    assert tr.audio_delays(9) == (0,) + (1,) * 7 and tr.max_delay(9) == 1

    # CSM: audio c0, zero delays → identity
    r = _mk_reader(tmp_path, "csm.gguf",
                   {"codec.lm.kind": "residual_depth_ar",
                    "codec.lm.residual.c0_input_modality": "audio"})
    tr = build_decode_transform(r, _Info(32, [0] * 32))
    assert tr.is_identity

    # MOSS-TTS-Realtime: c0 modality none → cb0 IS audio, no transform
    r = _mk_reader(tmp_path, "rt.gguf",
                   {"codec.lm.kind": "residual_depth_ar",
                    "codec.lm.residual.c0_input_modality": "none"})
    tr = build_decode_transform(r, _Info(16, [0] * 16))
    assert tr.is_identity

    # no lm info → identity
    assert build_decode_transform(r, None).is_identity


# ── end-to-end through AudioLM / run_codebook_ar ────────────────────────

class StubCodec:
    """Records the codes matrix decode_audio feeds it; emits deterministic
    pseudo-PCM so codes→PCM comparisons are bit-for-bit meaningful."""
    sample_rate = 24000
    hop_size = 4
    latent_dim = 0

    def __init__(self, n_q, codebook_size):
        self.n_q = n_q
        self.codebook_size = codebook_size
        self.last_codes = None
        self.last_n_q = None

    def decode(self, codes, n_q=0):
        codes = np.asarray(codes, np.int32)
        self.last_codes = codes.copy()
        self.last_n_q = n_q
        w = (np.arange(codes.shape[1], dtype=np.int64) + 1)[None, :]
        samp = (codes.astype(np.int64) * w).sum(1).astype(np.float32)
        return np.repeat(samp / 100.0, self.hop_size)


@pytest.fixture()
def ttsd_like_gguf(tmp_path):
    """parallel_heads_delay with merged cb0 (speech range [10,30) of a
    50-token 'text' vocab), delay [0,1,2,3], eos sentinel 7."""
    g = torch.Generator().manual_seed(0)
    path = tmp_path / "ttsd_like.gguf"
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "parallel_heads_delay")
    w.add_string("codec.lm.host_arch", "qwen3")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", N_CB)
    w.add_array("codec.lm.codebook_sizes", SIZES)
    w.add_array("codec.lm.delay_pattern", [0, 1, 2, 3])
    w.add_int32("codec.lm.eos_code_c0", 7)
    w.add_int32("codec.lm.eos_min_step", 2)
    w.add_int32("codec.lm.cb0_speech_offset", 10)
    w.add_int32("codec.lm.cb0_speech_range_end", 30)
    w.add_int32("codec.lm.speech_pad_token", 15)
    embds = []
    for i, v in enumerate(SIZES):
        head = torch.randn(v, H, generator=g) * 0.3
        embd = torch.randn(v, H, generator=g) * 0.5
        w.add_tensor(f"lm.heads_{i}.weight", head.numpy())
        w.add_tensor(f"lm.audio_embd_{i}.weight", embd.numpy())
        embds.append(embd.numpy())
    w.write()
    return path, embds


def test_run_codebook_ar_delay_flush_and_decode(ttsd_like_gguf):
    """Full AR loop on a delay-pattern merged-cb0 model: EOS triggers the
    max(delay)-frame flush (codec_lm.h:387-401) and the decoded PCM is
    bit-for-bit the torch shifting_outputs oracle run through the codec."""
    from codec_tpu.lm.tts_runner import run_codebook_ar

    path, _ = ttsd_like_gguf
    codec = StubCodec(n_q=N_CB, codebook_size=20)
    alm = AudioLM(GGUFReader(path), codec=codec)
    assert alm.decode_transform.cb0_speech_offset == 10
    assert alm.prompt_needs_composed

    n_speech = 5

    def sampler(cb, logits, _n=[0]):
        if cb == 0:
            t = _n[0]
            _n[0] += 1
            return 10 + t if t < n_speech else 7      # speech…, then EOS
        return (3 * cb + _n[0]) % SIZES[cb]

    res = run_codebook_ar(alm, StubBackbone(H, seed=9),
                          [np.zeros(H, np.float32)],
                          max_steps=50, sampler=sampler)
    assert res.stopped_by_eos
    max_delay = 3
    # accumulated rows: n_speech + the EOS frame + the flush tail
    assert res.codes.shape == (n_speech + 1 + max_delay, N_CB)
    # flush rows carry the forced cb0 EOS sentinel
    assert (res.codes[n_speech:, 0] == 7).all()
    assert res.n_steps == n_speech + 1 + max_delay

    # decode saw exactly the oracle's unshifted speech frames
    want = shifting_outputs_oracle(res.codes, (0, 1, 2, 3), 0, 10,
                                   codec.codebook_size, n_speech)
    np.testing.assert_array_equal(codec.last_codes, want)
    np.testing.assert_array_equal(res.pcm, codec.decode(want))


def test_decode_audio_applies_transform(ttsd_like_gguf):
    """AudioLM.push_codes + decode_audio = reference audio_lm_push_codes +
    audio_lm_decode_audio (offline path, T_out = T - max_delay)."""
    path, _ = ttsd_like_gguf
    codec = StubCodec(n_q=N_CB, codebook_size=20)
    alm = AudioLM(GGUFReader(path), codec=codec)
    rng = np.random.default_rng(5)
    grid = np.stack([rng.integers(10, 30, 12),
                     rng.integers(0, 20, 12),
                     rng.integers(0, 20, 12),
                     rng.integers(0, 20, 12)], axis=1).astype(np.int32)
    alm.push_codes(grid)
    pcm = alm.decode_audio()
    want = shifting_outputs_oracle(grid, (0, 1, 2, 3), 0, 10, 20, 12 - 3)
    np.testing.assert_array_equal(codec.last_codes, want)
    np.testing.assert_array_equal(pcm, codec.decode(want))


def test_compose_prompt_embd(ttsd_like_gguf):
    """Composed prompt rows: cb0 = raw merged-vocab token, cb1..N-1 =
    speech_pad, summed over the embedding tables
    (reference: audio_lm_compose_prompt_embd)."""
    path, embds = ttsd_like_gguf
    alm = AudioLM(GGUFReader(path))
    tok = 42
    row = alm.compose_prompt_embd(tok)
    pad = alm.decode_transform.speech_pad_code
    assert pad == 15
    want = embds[0][tok].copy()
    for q in range(1, N_CB):
        want += embds[q][pad]
    np.testing.assert_allclose(row, want, rtol=1e-5, atol=1e-6)


def test_nq_subset_decode(ttsd_like_gguf):
    """MOSS-TTS-Realtime style: the LM predicts fewer codebooks than the
    codec has levels; decode runs with n_q = n_cb (16-of-32 pattern)."""
    path, _ = ttsd_like_gguf
    codec = StubCodec(n_q=32, codebook_size=20)   # codec has 32 levels
    alm = AudioLM(GGUFReader(path), codec=codec)
    rng = np.random.default_rng(6)
    grid = rng.integers(10, 30, size=(8, N_CB)).astype(np.int32)
    alm.push_codes(grid)
    alm.decode_audio()
    assert codec.last_codes.shape[1] == N_CB      # subset width passed through

"""DSP front-end parity vs transformers feature extractors (the same
oracles the reference's audio_dsp formulas were validated against)."""

import numpy as np
import pytest

from codec_tpu.dsp import (
    mel_filter_bank,
    slaney_mel_filterbank,
    w2v_bert_features,
    whisper_log_mel,
)


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mfb

    for kwargs in (
        dict(num_frequency_bins=257, num_mel_filters=80, min_frequency=20.0,
             max_frequency=8000, sampling_rate=16000, norm=None,
             mel_scale="kaldi", triangularize_in_mel_space=True),
        dict(num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
             max_frequency=8000.0, sampling_rate=16000, norm="slaney",
             mel_scale="slaney"),
        dict(num_frequency_bins=129, num_mel_filters=40, min_frequency=0.0,
             max_frequency=11025.0, sampling_rate=22050, norm=None,
             mel_scale="htk"),
    ):
        got = mel_filter_bank(**kwargs)
        want = hf_mfb(**kwargs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_w2v_bert_features_vs_seamless():
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor(num_mel_bins=80, stride=2,
                                     padding_value=1.0, sampling_rate=16000)
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = fe(pcm, sampling_rate=16000, return_tensors="np", padding=False,
             do_normalize_per_mel_bins=True)
    want = out["input_features"][0]                    # [T, 160]
    got = w2v_bert_features(pcm)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_whisper_log_mel_vs_hf():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = fe(pcm, sampling_rate=16000, return_tensors="np", padding=False)
    want = out["input_features"][0]                    # [80, T]
    got = whisper_log_mel(pcm)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_slaney_filterbank_shape():
    fb = slaney_mel_filterbank(24000, 1024, 100)
    assert fb.shape == (100, 513)
    # filters are non-negative and each covers some band
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()

"""Quantized-weights path: GGUF Q8_0/Q4_K_M models load and stay within the
reference's relaxed parity thresholds (reference: tests/e2e/runner.py:40-56 —
Q8_0 corr −0.015, Q4_K_M corr −0.20)."""

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def hf_mimi():
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig(
        sampling_rate=24000, frame_rate=12.5, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=2, head_dim=32,
        num_key_value_heads=2, intermediate_size=128, num_filters=8,
        num_residual_layers=1, codebook_size=64, codebook_dim=32,
        vector_quantization_hidden_dimension=32, num_quantizers=4,
        num_semantic_quantizers=1, sliding_window=250, upsample_groups=64,
        upsampling_ratios=[8, 6, 5, 4], use_causal_conv=True,
    )
    return MimiModel(cfg).eval(), cfg


def _convert(model, cfg, quant, path):
    from codec_tpu.convert import get_converter

    c = get_converter("mimi")(quantization=quant)
    c.load_from_state_dict({k: v.numpy() for k, v in model.state_dict().items()},
                           cfg.to_dict())
    c.convert_and_save(path)


@pytest.mark.parametrize("quant,min_corr", [("F16", 0.999), ("Q8_0", 0.98)])
def test_quantized_mimi_decode(hf_mimi, tmp_path, quant, min_corr):
    import codec_tpu

    model, cfg = hf_mimi
    path = tmp_path / f"mimi_{quant}.gguf"
    _convert(model, cfg, quant, path)

    ours = codec_tpu.load_model(path)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 64, (1, 4, 7))
    with torch.no_grad():
        want = model.decode(torch.from_numpy(codes))[0].numpy()[0, 0]
    got = ours.decode(codes[0].T)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > min_corr, f"{quant}: corr={corr}"


def test_q8_file_has_quantized_tensors(hf_mimi, tmp_path):
    from codec_tpu.io.gguf import GGUFReader, GGML_TYPE_Q8_0

    model, cfg = hf_mimi
    path = tmp_path / "mimi_q8.gguf"
    _convert(model, cfg, "Q8_0", path)
    r = GGUFReader(path)
    qtypes = {i.ggml_type for i in r.tensors.values()}
    assert GGML_TYPE_Q8_0 in qtypes, "expected some Q8_0 tensors"
    # codebooks must stay full precision
    assert r.tensors["q.s.layers.0.codebook.embed"].ggml_type != GGML_TYPE_Q8_0

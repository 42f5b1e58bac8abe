"""Fused dequant-matmul kernels vs the bit-exact NumPy dequantizer
(interpret mode on CPU; v5e numbers in tools/qmat_micro.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_tpu.io.gguf import (dequantize_q4_k, dequantize_q8_0,
                               quantize_q4_k, quantize_q8_0)
from codec_tpu.ops.qmat_pallas import (dequant_ref, pack_q4_k, pack_q8_0,
                                       q4_k_matmul, q8_0_matmul, qmatmul)


def _mk(out_d, in_d, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((out_d, in_d)) * 0.1).astype(np.float32)


def test_pack_q8_0_dequant_exact():
    w = _mk(128, 256)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    want = dequantize_q8_0(raw.tobytes(), w.size).reshape(w.shape)
    qt = pack_q8_0(raw, w.shape)
    got = np.asarray(dequant_ref(qt))
    np.testing.assert_array_equal(got, want)


def test_pack_q4_k_dequant_exact():
    w = _mk(128, 512)
    raw = np.frombuffer(quantize_q4_k(w), dtype=np.uint8)
    want = dequantize_q4_k(raw.tobytes(), w.size).reshape(w.shape)
    qt = pack_q4_k(raw, w.shape)
    got = np.asarray(dequant_ref(qt))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("m,out_d,in_d", [(1, 128, 256), (4, 256, 512)])
def test_q8_0_matmul_interpret(m, out_d, in_d):
    rng = np.random.default_rng(1)
    w = _mk(out_d, in_d, 1)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    qt = pack_q8_0(raw, w.shape)
    x = rng.standard_normal((m, in_d)).astype(np.float32)
    want = x @ dequantize_q8_0(raw.tobytes(), w.size).reshape(w.shape).T
    got = np.asarray(q8_0_matmul(jnp.asarray(x), jnp.asarray(qt["qs"]),
                                 jnp.asarray(qt["scale"]), interpret=True))
    # bf16 MXU inputs bound the agreement
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("m,out_d,in_d", [(1, 128, 512), (4, 256, 512)])
def test_q4_k_matmul_interpret(m, out_d, in_d):
    rng = np.random.default_rng(2)
    w = _mk(out_d, in_d, 2)
    raw = np.frombuffer(quantize_q4_k(w), dtype=np.uint8)
    qt = pack_q4_k(raw, w.shape)
    x = rng.standard_normal((m, in_d)).astype(np.float32)
    want = x @ dequantize_q4_k(raw.tobytes(), w.size).reshape(w.shape).T
    got = np.asarray(q4_k_matmul(jnp.asarray(x), jnp.asarray(qt["qs"]),
                                 jnp.asarray(qt["scale"]),
                                 jnp.asarray(qt["minv"]), interpret=True))
    # bf16 inputs + f32 accum: abs error grows ~sqrt(in) * bf16 ulp
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=8e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.999


def test_qmatmul_dispatch_cpu_path():
    w = _mk(128, 256, 3)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    qt = {k: (jnp.asarray(v) if not isinstance(v, str) else v)
          for k, v in pack_q8_0(raw, w.shape).items()}
    x = np.random.default_rng(4).standard_normal((3, 5, 256)).astype(np.float32)
    got = np.asarray(qmatmul(jnp.asarray(x), qt))
    want = x.reshape(-1, 256) @ dequantize_q8_0(
        raw.tobytes(), w.size).reshape(w.shape).T
    np.testing.assert_allclose(got.reshape(-1, 128), want, rtol=1e-4,
                               atol=1e-4)


def test_backbone_quantized_exec_matches_dequant_on_load(tmp_path):
    """Q8_0 backbone with quantized=True (CPU fallback = dequant_ref @ dot)
    must match quantized=False (dequant-on-load) exactly — same dequantized
    values either way; only WHERE dequant happens differs."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter
    from codec_tpu.lm.backbone import LlamaBackbone

    torch.manual_seed(0)
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=96, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="Q8_0")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path / "bb_q8.gguf"
    conv.convert_and_save(path)

    dense = LlamaBackbone(str(path), quantized=False)
    quant = LlamaBackbone(str(path), quantized=True)
    # the packed path actually engaged
    assert isinstance(quant.params["layers"]["q"], dict)

    rng = np.random.default_rng(0)
    emb = (rng.standard_normal((5, 64)) * 0.3).astype(np.float32)
    dense.reset()
    quant.reset()
    a = dense.prefill(emb)
    b = quant.prefill(emb)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    for i in range(3):
        x = (rng.standard_normal(64) * 0.3).astype(np.float32)
        np.testing.assert_allclose(dense.step(x), quant.step(x),
                                   rtol=1e-5, atol=1e-5)

"""GGUF reader/writer + quantization tests.

Bit-exactness is checked two ways:
1. Our quantizer output bytes == the reference's pure-NumPy quantizer
   (/root/reference/scripts/utils/quantization.py, imported read-only).
2. Roundtrip error bounds for each format.
"""

import sys

import numpy as np
import pytest

from codec_tpu.io.gguf import (
    GGUFReader,
    GGUFWriter,
    dequantize_q4_k,
    dequantize_q5_k,
    dequantize_q8_0,
    quantize_q4_k,
    quantize_q5_k,
    quantize_q8_0,
)

REF_SCRIPTS = "/root/reference/scripts"


def _ref_quant():
    if REF_SCRIPTS not in sys.path:
        sys.path.insert(0, REF_SCRIPTS)
    from utils import quantization as refq  # noqa: delayed import
    return refq


@pytest.mark.parametrize("rows,cols", [(4, 256), (3, 512), (1, 1024)])
def test_q8_0_matches_reference_bytes(rows, cols):
    refq = _ref_quant()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    ours = quantize_q8_0(x)
    theirs = refq.quantize_tensor_q8_0(x, row_axis=x.ndim - 1)
    assert ours == theirs


@pytest.mark.parametrize("rows,cols", [(2, 256), (3, 512)])
def test_q4_k_matches_reference_bytes(rows, cols):
    refq = _ref_quant()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    assert quantize_q4_k(x) == refq.quantize_tensor_q4_k_m(x, row_axis=x.ndim - 1)


@pytest.mark.parametrize("rows,cols", [(2, 256), (3, 512)])
def test_q5_k_matches_reference_bytes(rows, cols):
    refq = _ref_quant()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    assert quantize_q5_k(x) == refq.quantize_tensor_q5_k_m(x, row_axis=x.ndim - 1)


def test_q8_0_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4096).astype(np.float32)
    y = dequantize_q8_0(quantize_q8_0(x), x.size)
    assert np.max(np.abs(x - y)) < 0.05
    assert np.corrcoef(x, y)[0, 1] > 0.999


def test_q4_k_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(4096).astype(np.float32)
    y = dequantize_q4_k(quantize_q4_k(x), x.size)
    assert np.corrcoef(x, y)[0, 1] > 0.98


def test_q5_k_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(4096).astype(np.float32)
    y = dequantize_q5_k(quantize_q5_k(x), x.size)
    assert np.corrcoef(x, y)[0, 1] > 0.995


def test_q5_k_high_bits_exercised():
    # zero-mean ramps per sub-block → full 0..31 code range → high bits set.
    # (K-quants store sub-block minima as non-negative, so keep minima <= 0.)
    x = np.tile(np.linspace(-0.5, 0.5, 32, dtype=np.float32), 16)
    blob = quantize_q5_k(x)
    qh_any = any(np.frombuffer(blob, dtype=np.uint8)[16:48])
    assert qh_any, "expected 5th bit plane to be used"
    y = dequantize_q5_k(blob, x.size)
    assert np.max(np.abs(x - y)) < 0.04


def test_writer_reader_roundtrip(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, "mimi")
    w.add_name("TestModel")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_int32("codec.eos", -1)
    w.add_float32("codec.rope_theta", 10000.0)
    w.add_bool("codec.has_encoder", True)
    w.add_string("codec.kind", "rvq")
    w.add_array("codec.strides", [4, 5, 6, 8])
    w.add_array("codec.ratios", [0.5, 0.25])

    rng = np.random.default_rng(6)
    f32 = rng.standard_normal((8, 16)).astype(np.float32)
    f16 = rng.standard_normal((3, 5, 7)).astype(np.float32)
    q8 = rng.standard_normal((4, 256)).astype(np.float32)
    q4 = rng.standard_normal((2, 512)).astype(np.float32)
    q5 = rng.standard_normal((2, 256)).astype(np.float32)
    i32 = rng.integers(0, 100, (5,)).astype(np.int32)
    w.add_tensor("a.f32", f32)
    w.add_tensor("a.f16", f16, "F16")
    w.add_tensor("a.q8", q8, "Q8_0")
    w.add_tensor("a.q4", q4, "Q4_K_M")
    w.add_tensor("a.q5", q5, "Q5_K_M")
    w.add_tensor("a.i32", i32)
    w.write()

    r = GGUFReader(path)
    assert r.architecture == "mimi"
    assert r.get_str("general.name") == "TestModel"
    assert r.get_i32("codec.sample_rate") == 24000
    assert r.get_i32("codec.eos") == -1
    assert abs(r.get_f32("codec.rope_theta") - 10000.0) < 1e-6
    assert r.get_bool("codec.has_encoder") is True
    assert r.get_str("codec.kind") == "rvq"
    assert r.get_arr("codec.strides") == [4, 5, 6, 8]
    np.testing.assert_allclose(r.get_arr("codec.ratios"), [0.5, 0.25], rtol=1e-6)
    # typed fallbacks
    assert r.get_i32("missing.key", 42) == 42

    np.testing.assert_array_equal(r.get("a.f32"), f32)
    np.testing.assert_array_equal(r.get("a.f16"), f16.astype(np.float16).astype(np.float32))
    assert r.get("a.q8").shape == q8.shape
    assert np.corrcoef(r.get("a.q8").ravel(), q8.ravel())[0, 1] > 0.999
    assert r.get("a.q4").shape == q4.shape
    assert r.get("a.q5").shape == q5.shape
    np.testing.assert_array_equal(r.get("a.i32"), i32)
    assert r.tensors["a.f32"].shape == (8, 16)
    assert r.tensors["a.f32"].ne == (16, 8)  # ggml order


def test_reader_reads_reference_written_file(tmp_path):
    """Files produced by the reference's own GGUF writer parse identically."""
    sys.path.insert(0, REF_SCRIPTS)
    from utils.gguf_writer import GGUFWriter as RefWriter

    path = tmp_path / "ref.gguf"
    rw = RefWriter(path, "dac")
    rw.add_name("RefModel")
    rw.add_uint32("codec.n_q", 9)
    rng = np.random.default_rng(7)
    t1 = rng.standard_normal((6, 10)).astype(np.float32)
    t2 = rng.standard_normal((2, 256)).astype(np.float32)
    rw.add_tensor("x.w", t1)
    rw.add_tensor("y.w", t2, "Q8_0")
    rw.write()

    r = GGUFReader(path)
    assert r.architecture == "dac"
    assert r.get_i32("codec.n_q") == 9
    np.testing.assert_array_equal(r.get("x.w"), t1)
    assert np.corrcoef(r.get("y.w").ravel(), t2.ravel())[0, 1] > 0.999

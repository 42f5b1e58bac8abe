"""Native C++ dequant library: builds, loads, and is bit-exact vs NumPy."""

import numpy as np
import pytest

from codec_tpu.io import native
from codec_tpu.io.gguf import (
    dequantize_q4_k, dequantize_q5_k, dequantize_q8_0,
    quantize_q4_k, quantize_q5_k, quantize_q8_0,
)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")


@pytest.mark.parametrize("quant,dequant_py,dequant_nat,n", [
    (quantize_q8_0, dequantize_q8_0, "dequantize_q8_0", 4096),
    (quantize_q4_k, dequantize_q4_k, "dequantize_q4_k", 4096),
    (quantize_q5_k, dequantize_q5_k, "dequantize_q5_k", 4096),
])
def test_native_matches_numpy(quant, dequant_py, dequant_nat, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    blob = quant(x)
    raw = np.frombuffer(blob, dtype=np.uint8)
    want = dequant_py(blob, n)
    got = getattr(native, dequant_nat)(raw, n)
    np.testing.assert_array_equal(got, want)


def test_native_f16():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1000).astype(np.float16)
    got = native.f16_to_f32(x.view(np.uint16))
    np.testing.assert_array_equal(got, x.astype(np.float32))
    # specials: zero, subnormal, inf, nan
    sp = np.array([0.0, -0.0, 6e-8, -6e-8, np.inf, -np.inf, np.nan, 65504.0],
                  np.float16)
    got = native.f16_to_f32(sp.view(np.uint16))
    want = sp.astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    mask = ~np.isnan(want)
    np.testing.assert_array_equal(got[mask], want[mask])

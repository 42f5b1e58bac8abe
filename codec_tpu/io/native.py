"""ctypes bindings for the native GGUF dequant library (native/gguf_native.cpp).

Auto-builds with g++ on first use when the shared object is missing (cached
next to this file); falls back to the vectorized NumPy implementations in
io/gguf.py when no compiler is available. The Python and native paths are
bit-exact (tests/test_native.py)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

# cached OUTSIDE the package: a .so inside codec_tpu/ looks like an
# importable extension module to package walkers (and fails)
_SO_PATH = Path(__file__).parent.parent.parent / "native" / "libgguf_native.so"
_SRC_PATH = Path(__file__).parent.parent.parent / "native" / "gguf_native.cpp"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not _SRC_PATH.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-fopenmp",
             "-o", str(_SO_PATH), str(_SRC_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        f32p = ctypes.POINTER(ctypes.c_float)
        for name, args in (
            ("codec_native_dequant_q8_0", [u8p, ctypes.c_int64, f32p]),
            ("codec_native_dequant_q4_k", [u8p, ctypes.c_int64, f32p]),
            ("codec_native_dequant_q5_k", [u8p, ctypes.c_int64, f32p]),
            ("codec_native_f16_to_f32", [u16p, ctypes.c_int64, f32p]),
            ("codec_native_bf16_to_f32", [u16p, ctypes.c_int64, f32p]),
        ):
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = None
        lib.codec_native_version.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _call_u8(fn_name: str, raw: np.ndarray, n_elems: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(n_elems, np.float32)
    getattr(lib, fn_name)(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_elems),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def available() -> bool:
    return get_lib() is not None


def dequantize_q8_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    return _call_u8("codec_native_dequant_q8_0", raw, n_elems)


def dequantize_q4_k(raw: np.ndarray, n_elems: int) -> np.ndarray:
    return _call_u8("codec_native_dequant_q4_k", raw, n_elems)


def dequantize_q5_k(raw: np.ndarray, n_elems: int) -> np.ndarray:
    return _call_u8("codec_native_dequant_q5_k", raw, n_elems)


def f16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    raw_u16 = np.ascontiguousarray(raw_u16, dtype=np.uint16)
    out = np.empty(raw_u16.size, np.float32)
    lib.codec_native_f16_to_f32(
        raw_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(raw_u16.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out

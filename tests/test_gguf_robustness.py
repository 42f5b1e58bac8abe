"""GGUF loader fail-closed behavior on malformed files.

The reference loader rejects any short read / size overflow rather than
proceeding with partial data (reference: src/codec.cpp:374-401, plus the
overflow-checked size math in src/ops/safe_math.cpp). These tests assert
the same discipline here: every corruption below must raise a ValueError
naming the file, never a confusing downstream numpy error or a silent
partial load.
"""

import struct

import numpy as np
import pytest

from codec_tpu.io.gguf import GGUFReader, GGUFWriter


@pytest.fixture()
def good_gguf(tmp_path):
    w = GGUFWriter(tmp_path / "m.gguf", "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_string("general.name", "fixture")
    w.add_array("codec.delays", [0, 1, 2])
    w.add_tensor("enc.w", np.arange(64, dtype=np.float32).reshape(8, 8))
    w.add_tensor("enc.b", np.ones(8, dtype=np.float32))
    w.write()
    return tmp_path / "m.gguf"


def _mutate(path, out, fn):
    data = bytearray(path.read_bytes())
    fn(data)
    out.write_bytes(bytes(data))
    return out


def test_good_file_loads(good_gguf):
    r = GGUFReader(good_gguf)
    assert r.get_i32("codec.sample_rate") == 24000
    np.testing.assert_array_equal(
        r.get("enc.w"), np.arange(64, dtype=np.float32).reshape(8, 8))


def test_bad_magic(good_gguf, tmp_path):
    p = _mutate(good_gguf, tmp_path / "bad.gguf",
                lambda d: d.__setitem__(slice(0, 4), b"GGML"))
    with pytest.raises(ValueError, match="not a GGUF file"):
        GGUFReader(p)


def test_unsupported_version(good_gguf, tmp_path):
    p = _mutate(good_gguf, tmp_path / "bad.gguf",
                lambda d: d.__setitem__(slice(4, 8), struct.pack("<I", 99)))
    with pytest.raises(ValueError, match="unsupported GGUF version"):
        GGUFReader(p)


def test_truncated_header(good_gguf, tmp_path):
    data = good_gguf.read_bytes()
    p = tmp_path / "trunc.gguf"
    p.write_bytes(data[:40])                      # mid-KV-section
    with pytest.raises(ValueError, match="truncated GGUF|corrupt GGUF"):
        GGUFReader(p)


def test_truncated_counts(good_gguf, tmp_path):
    data = good_gguf.read_bytes()
    p = tmp_path / "trunc.gguf"
    p.write_bytes(data[:12])                      # magic+version+4 of 16
    with pytest.raises(ValueError, match="truncated GGUF"):
        GGUFReader(p)


def test_huge_kv_count(good_gguf, tmp_path):
    # n_kv lives at bytes [16, 24)
    p = _mutate(good_gguf, tmp_path / "bad.gguf",
                lambda d: d.__setitem__(slice(16, 24),
                                        struct.pack("<q", 1 << 40)))
    with pytest.raises(ValueError, match="KV count"):
        GGUFReader(p)


def test_negative_tensor_count(good_gguf, tmp_path):
    p = _mutate(good_gguf, tmp_path / "bad.gguf",
                lambda d: d.__setitem__(slice(8, 16), struct.pack("<q", -1)))
    with pytest.raises(ValueError, match="tensor count"):
        GGUFReader(p)


def test_huge_string_length(good_gguf, tmp_path):
    # first KV key is "general.architecture"; its u64 length sits at 24
    p = _mutate(good_gguf, tmp_path / "bad.gguf",
                lambda d: d.__setitem__(slice(24, 32),
                                        struct.pack("<Q", 1 << 50)))
    with pytest.raises(ValueError, match="string length"):
        GGUFReader(p)


def test_tensor_data_out_of_range(good_gguf, tmp_path):
    # truncate the data section: header parses, tensor fetch must fail closed
    data = good_gguf.read_bytes()
    p = tmp_path / "trunc.gguf"
    p.write_bytes(data[:-16])
    r = GGUFReader(p)                             # header itself is intact
    with pytest.raises(ValueError, match="truncated GGUF"):
        r.get("enc.b")                            # last tensor, now short


def test_unsupported_tensor_type(good_gguf, tmp_path):
    r = GGUFReader(good_gguf)
    r.tensors["enc.w"].ggml_type = 77             # not a known ggml type
    with pytest.raises(ValueError, match="unsupported"):
        r.get("enc.w")


def test_array_count_overflow(tmp_path):
    # hand-build a header whose KV array claims 2^50 elements
    b = bytearray()
    b += b"GGUF" + struct.pack("<I", 3) + struct.pack("<qq", 0, 1)
    key = b"codec.delays"
    b += struct.pack("<Q", len(key)) + key
    b += struct.pack("<i", 9)                     # GGUF_TYPE_ARRAY
    b += struct.pack("<i", 5)                     # elem type INT32
    b += struct.pack("<Q", 1 << 50)               # count
    p = tmp_path / "bad.gguf"
    p.write_bytes(bytes(b))
    with pytest.raises(ValueError, match="array count"):
        GGUFReader(p)

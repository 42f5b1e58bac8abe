"""Op profiler + benchmark harness tests (reference analogs:
src/runtime/graph_exec.cpp:18-160 CODEC_OP_PROFILE, tools/benchmark.py)."""

import json

import numpy as np
import pytest


def test_op_profile_record(tmp_path, monkeypatch):
    """CODEC_OP_PROFILE=<path> dumps one JSONL record per compiled graph
    with by-op and (op, shape) tables plus XLA cost totals, and the
    AOT-compiled path returns the same samples as the plain jit path."""
    from test_wavtokenizer_parity import HOP, TorchWT
    import codec_tpu
    from codec_tpu.convert import get_converter

    ref = TorchWT().eval()
    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    gguf = tmp_path / "wt.gguf"
    c.convert_and_save(gguf)

    codes = np.zeros((7, 1), dtype=np.int32)
    plain = codec_tpu.load_model(gguf).decode(codes)

    prof = tmp_path / "op.jsonl"
    monkeypatch.setenv("CODEC_OP_PROFILE", str(prof))
    profiled = codec_tpu.load_model(gguf).decode(codes)
    np.testing.assert_array_equal(plain, profiled)

    recs = [json.loads(l) for l in prof.read_text().splitlines()]
    assert len(recs) == 1
    r = recs[0]
    assert r["event"] == "graph_profile" and "dec" in r["key"]
    assert r["n_instructions"] > 0
    assert r["by_op"] and r["top_by_op_shape"]
    assert r["cost"]["flops"] > 0


def test_profile_hlo_parse():
    from codec_tpu.runtime.op_profile import profile_hlo

    hlo = """HloModule m
ENTRY e {
  %p0 = f32[8,16]{1,0} parameter(0)
  %d = f32[8,8]{1,0} dot(%p0, %p0), lhs_contracting_dims={1}
  %fusion.1 = f32[8,8]{1,0} fusion(%d), kind=kLoop
  ROOT %r = f32[8,8]{1,0} add(%fusion.1, %d)
}
"""
    p = profile_hlo(hlo)
    assert p["by_op"] == {"dot": 1, "fusion": 1, "add": 1}
    assert p["top_by_op_shape"]["dot f32[8,8]"] == 1
    assert p["n_instructions"] == 3


def test_benchmark_stats_and_compare(tmp_path, capsys):
    import sys
    sys.path.insert(0, "tools")
    import benchmark

    s = benchmark._stats([10.0, 20.0, 30.0])
    assert s["mean"] == 20.0 and s["p50"] == 20.0 and s["p95"] == 30.0

    base = {"models": {"m": {"wall_ms": {"mean": 100.0},
                             "phases": {"graph_compute": {"mean": 50.0}}}}}
    slow = {"models": {"m": {"wall_ms": {"mean": 150.0},
                             "phases": {"graph_compute": {"mean": 50.0}}}}}
    bp, sp = tmp_path / "b.json", tmp_path / "s.json"
    bp.write_text(json.dumps(base))
    sp.write_text(json.dumps(slow))

    assert benchmark.main(["compare", str(bp), str(bp)]) == 0
    assert benchmark.main(["compare", str(bp), str(sp)]) == 1
    out = capsys.readouterr().out
    assert "REGRESSION" in out

    assert benchmark.main(["compare", str(bp), str(tmp_path / "nope.json")]) == 1

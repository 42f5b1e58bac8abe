"""Per-graph op profiler, the TPU analog of the reference's ggml
sched eval-callback profiler (reference: src/runtime/graph_exec.cpp:18-160,
env ``CODEC_OP_PROFILE=<path>``).

The reference timestamps every ggml node at execution time and dumps by-op
and top-40 by-(op, shape) tables per compute. Under XLA there is no
per-node callback — the graph is fused and scheduled by the compiler — so
the idiomatic equivalent is a *compile-time* profile of the optimized HLO
module plus the compiler's own cost analysis:

- by-opcode instruction counts over the post-optimization HLO (what XLA
  actually runs, after fusion),
- top-N (opcode, result shape) buckets — same shape-bucketed view the
  reference prints,
- XLA ``cost_analysis()`` totals (flops, bytes accessed, estimated
  seconds) per compiled graph.

Records append to $CODEC_OP_PROFILE as JSONL, one line per compiled
graph, so the same tooling that diffs the reference's tables can diff
these. Measured wall time per compute still comes from the phase log
(perf_log.py, ``graph_compute``); for node-level *timing* on real TPU use
``CODEC_OP_PROFILE_TRACE=<dir>`` which wraps each compute in a
``jax.profiler.trace`` (TensorBoard / xprof protobuf output).

Zero-cost when the env vars are unset.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter
from typing import Any, Dict, Optional

_TOP_N = 40

# "  %name = bf16[8,512]{1,0} opcode(...)" — capture result type+shape and
# opcode. ROOT lines include "ROOT " before %name.
_HLO_INSTR = re.compile(
    r"^\s+(?:ROOT\s+)?[%\w.\-]+\s*=\s*"
    r"\(?([a-z0-9]+)\[([0-9,]*)\][^ ]*\)?\s+"
    r"([a-z][a-z0-9\-]*)\(",
    re.MULTILINE,
)


def profile_path() -> Optional[str]:
    return os.environ.get("CODEC_OP_PROFILE") or None


def trace_dir() -> Optional[str]:
    return os.environ.get("CODEC_OP_PROFILE_TRACE") or None


def enabled() -> bool:
    return profile_path() is not None or trace_dir() is not None


def profile_hlo(hlo_text: str) -> Dict[str, Any]:
    """Bucket post-optimization HLO instructions by opcode and by
    (opcode, result shape) — the reference's two tables
    (graph_exec.cpp:96-158)."""
    by_op: Counter = Counter()
    by_op_shape: Counter = Counter()
    for m in _HLO_INSTR.finditer(hlo_text):
        dtype, shape, opcode = m.group(1), m.group(2), m.group(3)
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        by_op[opcode] += 1
        by_op_shape[f"{opcode} {dtype}[{shape}]"] += 1
    return {
        "by_op": dict(by_op.most_common()),
        "top_by_op_shape": dict(by_op_shape.most_common(_TOP_N)),
        "n_instructions": sum(by_op.values()),
    }


def dump_graph_profile(key: Any, compiled) -> None:
    """Append one JSONL record for a freshly compiled graph."""
    path = profile_path()
    if path is None:
        return
    rec: Dict[str, Any] = {"event": "graph_profile", "key": str(key)}
    try:
        rec.update(profile_hlo(compiled.as_text()))
    except Exception as e:  # pragma: no cover - backend-dependent
        rec["hlo_error"] = str(e)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        rec["cost"] = {
            k: float(v)
            for k, v in sorted(ca.items())
            if isinstance(v, (int, float)) and
            k in ("flops", "bytes accessed", "optimal_seconds",
                  "transcendentals", "utilization operand 0 {}")
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        rec["cost_error"] = str(e)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")

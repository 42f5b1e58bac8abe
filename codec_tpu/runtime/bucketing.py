"""Shape bucketing: the TPU-native replacement for the reference graph cache.

The reference caches built ggml graphs keyed on {kind, n_frames, n_q, ...}
(src/runtime/graph.cpp:111-168) and rebuilds for every new length. Under XLA
a new shape means a recompile, so instead we pad the time axis up to a small
set of geometric buckets and crop outputs. All supported codecs' conv stacks
are causal (or the model wraps masking), so right-padding + cropping is
EXACT — see ops/conv.py docstring. jit's own cache then plays the role of
the graph cache: one compiled executable per (bucket, n_q, batch-bucket).
"""

from __future__ import annotations

import math

GROWTH = 1.3
MIN_BUCKET = 16


def bucket_length(t: int, minimum: int = MIN_BUCKET, growth: float = GROWTH,
                  multiple: int = 8) -> int:
    """Smallest bucket >= t from a geometric grid rounded to `multiple`."""
    if t <= minimum:
        return minimum
    b = float(minimum)
    while b < t:
        b = max(b * growth, b + multiple)
    return int(math.ceil(b / multiple) * multiple)


def bucket_batch(b: int) -> int:
    """Batch buckets: 1, 2, 4, 8, ... (power of two)."""
    return 1 << (b - 1).bit_length()

"""1-D convolution family, channels-last [B, T, C] layout for TPU MXU tiling.

TPU-native re-design of the reference conv builders (reference:
src/ops/conv1d.cpp, src/ops/convtr1d.cpp).  The reference lowers convs to
ggml im2col + mul_mat; here we use `lax.conv_general_dilated`, which XLA
tiles directly onto the MXU, with channels-last (`NWC`) activations so the
channel dim rides the 128-wide lane dimension.

Weight layouts (chosen at load time, see models/*.py loaders):
  conv weights   : [K, C_in, C_out]   (lax `WIO`)
  convtr weights : [K, C_in, C_out]   pre-flipped along K (see convtr1d)

Causal padding semantics replicate the reference exactly
(src/ops/conv1d.cpp:156-228):
  pad_left  = (k-1)*dilation + 1 - stride
  pad_right = ceil(t/stride)*stride - t     (zeros or replicate)
→ output length ceil(t/stride); output frame i depends only on inputs
  < (i+1)*stride, so right-padding + cropping is exact (used for shape
  bucketing to avoid XLA recompiles).
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NWC", "WIO", "NWC")

# -- compile plan ("fast" | "best") -----------------------------------------
# Combining the matmul-form stride-1 convs AND the sub-pixel transposed
# convs in one graph makes XLA's TPU pipeline pathological: the Mimi b=1
# decode compiles in ~33 s with either form alone but ~276 s with both
# (measured v5e, round 3). The runtime gap is real (5.7 vs 11.6 ms), so
# instead of giving one up, CodecModel compiles a "fast"-plan graph first
# (subpix only — best single-form runtime) and upgrades to the "best"
# plan in a background thread (runtime/model.py tiered jit). Model code
# consults plan_mode() at trace time.

_PLAN_MODE: contextvars.ContextVar[str] = contextvars.ContextVar(
    "codec_conv_plan_mode", default="best")


def plan_mode() -> str:
    """Current compile plan: "best" (default) or "fast" (quick-compiling
    forms, used for the first tier of CodecModel's tiered jit)."""
    return _PLAN_MODE.get()


@contextlib.contextmanager
def compile_plan(mode: str):
    tok = _PLAN_MODE.set(mode)
    try:
        yield
    finally:
        _PLAN_MODE.reset(tok)


# Sequence-parallel tracing: when a CodecModel mesh shards the TIME dim
# (set_mesh(..., dim=1)), Pallas kernels must stand down — pallas_call
# does not auto-partition under GSPMD; the XLA forms they replace DO
# (convs get halo exchanges, matmuls get collectives). Dispatch gates
# (ops/attn flash window, ops/seanet_pallas fused units) consult this.

_SP_MODE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "codec_sequence_sharded", default=False)


def sp_mode() -> bool:
    """True while tracing a graph whose time dim is mesh-sharded."""
    return _SP_MODE.get()


@contextlib.contextmanager
def sequence_sharded(flag: bool = True):
    tok = _SP_MODE.set(flag)
    try:
        yield
    finally:
        _SP_MODE.reset(tok)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """Standard conv. x: [B, T, C_in], w: [K, C_in/groups, C_out] → [B, T', C_out]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv1d_matmul(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    dilation: int = 1,
    padding: int | tuple[int, int] = 0,
    pad_mode: str = "zeros",
) -> jax.Array:
    """Stride-1 conv1d as K shifted matmuls: y[t] = Σ_j x_pad[t + j·d] @ w[j].

    Numerically identical to conv1d(stride=1) with the same padding. On
    TPU, XLA's convolution at small channel counts and long T leaves most
    of the MXU idle; K [T, C_in] @ [C_in, C_out] matmuls with fused adds
    run much closer to the roofline (measured on DAC's SEANet decoder —
    see models/dac.py docstring for numbers).
    x: [B, T, C_in], w: [K, C_in, C_out]; padding: int (symmetric) or
    (left, right).
    """
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_l, pad_r = (padding, padding) if isinstance(padding, int) else padding
    t_out = x.shape[1] + pad_l + pad_r - k_eff + 1
    mode = "edge" if pad_mode == "replicate" else "constant"
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode=mode)
    c_in, c_out = w.shape[1], w.shape[2]
    if 2 * k * c_out <= (k - 1) * c_in:
        # Narrow-output form (e.g. the k7 C->1 final conv every SEANet
        # decoder ends with, at pcm-rate T): the K shifted matmuls above
        # each re-stream the full [T, C_in] activation from HBM (XLA
        # fuses the adds but not the halo reuse), ~K passes total. One
        # [T, C_in] @ [C_in, K*C_out] matmul reads it ONCE; the K
        # shifted adds then run over the small [T, K*C_out] z. Same
        # per-tap products and the same j-summation order — numerics
        # match the loop to matmul-reduction noise.
        z = xp @ w.transpose(1, 0, 2).reshape(c_in, k * c_out)
        y = z[:, :t_out, :c_out]
        for j in range(1, k):
            y = y + z[:, j * dilation: j * dilation + t_out,
                      j * c_out:(j + 1) * c_out]
    else:
        y = xp[:, :t_out] @ w[0]
        for j in range(1, k):
            y = y + xp[:, j * dilation: j * dilation + t_out] @ w[j]
    if b is not None:
        y = y + b
    return y


def conv1d_depthwise_shifts(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    padding: int | tuple[int, int] = 0,
    pad_mode: str = "zeros",
) -> jax.Array:
    """Depthwise conv as K shifted elementwise FMAs (TPU formulation).

    A depthwise conv is a per-channel K-tap FIR: y[t, c] = Σ_j
    x_pad[t·s + j·d, c] · w[j, c] — no contraction over channels at all,
    so lowering it through XLA's grouped convolution (feature_group_count
    = C) wastes the MXU AND picks XLA's worst conv path (measured: SNAC's
    depthwise-heavy decoder ran 25-50x off the lineup, BENCH_r04
    snac_bf16_b1). K shifted [B, T', C] * [C] multiply-adds fuse into a
    single VPU loop at HBM-bandwidth speed.

    Numerically identical to conv1d(groups=C) up to float-add order.
    x: [B, T, C], w: [K, 1, C] (the WIO depthwise layout).
    """
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_l, pad_r = (padding, padding) if isinstance(padding, int) else padding
    t_out = (x.shape[1] + pad_l + pad_r - k_eff) // stride + 1
    mode = "edge" if pad_mode == "replicate" else "constant"
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode=mode)
    span = (t_out - 1) * stride + 1

    def tap(j):
        return xp[:, j * dilation: j * dilation + span: stride]

    y = tap(0) * w[0, 0]
    for j in range(1, k):
        y = y + tap(j) * w[j, 0]
    if b is not None:
        y = y + b
    return y


def lane_pad() -> int:
    """Channel padding multiple for decode stacks on TPU.

    TPU DMA and vector registers tile the trailing (lane) dim by 128;
    misaligned channel counts measurably throttle streaming (a pure
    Pallas copy at C=96 lanes ran at a fraction of aligned-lane rate —
    tools/resunit_dissect.py). Padding WEIGHTS to 128-multiples at trace
    time makes activations born aligned; zero-lane channels carry exact
    zeros through convs (zero rows/cols), ELU/snake (f(0)=0), and
    residual adds, so outputs are mathematically identical (only dot
    reduction-order float noise, ~1e-8, can differ).
    CODEC_NO_CONV_OPT=1 disables (A/B escape hatch)."""
    import os

    if os.environ.get("CODEC_NO_CONV_OPT"):
        return 1
    return 128 if jax.default_backend() == "tpu" else 1


def use_conv_matmul() -> bool:
    """Gate for the stride-1 matmul conv formulation on TPU
    (CODEC_NO_CONV_OPT=1 disables)."""
    import os

    return (jax.default_backend() == "tpu"
            and not os.environ.get("CODEC_NO_CONV_OPT"))


def pad_channels(a: Optional[jax.Array], axis: int, to: int,
                 value: float = 0.0) -> Optional[jax.Array]:
    """Const-pad one axis of a weight tensor up to a multiple of `to`."""
    if a is None or to <= 1:
        return a
    p = (-a.shape[axis]) % to
    if p == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, p)
    return jnp.pad(a, widths, constant_values=value)


def _causal_pads(t: int, k: int, stride: int, dilation: int) -> tuple[int, int]:
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    pad_right = -(-t // stride) * stride - t
    return pad_left, pad_right


def conv1d_causal(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    pad_mode: str = "zeros",
) -> jax.Array:
    """Causal conv (reference: codec_conv1d_causal / _causal_replicate).

    pad_mode: "zeros" | "replicate".
    """
    t = x.shape[1]
    pad_left, pad_right = _causal_pads(t, w.shape[0], stride, dilation)
    if pad_mode == "replicate":
        x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    else:
        x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    return conv1d(x, w, b, stride=stride, dilation=dilation, groups=groups)


def conv1d_depthwise_causal(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Depthwise causal conv. w: [K, 1, C] (feature_group_count = C)."""
    return conv1d_causal(x, w, b, stride=stride, dilation=dilation, groups=x.shape[-1])


def convtr1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Transposed conv via input-dilated conv with a pre-flipped kernel.

    x: [B, T, C_in]; w: [K, C_in, C_out] ALREADY flipped along K at load time
    (the loader stores `w_torch[..., ::-1]` transposed to WIO), so this is a
    single dilated conv — no in-graph flip.
    Output length: (T-1)*stride + (K-1)*dilation + 1, then symmetric crop by
    `padding` (matches reference src/ops/convtr1d.cpp:8-38).
    """
    k_eff = (w.shape[0] - 1) * dilation + 1
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k_eff - 1, k_eff - 1)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
    )
    if b is not None:
        y = y + b
    if padding > 0:
        y = y[:, padding:-padding, :]
    return y


def convtr1d_subpixel(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """convtr1d reformulated as one MXU matmul (sub-pixel / phase
    decomposition) — numerically identical outputs.

    y[t·s + q] = Σ_m x[t−m] · w_tap[q + m·s]  (q ∈ [0,s), m < ceil(k/s)),
    so stacking M = ceil(k/s) shifted copies of x gives
    [B, T', M·C_in] @ [M·C_in, s·C_out] → reshape → [B, T'·s, C_out].

    On TPU this avoids `lhs_dilation` (input-dilated conv), which XLA
    handles poorly for large stride: the matmul form keeps the MXU busy on
    a dense [M·C_in, s·C_out] contraction. Same `w` layout as convtr1d
    (pre-flipped WIO from prepare_convtr_weight).
    """
    k, cin, cout = w.shape
    s = stride
    m_taps = -(-k // s)
    w_taps = w[::-1]                                   # original tap order
    if m_taps * s != k:
        w_taps = jnp.concatenate(
            [w_taps, jnp.zeros((m_taps * s - k, cin, cout), w.dtype)])
    # W'_m[ci, q·C_out + co] = w_tap[m·s + q, ci, co]
    wp = w_taps.reshape(m_taps, s, cin, cout).transpose(0, 2, 1, 3)
    wp = wp.reshape(m_taps, cin, s * cout)

    bsz, t, _ = x.shape
    t_ext = t + m_taps - 1                             # tail frames (x[T..]=0)
    # Σ_m x[t−m] @ W'_m as separate matmuls (no [B,T,M·C] concat
    # materialization — XLA fuses the adds into the matmul epilogues)
    y = jnp.pad(x, ((0, 0), (0, m_taps - 1), (0, 0))) @ wp[0]
    for m in range(1, m_taps):
        y = y + jnp.pad(x, ((0, 0), (m, m_taps - 1 - m), (0, 0))) @ wp[m]
    y = y.reshape(bsz, t_ext * s, cout)
    full = (t - 1) * s + k
    y = y[:, padding: full - padding]
    if b is not None:
        y = y + b
    return y


def convtr1d_causal(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Causal transposed conv: full convtr then crop `k - stride` on the right
    (reference: src/ops/convtr1d.cpp:40-60). Output length T*stride."""
    y = convtr1d(x, w, b, stride=stride, dilation=dilation)
    crop_right = max(0, w.shape[0] - stride)
    if crop_right > 0:
        y = y[:, :-crop_right, :]
    return y


def convtr1d_causal_subpixel(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
) -> jax.Array:
    """convtr1d_causal via the sub-pixel phase-matmul formulation
    (numerically identical; see convtr1d_subpixel)."""
    y = convtr1d_subpixel(x, w, b, stride=stride, padding=0)
    return y[:, : x.shape[1] * stride]


def pool1d_avg(x: jax.Array, k: int, stride: int) -> jax.Array:
    """Average pool over time. x: [B, T, C]."""
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, k, 1), (1, stride, 1), "VALID"
    )
    return y / float(k)


def pool1d_max(x: jax.Array, k: int, stride: int) -> jax.Array:
    y = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, 1), (1, stride, 1), "VALID"
    )
    return y


def prepare_conv_weight(w_oik) -> jax.Array:
    """Torch Conv1d weight [C_out, C_in, K] → lax WIO [K, C_in, C_out]."""
    return jnp.asarray(w_oik).transpose(2, 1, 0)


def prepare_convtr_weight(w_iok) -> jax.Array:
    """Torch ConvTranspose1d weight [C_in, C_out, K] → pre-flipped WIO
    [K, C_in, C_out] for convtr1d's dilated-conv formulation."""
    w = jnp.asarray(w_iok)
    return w[:, :, ::-1].transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Streaming (chunked) causal variants
# ---------------------------------------------------------------------------
# The reference engine is non-streaming per call (SURVEY §7 "hard parts":
# streaming chunked decode with carried conv state is "the harder but better
# answer"). These wrappers make causal stacks chunk-exact: feeding chunks
# whose length is a multiple of `stride` produces bit-identical output to
# one full-sequence call.

def conv1d_causal_stream(x, w, b, carry, stride: int = 1, dilation: int = 1,
                         groups: int = 1):
    """Chunked conv1d_causal. carry: [B, k_eff - stride, C_in] (zeros at
    stream start — equals the causal left-pad). Returns (y, new_carry).
    Chunk length must be a multiple of `stride`."""
    xc = jnp.concatenate([carry, x], axis=1)
    y = conv1d(xc, w, b, stride=stride, dilation=dilation, groups=groups)
    tail = (w.shape[0] - 1) * dilation + 1 - stride
    new_carry = xc[:, xc.shape[1] - tail:] if tail > 0 else xc[:, :0]
    return y, new_carry


def conv1d_causal_stream_init(batch: int, c_in: int, k: int, stride: int = 1,
                              dilation: int = 1, dtype=jnp.float32):
    tail = (k - 1) * dilation + 1 - stride
    return jnp.zeros((batch, max(tail, 0), c_in), dtype)


def convtr1d_causal_stream(x, w, b, carry, stride: int = 1):
    """Chunked convtr1d_causal. carry: [B, k - stride, C_out] overlap tail
    (zeros at stream start). The bias lands exactly once per emitted sample
    (the carried tail is bias-free). Returns (y [B, T*stride, C], carry)."""
    y = convtr1d(x, w, None, stride=stride)
    t_out = x.shape[1] * stride
    tail = max(0, w.shape[0] - stride)
    out = y[:, :t_out]
    if tail > 0:
        out = out.at[:, :tail].add(carry)
        new_carry = y[:, t_out:]
    else:
        new_carry = y[:, :0]
    if b is not None:
        out = out + b
    return out, new_carry


def convtr1d_causal_stream_init(batch: int, c_out: int, k: int,
                                stride: int = 1, dtype=jnp.float32):
    return jnp.zeros((batch, max(k - stride, 0), c_out), dtype)


def conv1d_causal_stream_replicate(x, w, b, carry, first, stride: int = 1,
                                   dilation: int = 1):
    """Chunked conv1d_causal(pad_mode="replicate"): on the first chunk the
    left pad replicates the first sample (edge padding); afterwards the
    carry holds real history. `first`: traced bool scalar."""
    tail = (w.shape[0] - 1) * dilation + 1 - stride
    if tail > 0:
        edge = jnp.repeat(x[:, :1], tail, axis=1)
        carry = jnp.where(first, edge, carry)
    return conv1d_causal_stream(x, w, b, carry, stride=stride,
                                dilation=dilation)

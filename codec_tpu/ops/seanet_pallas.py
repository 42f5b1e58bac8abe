"""Fused SEANet residual-unit Pallas TPU kernel.

One res-unit (reference: dac.cpp res_unit — snake → dilated conv k7 →
snake → conv k1 → +x) is four HBM round-trips as separate XLA ops, and
XLA's TPU convolution at small channel counts (96-384) and long T runs
~10x off the roofline (measured: DAC block3 res-units ~25 ms of a 98 ms
decode for ~3 ms of speed-of-light).

This kernel computes the whole unit in VMEM per T-tile:
  win  = [left-halo | x-tile | right-halo]            (halo = (k-1)/2·d)
  h    = snake(win, alpha1)                            (VPU sin)
  acc  = Σ_j h[j·d : j·d+T_blk] @ w1[j] + b1           (K MXU matmuls)
  y    = snake(acc, alpha2) @ w2 + b2                  (1x1 conv)
  out  = x-tile + y
→ reads x (+halo fraction) once and writes out once: ~8 HBM passes per
unit become 2. Halo rows ride a tiny precomputed [B, n_tiles, 2·halo, C]
side input so every operand uses plain aligned BlockSpecs and Mosaic's
automatic pipeline double-buffers the DMA. Matmul inputs are cast to
bf16 with f32 accumulation — the same MXU precision XLA gives f32
convolutions on TPU by default, at native MXU speed.

Weights stay whole in VMEM → dispatch only when K·C·C fits (C ≤ 512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_PI = 3.14159265358979323846


def _sin2(y):
    """sin²(y) via period-π range reduction + odd Taylor on [-π/2, π/2].

    max abs error ~4e-6 — far below the bf16 cast that follows; ~9 VPU ops
    vs the ~40 of a full-precision sin (the VPU-sin cost dominates snake-
    heavy decoders, see tools/resunit_dissect2.py numbers)."""
    r = y - _PI * jnp.round(y * (1.0 / _PI))
    r2 = r * r
    s = r * (1.0 + r2 * (-1.0 / 6.0 + r2 * (1.0 / 120.0 + r2 * (
        -1.0 / 5040.0 + r2 * (1.0 / 362880.0)))))
    return s * s


def _unit_kernel(x_ref, halo_ref, w1_ref, b1_ref, a1_ref, ia1_ref, a2_ref,
                 ia2_ref, w2_ref, b2_ref, out_ref, win_ref, *, k: int,
                 dilation: int, t_blk: int, halo: int, eps: float,
                 do_snake: bool = True):
    # assemble the conv window in VMEM: [halo_l | tile | halo_r], snaked
    a1 = a1_ref[:]
    ia1 = ia1_ref[:]
    if do_snake:
        # multiply by the precomputed 1/(alpha+eps) — a per-element VPU
        # divide here measurably dominates the kernel (dissect2/3 logs)
        snake1 = lambda v: (v + _sin2(a1 * v) * ia1).astype(jnp.bfloat16)
    else:
        snake1 = lambda v: v.astype(jnp.bfloat16)
    x = x_ref[0]
    if halo:
        win_ref[:halo] = snake1(halo_ref[0, 0, :halo])
        win_ref[halo + t_blk:] = snake1(halo_ref[0, 0, halo:])
    win_ref[halo:halo + t_blk] = snake1(x)

    h = win_ref[:]
    acc = jnp.dot(h[0:t_blk], w1_ref[0],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    for j in range(1, k):
        acc = acc + jnp.dot(h[j * dilation: j * dilation + t_blk], w1_ref[j],
                            preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    acc = acc + b1_ref[:]
    a2 = a2_ref[:]
    if do_snake:
        h2 = (acc + _sin2(a2 * acc) * ia2_ref[:]).astype(jnp.bfloat16)
    else:
        h2 = acc.astype(jnp.bfloat16)
    y = jnp.dot(h2, w2_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT) + b2_ref[:]
    out_ref[0] = x + y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilation", "t_blk", "eps", "interpret"))
def seanet_res_unit(x: jax.Array, alpha1: jax.Array, w1: jax.Array,
                    b1: jax.Array, alpha2: jax.Array, w2: jax.Array,
                    b2: jax.Array, dilation: int = 1, t_blk: int = 2048,
                    eps: float = 1e-9, interpret: bool = False) -> jax.Array:
    """x: [B, T, C]; w1: [K, C, C] (WIO); w2: [C, C] (in, out); alphas/biases
    [C]. Symmetric zero pad (K odd) — output [B, T, C], numerically the DAC
    res-unit x + conv_k1(snake(conv_kKdD(snake(x)))) at TPU-default (bf16
    MXU, f32 accum) matmul precision."""
    b, t, c = x.shape
    k = w1.shape[0]
    halo = ((k - 1) * dilation) // 2
    n_tiles = -(-t // t_blk)
    t_pad = n_tiles * t_blk

    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    if halo:
        # left halo of tile i = xp rows [i·T_blk − halo, i·T_blk): slice of
        # a shifted reshape — strided copies, no gather
        xl = jnp.pad(xp, ((0, 0), (halo, 0), (0, 0)))[:, :t_pad]
        left = xl.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
        # right halo of tile i = xp rows [(i+1)·T_blk, +halo)
        xr = jnp.pad(xp, ((0, 0), (0, t_blk), (0, 0)))[:, t_blk: t_blk + t_pad]
        right = xr.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
        halos = jnp.concatenate([left, right], axis=2)
    else:
        halos = jnp.zeros((b, n_tiles, 0, c), x.dtype)

    two_d = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _unit_kernel, k=k, dilation=dilation, t_blk=t_blk, halo=halo,
        eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max(2 * halo, 1), c),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_blk + 2 * halo, c), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem limit is 16 MB; double-buffered tiles +
            # whole weights need more at C=384
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(xp, halos, w1.astype(jnp.bfloat16), two_d(b1), two_d(alpha1),
      1.0 / (two_d(alpha1) + eps), two_d(alpha2),
      1.0 / (two_d(alpha2) + eps), w2.astype(jnp.bfloat16), two_d(b2))
    return out[:, :t]


def _chain_kernel(x_ref, halo_ref, w1_ref, b1_ref, a1_ref, ia1_ref, a2_ref,
                  ia2_ref, w2_ref, b2_ref, out_ref, cur_ref, snk_ref, *,
                  k: int, dilations: tuple, t_blk: int, halo: int,
                  t_real: int):
    """All N res-units of one SEANet block chained in VMEM: read the
    activation once, write once. Valid region shrinks by 2·h_u per unit
    (h_u = (k−1)·d_u/2); rows whose global position falls outside the real
    sequence are re-zeroed between units so the chain matches the global
    computation's zero padding at both sequence edges."""
    i = pl.program_id(1)
    x = x_ref[0]
    cur_ref[:halo] = halo_ref[0, 0, :halo].astype(jnp.float32)
    cur_ref[halo + t_blk:] = halo_ref[0, 0, halo:].astype(jnp.float32)
    cur_ref[halo:halo + t_blk] = x.astype(jnp.float32)

    length = t_blk + 2 * halo
    off = 0                                   # rows consumed from the left
    for u, d in enumerate(dilations):
        h = ((k - 1) * d) // 2
        l_out = length - 2 * h
        a1 = a1_ref[u]
        ia1 = ia1_ref[u]
        snk_ref[:length] = (
            cur_ref[:length]
            + _sin2(a1 * cur_ref[:length]) * ia1).astype(jnp.bfloat16)
        snk = snk_ref[:]
        acc = jnp.dot(snk[0:l_out], w1_ref[u, 0],
                      preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        for j in range(1, k):
            acc = acc + jnp.dot(snk[j * d: j * d + l_out], w1_ref[u, j],
                                preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        acc = acc + b1_ref[u]
        h2 = (acc + _sin2(a2_ref[u] * acc) * ia2_ref[u]).astype(jnp.bfloat16)
        y = jnp.dot(h2, w2_ref[u],
                    preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT) + b2_ref[u]
        res = cur_ref[h:h + l_out] + y
        off += h
        if u < len(dilations) - 1:
            # zero rows outside the true sequence: globally the next
            # unit's conv padding sees zeros there, not this unit's
            # output-on-zero-padded-input
            pos = (i * t_blk - halo + off
                   + jax.lax.broadcasted_iota(jnp.int32, res.shape, 0))
            res = jnp.where((pos >= 0) & (pos < t_real), res, 0.0)
        cur_ref[:l_out] = res
        length = l_out
    out_ref[0] = cur_ref[:t_blk].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilations", "t_blk", "eps", "interpret"))
def seanet_res_chain(x: jax.Array, w1s: jax.Array, b1s: jax.Array,
                     a1s: jax.Array, a2s: jax.Array, w2s: jax.Array,
                     b2s: jax.Array, dilations: tuple = (1, 3, 9),
                     t_blk: int = 2048, eps: float = 1e-9,
                     interpret: bool = False) -> jax.Array:
    """Chained fused res-units: x [B, T, C]; w1s [N, K, C, C]; w2s
    [N, C, C]; alphas/biases [N, C]. Equivalent to N sequential
    seanet_res_unit calls (DAC block: dilations 1,3,9) with one HBM
    read + one write for the whole chain — ~6 activation passes
    become 2. Residual accumulation runs in f32 (≥ the per-unit
    kernel's precision)."""
    b, t, c = x.shape
    n, k = w1s.shape[0], w1s.shape[1]
    halo = sum(((k - 1) * d) // 2 for d in dilations)
    if halo > t_blk:
        raise ValueError(f"chain halo {halo} exceeds t_blk {t_blk}")
    n_tiles = -(-t // t_blk)
    t_pad = n_tiles * t_blk

    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    xl = jnp.pad(xp, ((0, 0), (halo, 0), (0, 0)))[:, :t_pad]
    left = xl.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
    xr = jnp.pad(xp, ((0, 0), (0, t_blk), (0, 0)))[:, t_blk: t_blk + t_pad]
    right = xr.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
    halos = jnp.concatenate([left, right], axis=2)

    two_d = lambda v: v.reshape(n, 1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _chain_kernel, k=k, dilations=tuple(dilations), t_blk=t_blk,
        halo=halo, t_real=t)
    vec = pl.BlockSpec((n, 1, c), lambda bi, i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, c, c), lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec,
            pl.BlockSpec((n, c, c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec,
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xp, halos, w1s.astype(jnp.bfloat16), two_d(b1s), two_d(a1s),
      1.0 / (two_d(a1s) + eps), two_d(a2s), 1.0 / (two_d(a2s) + eps),
      w2s.astype(jnp.bfloat16), two_d(b2s))
    return out[:, :t]



def _dw_chain_kernel(x_ref, halo_ref, w1_ref, b1_ref, a1_ref, ia1_ref,
                     a2_ref, ia2_ref, w2_ref, b2_ref, out_ref, cur_ref,
                     snk_ref, *, k: int, dilations: tuple, t_blk: int,
                     halo: int, t_real: int):
    """Depthwise variant of _chain_kernel (SNAC res-units: snake →
    DEPTHWISE dilated k7 → snake → 1x1 conv → +x). The dilated conv has
    no channel contraction, so its K taps are VPU FMAs on the f32
    scratch instead of MXU matmuls; the 1x1 conv stays an MXU dot.
    Everything else (halo assembly, per-unit valid-region shrink,
    sequence-edge re-zeroing, f32 residual accumulation) matches
    _chain_kernel."""
    i = pl.program_id(1)
    x = x_ref[0]
    cur_ref[:halo] = halo_ref[0, 0, :halo].astype(jnp.float32)
    cur_ref[halo + t_blk:] = halo_ref[0, 0, halo:].astype(jnp.float32)
    cur_ref[halo:halo + t_blk] = x.astype(jnp.float32)

    length = t_blk + 2 * halo
    off = 0
    for u, d in enumerate(dilations):
        h = ((k - 1) * d) // 2
        l_out = length - 2 * h
        a1 = a1_ref[u]
        ia1 = ia1_ref[u]
        snk_ref[:length] = (cur_ref[:length]
                            + _sin2(a1 * cur_ref[:length]) * ia1)
        snk = snk_ref[:]
        acc = snk[0:l_out] * w1_ref[u, 0]
        for j in range(1, k):
            acc = acc + snk[j * d: j * d + l_out] * w1_ref[u, j]
        acc = acc + b1_ref[u]
        h2 = (acc + _sin2(a2_ref[u] * acc) * ia2_ref[u]).astype(jnp.bfloat16)
        y = jnp.dot(h2, w2_ref[u], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + b2_ref[u]
        res = cur_ref[h:h + l_out] + y
        off += h
        if u < len(dilations) - 1:
            pos = (i * t_blk - halo + off
                   + jax.lax.broadcasted_iota(jnp.int32, res.shape, 0))
            res = jnp.where((pos >= 0) & (pos < t_real), res, 0.0)
        cur_ref[:l_out] = res
        length = l_out
    out_ref[0] = cur_ref[:t_blk].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilations", "t_blk", "eps", "interpret"))
def snac_res_chain(x: jax.Array, w1s: jax.Array, b1s: jax.Array,
                   a1s: jax.Array, a2s: jax.Array, w2s: jax.Array,
                   b2s: jax.Array, dilations: tuple = (1, 3, 9),
                   t_blk: int = 4096, eps: float = 1e-9,
                   interpret: bool = False) -> jax.Array:
    """Chained fused DEPTHWISE res-units (SNAC decoder blocks,
    src/models/snac.cpp): x [B, T, C]; w1s [N, K, C] per-channel dilated
    taps; w2s [N, C, C] 1x1 convs; alphas/biases [N, C]. Equivalent to N
    sequential (snake → depthwise conv k=K,d=d_u → snake → 1x1 conv →
    +x) units with ONE HBM read + write for the whole chain. The
    round-5 depthwise-shifts XLA formulation brought SNAC bf16 b1 decode
    142 → 32 ms; the two pcm-rate blocks still cost 24 ms of it in
    separate per-op HBM passes (tools/snac_bisect.py) — this kernel
    collapses each block's ~14 activation passes into 2."""
    b, t, c = x.shape
    n, k = w1s.shape[0], w1s.shape[1]
    halo = sum(((k - 1) * d) // 2 for d in dilations)
    if halo > t_blk:
        raise ValueError(f"chain halo {halo} exceeds t_blk {t_blk}")
    n_tiles = -(-t // t_blk)
    t_pad = n_tiles * t_blk

    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    xl = jnp.pad(xp, ((0, 0), (halo, 0), (0, 0)))[:, :t_pad]
    left = xl.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
    xr = jnp.pad(xp, ((0, 0), (0, t_blk), (0, 0)))[:, t_blk: t_blk + t_pad]
    right = xr.reshape(b, n_tiles, t_blk, c)[:, :, :halo]
    halos = jnp.concatenate([left, right], axis=2)

    two_d = lambda v: v.reshape(n, 1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _dw_chain_kernel, k=k, dilations=tuple(dilations), t_blk=t_blk,
        halo=halo, t_real=t)
    vec = pl.BlockSpec((n, 1, c), lambda bi, i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec,
            pl.BlockSpec((n, c, c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec,
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xp, halos, w1s.astype(jnp.float32), two_d(b1s), two_d(a1s),
      1.0 / (two_d(a1s) + eps), two_d(a2s), 1.0 / (two_d(a2s) + eps),
      w2s.astype(jnp.bfloat16), two_d(b2s))
    return out[:, :t]


def use_fused_dw_chain(t: int, c: int, k: int, n: int) -> bool:
    """Dispatch gate for the depthwise chain (SNAC decoder): lane-aligned
    channels, T long enough to amortize the grid, 1x1 weights fit VMEM.
    CODEC_NO_FUSED_RESUNIT=1 disables (same knob as the dense kernels)."""
    import os

    from .conv import sp_mode

    return (c % 128 == 0 and n * c * c * 2 <= 8 << 20
            and t >= 4096 and jax.default_backend() == "tpu"
            and not sp_mode() and not _exact_precision_active()
            and not os.environ.get("CODEC_NO_FUSED_RESUNIT"))


def _exact_precision_active() -> bool:
    """True inside a `jax.default_matmul_precision('highest'/'float32')`
    scope (exact-encode, tpu_parity --exact). The kernel computes its
    convs in bf16 by design — dispatching it there would both break the
    bit-exactness contract AND feed Mosaic a float32-precision matmul
    with bf16 operands, which it rejects ('Bad lhs type', found by
    tpu_parity --arch dac --exact round 5)."""
    return jax.config.jax_default_matmul_precision in ("highest", "float32")

def use_fused_chain(t: int, c: int, k: int, n: int) -> bool:
    """Chained-unit gate: all N units' weights must fit VMEM together
    alongside the double-buffered tiles. CODEC_NO_FUSED_RESUNIT=1
    disables (same knob as the single-unit kernel)."""
    import os

    from .conv import sp_mode

    return (c % 128 == 0 and n * (k + 1) * c * c * 2 <= 16 << 20
            and t >= 4096 and jax.default_backend() == "tpu"
            and not sp_mode() and not _exact_precision_active()
            and not os.environ.get("CODEC_NO_FUSED_RESUNIT"))


def pick_t_blk(c: int) -> int:
    """Tile length by channel width (keep tiles ~1-2 MB in VMEM)."""
    if c <= 128:
        return 4096
    if c <= 256:
        return 2048
    return 1024


def use_fused_unit(t: int, c: int, k: int) -> bool:
    """Dispatch gate: TPU backend, weights fit VMEM (bf16 storage, so
    C ≤ 768 clears the 64 MB scoped limit with double-buffered tiles),
    T long enough to amortize the grid. CODEC_NO_FUSED_RESUNIT=1
    disables."""
    import os

    from .conv import sp_mode

    return (c % 128 == 0 and c <= 768 and k * c * c * 2 <= 9 << 20
            and t >= 4096 and jax.default_backend() == "tpu"
            and not sp_mode() and not _exact_precision_active()
            and not os.environ.get("CODEC_NO_FUSED_RESUNIT"))

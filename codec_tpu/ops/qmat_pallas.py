"""Fused dequant-matmul Pallas TPU kernels for GGUF-quantized weights.

The reference executes quantized weights natively in ggml mul_mat; the
round-1 loader instead dequantized everything to f32/bf16 on load, so a
Q4_K checkpoint occupied 4-8x its file size in HBM. These kernels keep
the weights HBM-resident in (repacked) quantized form and dequantize
tiles in VMEM right before the MXU dot:

  Q8_0: qs int8 [out, in] + scale f32 [out, in/32]      (1.125 B/weight)
  Q4_K: qs uint8 [out, in/2] split-half nibble packing +
        scale/min f32 [out, in/32]                      (0.75 B/weight)

Q4_K packing: within each 32-column group g, packed column c = 16g+j
holds w[:, 32g+j] | w[:, 32g+16+j] << 4 — unpacking gives two
contiguous halves whose columns share the group's scale/min, so the
kernel needs no nibble interleave: it runs two dots against the lo/hi
column-halves of x (precomputed outside; x is small). The per-group min
term is folded into a third small dot against the per-group sums of x:
  y = xlo @ (lo·s)ᵀ + xhi @ (hi·s)ᵀ − xgsum @ minᵀ.

Dequantized values are exact in f32 (f16 d × 6-bit subscale), cast to
bf16 for the MXU — the same precision XLA gives f32 matmuls on TPU.

Measured (v5e, tools/qmat_micro.py, vs dense bf16 matmul):
  AR-step GEMV (m=1): q8_0 1.27-6.4x faster, q4_k 1.11-7.3x faster
    (2048/8192-dim llama shapes; the 6-7x cases are in=8192 reductions
    where XLA's dense GEMV is pathological), at 1.8x / 2.7x less HBM.
  batched m=8: q8_0 0.84x, q4_k 0.71x — the VPU unpack stops hiding
    behind the DMA, so qmatmul() uses the fused kernels only for small m
    (AR decode) and dequantizes-then-dots for prefill-sized batches.
Dispatch is opt-in via load_backbone_params(quantized=...) /
CODEC_QUANT_EXEC / tts-cli --quant-exec.

End-to-end (v5e, tools/rda_quant_micro.py, CSM-1B-shaped chunked
generation — lm/fused_gen.build_gen_chunk, 16 frames/call): packed
execution is SLOWER than dense bf16 despite the smaller weight reads —
dense 8.25 ms/frame (1.95 GB weights) vs q8_0 11.05 ms (1.10 GB) vs
q4_k 13.17 ms (0.73 GB). Inside the layer scan the kernels' VPU unpack
serializes against the MXU instead of hiding behind weight DMA the way
the isolated-GEMV micro suggested. So --quant-exec is an HBM-headroom
lever (2-3x more / larger resident models per chip), not a latency
lever; the CLI keeps dense bf16 as the speed default.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QGROUP = 32


# ---------------------------------------------------------------------------
# Host-side packing from raw GGUF block data (bit-exact dequant values)
# ---------------------------------------------------------------------------

def pack_q8_0(raw: np.ndarray, shape) -> Dict[str, np.ndarray]:
    """raw: uint8 GGUF Q8_0 blocks for a [out, in] (numpy-shape) tensor."""
    out_d, in_d = int(np.prod(shape[:-1])), int(shape[-1])
    nb = in_d // QGROUP
    buf = np.frombuffer(raw.tobytes(), dtype=np.uint8).reshape(out_d * nb, 2 + QGROUP)
    d = buf[:, :2].copy().view(np.float16).astype(np.float32)
    qs = buf[:, 2:].view(np.int8).copy().reshape(out_d, nb, QGROUP)
    # group-minor column order (col j' <-> element 32*(j'%nb) + j'//nb):
    # pltpu.repeat is np.tile-semantics, so a tiled [ob, nb] scale vector
    # lines up when the group index is col % nb
    # no "kind" key: q4_k is distinguished by the presence of "minv", so
    # the dict is a pure array pytree (stackable for lax.scan layers)
    return {"qs": np.ascontiguousarray(qs.transpose(0, 2, 1)).reshape(out_d, in_d),
            "scale": d.reshape(out_d, nb)}


def pack_q4_k(raw: np.ndarray, shape) -> Dict[str, np.ndarray]:
    """raw: uint8 GGUF Q4_K super-blocks for a [out, in] tensor."""
    from ..io.gguf import K_SCALE_SIZE, QK_K, _unpack_scale_min_k4

    out_d, in_d = int(np.prod(shape[:-1])), int(shape[-1])
    nsb = in_d // QK_K                                   # superblocks/row
    bb = 2 + 2 + K_SCALE_SIZE + QK_K // 2
    buf = np.frombuffer(raw.tobytes(), dtype=np.uint8).reshape(out_d * nsb, bb)
    d = buf[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
    dmin = buf[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
    sc, mn = _unpack_scale_min_k4(buf[:, 4:4 + K_SCALE_SIZE])      # [N,8]
    qs = buf[:, 4 + K_SCALE_SIZE:].reshape(-1, 4, 32)              # [N,4,32]
    # GGUF nibble order: group pair (2g, 2g+1): byte j of chunk g holds
    # elem 32*2g+j (lo) and elem 32*(2g+1)+j (hi) — i.e. lo/hi nibbles are
    # already split across consecutive 32-groups. Our packed layout wants
    # col 16g+j (j<16) = w[32g+j] | w[32g+16+j] << 4 within EACH 32-group.
    lo = qs & 0x0F                                                  # [N,4,32]
    hi = qs >> 4
    q = np.stack([lo, hi], axis=2).reshape(-1, 8, 32)               # [N,8,32]
    packed = (q[:, :, :16] | (q[:, :, 16:] << 4)).astype(np.uint8)  # [N,8,16]
    ng = nsb * 8
    packed = packed.reshape(out_d, ng, 16)
    scale = (d[:, None] * sc.astype(np.float32)).reshape(out_d, ng)
    minv = (dmin[:, None] * mn.astype(np.float32)).reshape(out_d, ng)
    # group-minor order (see pack_q8_0): packed col c <-> group c % ng
    return {"qs": np.ascontiguousarray(packed.transpose(0, 2, 1)).reshape(
                out_d, in_d // 2),
            "scale": scale, "minv": minv}


def pack_dense(w: np.ndarray, qtype: str) -> Dict[str, np.ndarray]:
    """Quantize a dense [out, in] matrix through the GGUF wire quantizer
    and repack for fused execution — one round trip, so the packed values
    are exactly what a Q8_0/Q4_K GGUF of this matrix would execute."""
    from ..io.gguf import quantize_q4_k, quantize_q8_0

    w = np.asarray(w, np.float32)
    if qtype.lower() == "q8_0":
        return pack_q8_0(np.frombuffer(quantize_q8_0(w), np.uint8), w.shape)
    if qtype.lower() == "q4_k":
        return pack_q4_k(np.frombuffer(quantize_q4_k(w), np.uint8), w.shape)
    raise ValueError(f"pack_dense: unsupported qtype {qtype}")


def pack_dense_stacked(w, qtype: str) -> Dict[str, jnp.ndarray]:
    """[L, out, in] layer-stacked dense weights -> stacked packed-quant
    dict (leading L axis), the leaf layout load_backbone_params
    (quantized=True) produces for lax.scan over layers."""
    per_layer = [pack_dense(np.asarray(w[li]), qtype)
                 for li in range(w.shape[0])]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_layer)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _q8_kernel(x_ref, qs_ref, s_ref, o_ref):
    # Mosaic lacks direct (u)int8 -> bf16 casts: go via int32 -> f32
    w = qs_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    # tile-semantics repeat + group-minor packing: col j' gets s[j' % nb]
    s = pltpu.repeat(s_ref[:], QGROUP, axis=1).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w * s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q4k_kernel(xlo_ref, xhi_ref, xg_ref, qs_ref, s_ref, m_ref, o_ref):
    q32 = qs_ref[:].astype(jnp.int32)       # u8 bit-ops/casts unsupported
    s = pltpu.repeat(s_ref[:], 16, axis=1).astype(jnp.bfloat16)
    lo = (q32 & 0x0F).astype(jnp.float32).astype(jnp.bfloat16) * s
    hi = (q32 >> 4).astype(jnp.float32).astype(jnp.bfloat16) * s
    acc = jax.lax.dot_general(
        xlo_ref[:], lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        xhi_ref[:], hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc - jax.lax.dot_general(
        xg_ref[:], m_ref[:].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _out_blk(out_d: int) -> int:
    for cand in (512, 256, 128):
        if out_d % cand == 0:
            return cand
    return out_d


@functools.partial(jax.jit, static_argnames=("interpret",))
def q8_0_matmul(x: jax.Array, qs: jax.Array, scale: jax.Array,
                interpret: bool = False) -> jax.Array:
    """x [m, in] @ dequant(qs, scale) [out, in]ᵀ → [m, out] (f32)."""
    m, in_d = x.shape
    out_d = qs.shape[0]
    nb = in_d // QGROUP
    xq = x.astype(jnp.bfloat16).reshape(m, nb, QGROUP)
    xq = xq.transpose(0, 2, 1).reshape(m, in_d)       # group-minor cols
    ob = _out_blk(out_d)
    return pl.pallas_call(
        _q8_kernel,
        grid=(out_d // ob,),
        in_specs=[
            pl.BlockSpec((m, in_d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, in_d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, in_d // QGROUP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ob), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xq, qs, scale)


@functools.partial(jax.jit, static_argnames=("interpret",))
def q4_k_matmul(x: jax.Array, qs: jax.Array, scale: jax.Array,
                minv: jax.Array, interpret: bool = False) -> jax.Array:
    """x [m, in] @ dequant(Q4_K) [out, in]ᵀ → [m, out] (f32)."""
    m, in_d = x.shape
    out_d = qs.shape[0]
    nb = in_d // QGROUP
    xb = x.astype(jnp.bfloat16).reshape(m, nb, QGROUP)
    xlo = xb[:, :, :16].transpose(0, 2, 1).reshape(m, in_d // 2)
    xhi = xb[:, :, 16:].transpose(0, 2, 1).reshape(m, in_d // 2)
    xg = jnp.sum(xb.astype(jnp.float32), axis=2).astype(jnp.bfloat16)
    ob = _out_blk(out_d)
    return pl.pallas_call(
        _q4k_kernel,
        grid=(out_d // ob,),
        in_specs=[
            pl.BlockSpec((m, in_d // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, in_d // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, in_d // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ob), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(xlo, xhi, xg, qs, scale, minv)


# ---------------------------------------------------------------------------
# Reference (XLA) dequant + helpers
# ---------------------------------------------------------------------------

def dequant_ref(qt: Dict) -> jnp.ndarray:
    """Full dequantized [out, in] f32 matrix (oracle / CPU fallback)."""
    if "minv" not in qt:
        out_d, in_d = qt["qs"].shape
        nb = in_d // QGROUP
        qs = jnp.asarray(qt["qs"], jnp.float32).reshape(out_d, QGROUP, nb)
        s = jnp.asarray(qt["scale"], jnp.float32)[:, None, :]
        return (qs * s).transpose(0, 2, 1).reshape(out_d, in_d)
    out_d, half = qt["qs"].shape
    ng = half // 16
    qs = jnp.asarray(qt["qs"]).reshape(out_d, 16, ng)
    lo = (qs & 0x0F).astype(jnp.float32)
    hi = (qs >> 4).astype(jnp.float32)
    s = jnp.asarray(qt["scale"], jnp.float32)[:, None, :]
    mv = jnp.asarray(qt["minv"], jnp.float32)[:, None, :]
    wlo = (lo * s - mv).transpose(0, 2, 1)               # [out, ng, 16]
    whi = (hi * s - mv).transpose(0, 2, 1)
    return jnp.concatenate([wlo, whi], axis=2).reshape(out_d, half * 2)


_FUSED_MAX_M = 32


def qmatmul(x: jax.Array, qt: Dict, interpret: bool = False) -> jax.Array:
    """Dispatch: fused kernel on TPU for AR-sized m, dequant+dot
    elsewhere (prefill batches, CPU). x: [..., in]."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if (jax.default_backend() == "tpu" and x2.shape[0] <= _FUSED_MAX_M) \
            or interpret:
        if "minv" not in qt:
            y = q8_0_matmul(x2, qt["qs"], qt["scale"], interpret=interpret)
        else:
            y = q4_k_matmul(x2, qt["qs"], qt["scale"], qt["minv"],
                            interpret=interpret)
    else:
        y = x2 @ dequant_ref(qt).T
    return y.reshape(*lead, y.shape[-1])


def pack_tensor(reader, name: str) -> Dict[str, np.ndarray]:
    """Pack a GGUF Q8_0/Q4_K tensor for fused execution (raises on other
    types — callers fall back to reader.get dequant-on-load)."""
    kind, raw, shape = reader.get_raw_quant(name)
    if kind == "Q8_0":
        return pack_q8_0(raw, shape)
    if kind == "Q4_K":
        return pack_q4_k(raw, shape)
    raise ValueError(f"no fused path for {kind} tensor {name}")

"""CodecModel: the public runtime object (load → encode/decode/decode_latent).

TPU-native equivalent of the reference's codec_model + codec_context pair
(src/codec.cpp:303-611): arch dispatch via the model registry, param
validation, mono-ization, and the jit-compile cache (via shape bucketing,
runtime/bucketing.py) replacing the ggml graph cache + scheduler.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from . import op_profile
from .bucketing import bucket_batch, bucket_length
from .perf_log import perf_event, perf_scope


class _ProfiledFn:
    """jit wrapper that AOT-lowers on first call so the optimized HLO and
    XLA cost analysis can be dumped to $CODEC_OP_PROFILE (the reference's
    per-node op profiler analog — see runtime/op_profile.py). Optionally
    wraps every compute in a jax.profiler trace ($CODEC_OP_PROFILE_TRACE)
    for node-level timing on real hardware."""

    def __init__(self, key, jit_fn):
        self.key = key
        self.jit_fn = jit_fn
        self.compiled = None

    def __call__(self, *args):
        if self.compiled is None:
            self.compiled = self.jit_fn.lower(*args).compile()
            op_profile.dump_graph_profile(self.key, self.compiled)
        tdir = op_profile.trace_dir()
        if tdir:
            with jax.profiler.trace(tdir):
                return self.compiled(*args)
        return self.compiled(*args)


class CodecError(ValueError):
    """Invalid-argument / invalid-state errors (reference: codec_status enums)."""


_DTYPE_ALIASES = {
    "float32": jnp.float32, "f32": jnp.float32,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float16": jnp.float16, "f16": jnp.float16,
}


def resolve_compute_dtype(spec, reader: Optional[GGUFReader] = None):
    """Resolve a compute-dtype spec ("float32" | "bfloat16" | "float16" |
    "auto" | a jnp dtype). "auto" follows the checkpoint: 16-bit wire
    weights (F16/BF16) → bfloat16 compute (MXU-native); quantized wire
    weights (Q8_0/Q4_K/Q5_K majority) → bfloat16 on TPU, where it is the
    native analog of the reference's quantized mul_mat execution
    (src/runtime/tensor_utils.h:30-52): the checkpoint already carries
    ≤8-bit precision, TPU f32 matmuls round inputs to bf16 anyway, and
    bf16 weights+activations halve the HBM traffic the f32 path pays.
    F32 wire — and quantized wire off-TPU, where parity suites compare
    against f64-accumulated torch — stay float32."""
    if not isinstance(spec, str):
        return spec
    s = spec.lower()
    if s in _DTYPE_ALIASES:
        return _DTYPE_ALIASES[s]
    if s == "auto":
        if reader is not None:
            from ..io.gguf import (GGML_TYPE_BF16, GGML_TYPE_F16,
                                   GGML_TYPE_F32)

            # decide by byte share: some wire schemas keep a few tensors
            # F16 regardless of quantization level (e.g. mimi resample
            # kernels), so mere presence is not a signal
            b16 = tot = qnt = 0
            for i in reader.tensors.values():
                tot += i.n_bytes
                if i.ggml_type in (GGML_TYPE_F16, GGML_TYPE_BF16):
                    b16 += i.n_bytes
                elif i.ggml_type != GGML_TYPE_F32:
                    qnt += i.n_bytes
            # quantized checkpoints (any quant blocks present — converters
            # only mix quant + F16-passthrough tensors when quantizing):
            # bf16 on TPU, f32 off-TPU where parity suites compare against
            # f64-accumulated torch. The F16-passthrough bytes can dominate
            # (convs the quantizer can't block-align), so this check must
            # come BEFORE the plain 16-bit-majority rule.
            if qnt > 0:
                return (jnp.bfloat16 if jax.default_backend() == "tpu"
                        else jnp.float32)
            if tot and b16 * 2 > tot:
                return jnp.bfloat16
        return jnp.float32
    raise CodecError(f"unknown compute dtype {spec!r}")


def _exact_encode_default(compute_dtype) -> bool:
    """f32 compute means the user chose parity: pin the encode graph to
    f32 HIGHEST (TPU code emission then bit-exact vs CPU — see
    CodecModel.__init__ comment). CODEC_EXACT_ENCODE=1/0 forces."""
    env = os.environ.get("CODEC_EXACT_ENCODE")
    if env is not None:
        return env not in ("", "0")
    return np.dtype(compute_dtype).itemsize == 4


class CodecModel:
    """Base class; per-arch subclasses live in codec_tpu/models/ and register
    themselves in models/registry.py (reference vtable: src/codec.cpp:153-191)."""

    arch: str = ""
    # Fully-causal stacks admit exact right-pad+crop shape bucketing; models
    # with symmetric padding (e.g. DAC) compile per exact length instead.
    causal_time: bool = True
    # Models whose graphs differ between the "fast" and "best" compile
    # plans (ops/conv.py compile_plan) opt into tiered jit: the first call
    # compiles the fast plan (~33 s for Mimi b=1 decode on the relay vs
    # ~276 s for the best plan), a daemon thread then compiles the best
    # plan and swaps it in. Where the plans coincide (e.g. b>1) the two
    # traces produce identical HLO and the background compile is a
    # persistent-cache hit. CODEC_TIERED_JIT=0 disables.
    tiered_plans: bool = False

    # Subclasses set these after load:
    sample_rate: int = 0
    hop_size: int = 1
    n_q: int = 0
    codebook_size: int = 0
    latent_dim: int = 0
    has_encoder: bool = False
    has_decoder: bool = True
    expected_channels: int = 1

    def __init__(self, reader: GGUFReader, compute_dtype=jnp.float32):
        self.reader = reader
        self.compute_dtype = resolve_compute_dtype(compute_dtype, reader)
        if np.dtype(self.compute_dtype).itemsize == 2:
            # 16-bit compute: keep F16/BF16 wire tensors native on the host
            # so RAM + host→device transfer are half-width; the loaders'
            # .astype(compute_dtype) then converts on device.
            reader.prefer_16bit = True
        self.metadata: Dict[str, Any] = dict(reader.kv)
        # On TPU, f32 matmuls/convs run at bf16 precision by DEFAULT; the
        # RVQ score matmul is always pinned to HIGHEST (ops/rvq.py) but
        # bf16 noise in the ENCODER's latents still flips argmin
        # near-ties vs the CPU reference (measured: tools/tpu_parity.py —
        # 55% of frames at default precision, 0 with exact_encode).
        # exact_encode pins the whole encode graph to HIGHEST: TPU code
        # emission then matches CPU bit-for-bit up to f32 reduction-order
        # ties, at 1.43x the encode wall (tools/encode_micro.py: 12.1 →
        # 17.3 ms per 20 s, still 1155x RT). f32 compute means parity, so
        # exact is the f32 DEFAULT; 16-bit compute keeps the fast path.
        # CODEC_EXACT_ENCODE=1/0 forces either way; decode is unaffected.
        self.exact_encode = _exact_encode_default(self.compute_dtype)
        self._jit_cache: Dict[Any, Callable] = {}
        self._trace_lock = threading.RLock()
        self.mesh = None                    # set via set_mesh() for DP/SP
        self.mesh_axis = "dp"
        self.mesh_dim = 0                   # 0 = batch (DP), 1 = time (SP)
        self.last_out_sharding = None       # sharding of the last device output
        self._load(reader)

    # -- multi-chip data parallelism ----------------------------------------
    # The reference's codec_batch loops sequences serially on one device
    # (src/batch/batch.cpp, src/codec.cpp:640-786). Here the batch dim of
    # every decode/encode graph can be sharded over a device mesh: weights
    # are replicated once, inputs are placed batch-split, and XLA partitions
    # the whole graph per-chip with zero steady-state collectives.
    def set_mesh(self, mesh, axis: str = "dp", dim: int = 0) -> None:
        """Attach a jax.sharding.Mesh: weights are replicated onto it and all
        subsequent encode/decode calls shard input/output dim `dim` over
        `axis`. dim=0 is data parallelism (multi-stream batch decode);
        dim=1 is SEQUENCE parallelism — ONE long stream's time dim split
        across chips (XLA inserts the conv halo exchanges; Pallas kernels
        stand down via ops.conv.sequence_sharded since pallas_call does
        not auto-partition). SP trades the fused kernels for n-chip
        scaling of conv-dominated decodes on clips too long for one chip's
        latency budget."""
        from ..parallel.mesh import replicate

        self.mesh, self.mesh_axis, self.mesh_dim = mesh, axis, int(dim)
        for a in self._PARAM_ATTRS:
            tree = getattr(self, a, None)
            if tree is not None:
                setattr(self, a, replicate(mesh, tree))
        self._jit_cache.clear()             # flat weight leaves changed

    def _mesh_n(self) -> int:
        return self.mesh.shape[self.mesh_axis] if self.mesh is not None else 1

    def _bucket_b(self, b: int) -> int:
        """Batch bucket, rounded up to a multiple of the mesh size (DP
        meshes only — an SP mesh shards time, not batch)."""
        bb = bucket_batch(b)
        n = self._mesh_n() if self.mesh_dim == 0 else 1
        return bb if bb % n == 0 else -(-b // n) * n

    def _place(self, buf: np.ndarray) -> jax.Array:
        """Host buffer → device. With a mesh: committed batch-sharded.

        jax.device_put, not jnp.asarray: on the remote-TPU relay the
        former dispatches asynchronously (~0.1 ms) while the latter takes
        a ~30 ms blocking round-trip — one of the two RPCs that made the
        product-surface decode 8x slower than its own graph."""
        if self.mesh is None:
            return jax.device_put(buf)
        from jax.sharding import NamedSharding, PartitionSpec as P

        parts = [None] * buf.ndim
        if buf.ndim > self.mesh_dim:
            parts[self.mesh_dim] = self.mesh_axis
        spec = P(*parts)
        return jax.device_put(buf, NamedSharding(self.mesh, spec))

    def _readback(self, out: jax.Array) -> np.ndarray:
        self.last_out_sharding = getattr(out, "sharding", None)
        return np.asarray(out)

    def _place_f(self, x) -> jax.Array:
        """Float graph input → device at the model's compute dtype. Model
        encode overrides that build their own jitted fns (mel front-ends
        etc.) must route float inputs through this: 16-bit-weight models
        (explicit bfloat16, or "auto" on 16-bit / quantized-on-TPU
        checkpoints) reject f32 inputs at the first conv otherwise."""
        return jnp.asarray(x, self.compute_dtype)

    def _run_batched(self, key: Tuple, make: Callable[[], Callable],
                     buf: np.ndarray, pcm_format: str = "f32",
                     extra: Tuple = ()) -> np.ndarray:
        """Shared device-call path for latent encode/decode: pad the leading
        batch dim to its bucket (a mesh-size multiple under DP), place the
        buffer (batch-sharded when a mesh is attached), run, crop.
        pcm_format="i16" converts the output to 16-bit PCM in-graph (only
        meaningful for decode directions that produce PCM). `extra` args
        (traced scalars, e.g. a valid-length count) pass straight through
        to the jitted fn after the placed buffer."""
        b = buf.shape[0]
        bb = self._bucket_b(b)
        if bb != b:
            buf = np.concatenate(
                [buf, np.zeros((bb - b,) + buf.shape[1:], buf.dtype)])
        if pcm_format != "f32":
            inner_make = make
            make = lambda: (lambda *a, _f=inner_make(): self._fmt_out(
                _f(*a), pcm_format))
        if np.issubdtype(buf.dtype, np.floating) and \
                np.dtype(self.compute_dtype) != buf.dtype:
            cast_make = make     # float inputs follow the compute dtype
            make = lambda: (lambda x, *a, _f=cast_make(): _f(
                x.astype(self.compute_dtype), *a))
        fn = self._jitted(key + (pcm_format,) + buf.shape, make)
        # no block_until_ready: np.asarray in _readback synchronizes, and
        # on the axon relay every extra device round-trip costs ~30 ms
        out = self._readback(fn(self._place(buf), *extra))
        return out[:b]

    @classmethod
    def from_parts(cls, *, compute_dtype=jnp.float32, **attrs):
        """In-memory instantiation without a GGUF file (tests, benchmarks,
        multi-chip dryruns): bypasses `_load` and sets the given attributes
        (cfg, params, sample_rate, ...) directly. Same public
        encode/decode/set_mesh surface as a file-loaded model."""
        self = cls.__new__(cls)
        self.reader = None
        self.compute_dtype = compute_dtype
        self.exact_encode = _exact_encode_default(compute_dtype)
        self.metadata = {}
        self._jit_cache = {}
        self._trace_lock = threading.RLock()
        self.mesh = None
        self.mesh_axis = "dp"
        self.last_out_sharding = None
        for k, v in attrs.items():
            setattr(self, k, v)
        return self

    # -- metadata accessors (reference: codec_model_n_fft / win_length /
    #    n_mels / name / n_tensors, src/codec.cpp:815-877; -1 = absent) -----
    @property
    def n_fft(self) -> int:
        return int(self.metadata.get("codec.n_fft", -1))

    @property
    def win_length(self) -> int:
        return int(self.metadata.get("codec.win_length", -1))

    @property
    def n_mels(self) -> int:
        return int(self.metadata.get("codec.n_mels", -1))

    @property
    def name(self) -> str:
        return str(self.metadata.get("general.name", ""))

    @property
    def n_tensors(self) -> int:
        return len(self.reader.tensors) if self.reader is not None else 0

    # -- subclass hooks ----------------------------------------------------
    def _load(self, reader: GGUFReader) -> None:
        raise NotImplementedError

    def _decode_impl(self, codes: jax.Array, n_q: int) -> jax.Array:
        """codes [B, T_bucket, n_q] → pcm [B, T_bucket*hop]; jitted by caller."""
        raise NotImplementedError

    def _encode_impl(self, pcm: jax.Array, n_q: int) -> jax.Array:
        raise NotImplementedError

    # Archs whose reference encoder pads per-conv-layer (ceil-to-stride
    # zeros at each strided conv, reference src/ops/conv1d.cpp:179) set
    # this True: encode() then passes the true sample count as a traced
    # scalar so the graph can mask the bucket padding at layer boundaries.
    # Without it, upfront zero-padding leaks bias-propagated activations
    # into the final partial frame's receptive field (full-size parity
    # gate: tests/test_mimi_fullsize.py).
    encode_per_layer_pad = False

    # -- jit cache (graph-cache equivalent) --------------------------------
    # Weight pytrees are passed as jit *arguments*, not closed-over
    # constants: the compiled graph is then weight-independent, so a
    # different checkpoint (or quantization level) of the same arch hits
    # both the in-process and the persistent XLA compile cache instead of
    # re-optimizing a graph with multi-MB constants baked in. `make()`
    # closures read `self.params` / `self.enc_params` at trace time; the
    # wrapper swaps tracers into those attributes for the duration of the
    # trace.
    _PARAM_ATTRS = ("params", "enc_params")

    def _split_params(self):
        """Partition the weight trees into (array leaves → jit arguments,
        everything else → static closure values). Scalar leaves (kernel
        sizes, strides) must stay concrete for padding/shape math."""
        from jax import tree_util as jtu

        flat = []
        specs = []
        for a in self._PARAM_ATTRS:
            tree = getattr(self, a, None)
            if tree is None:
                continue
            leaves, td = jtu.tree_flatten(tree)
            idx = [i for i, l in enumerate(leaves)
                   if isinstance(l, (jax.Array, np.ndarray))]
            specs.append((a, td, leaves, idx, len(flat)))
            flat.extend(leaves[i] for i in idx)

        def rebuild(dyn):
            from jax import tree_util as jtu
            out = {}
            for a, td, leaves, idx, start in specs:
                merged = list(leaves)
                for j, i in enumerate(idx):
                    merged[i] = dyn[start + j]
                out[a] = jtu.tree_unflatten(td, merged)
            return out

        return flat, rebuild

    def _jitted(self, key: Tuple, make: Callable[[], Callable]) -> Callable:
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        # Tracing swaps tracers into self.params (see wrapped below), so
        # concurrent cache misses from server threads must serialize here;
        # compiled fns never read self, so steady-state calls stay lock-free.
        with self._trace_lock:
            return self._jitted_locked(key, make)

    def _jitted_locked(self, key: Tuple, make: Callable[[], Callable]) -> Callable:
        fn = self._jit_cache.get(key)
        if fn is None:
            t0 = time.monotonic()
            inner = make()
            flat, rebuild = self._split_params()

            def make_wrapped(plan: str):
                def wrapped(dyn, *args):
                    from ..ops import conv as _conv

                    # serialize the swap-trace-restore window: tracing
                    # temporarily setattr-swaps tracers into shared attrs
                    # (same discipline as runtime/jit_weights.py); RLock so
                    # the background best-plan trace and foreground misses
                    # can't interleave. Compiled calls never re-enter here.
                    with self._trace_lock:
                        trees = rebuild(dyn)
                        saved = {a: getattr(self, a, None) for a in trees}
                        try:
                            for a, v in trees.items():
                                setattr(self, a, v)
                            with _conv.compile_plan(plan), \
                                    _conv.sequence_sharded(
                                        self.mesh is not None
                                        and self.mesh_dim == 1):
                                out = inner(*args)
                        finally:
                            for a, v in saved.items():
                                setattr(self, a, v)
                    if self.mesh is not None:
                        # Pin outputs sharded on the mesh dim (batch for
                        # DP, time for SP) so results stay resident
                        # per-chip (no implicit gather at the jit
                        # boundary).
                        from jax.sharding import NamedSharding, PartitionSpec

                        spec = [None] * self.mesh_dim + [self.mesh_axis]
                        ns = NamedSharding(self.mesh, PartitionSpec(*spec))
                        out = jax.tree_util.tree_map(
                            lambda o: jax.lax.with_sharding_constraint(o, ns)
                            if o.ndim > self.mesh_dim else o,
                            out)
                    return out
                return wrapped

            # CODEC_TIERED_JIT: "1" (default) fast tier + background
            # upgrade; "fast" fast tier only (one-shot CLI processes —
            # nothing would ever use the upgraded graph); "0" best only.
            tier_env = os.environ.get("CODEC_TIERED_JIT", "1")
            tiered = (self.tiered_plans
                      and jax.default_backend() == "tpu"
                      and not op_profile.enabled()
                      and tier_env != "0")
            if not tiered:
                jfn = jax.jit(make_wrapped("best"))
                if op_profile.enabled():
                    jfn = _ProfiledFn(key, jfn)

                def fn(*args, _jfn=jfn, _flat=flat):
                    return _jfn(_flat, *args)
            else:
                jfn_fast = jax.jit(make_wrapped("fast"))
                holder = {"call": lambda *a: jfn_fast(flat, *a),
                          "started": False}
                start_lock = threading.Lock()

                def _upgrade(args):
                    tu = time.monotonic()
                    try:
                        lowered = jax.jit(make_wrapped("best")).lower(
                            flat, *args)
                        compiled = lowered.compile()
                        holder["call"] = lambda *a: compiled(flat, *a)
                        perf_event("graph_upgrade",
                                   (time.monotonic() - tu) * 1e6, str(key))
                    except Exception as e:       # keep serving the fast tier
                        perf_event("graph_upgrade_failed", 0.0,
                                   f"{key}: {type(e).__name__}")

                def fn(*args, _upgrade_on=(tier_env != "fast")):
                    out = holder["call"](*args)
                    if _upgrade_on and not holder["started"]:
                        with start_lock:
                            if not holder["started"]:
                                holder["started"] = True
                                threading.Thread(
                                    target=_upgrade, args=(args,),
                                    daemon=True,
                                    name=f"codec-tier-upgrade-{key}").start()
                    return out

            self._jit_cache[key] = fn
            perf_event("graph_build", (time.monotonic() - t0) * 1e6, str(key))
        return fn

    # -- public API --------------------------------------------------------
    @staticmethod
    def _pcm_host_f32(pcm) -> np.ndarray:
        """Normalize a PCM argument on the host: float passes through,
        int16 scales by 1/32768 — for encode paths that consume the PCM
        host-side (mel frontends) or don't route through the base
        encode()'s in-graph conversion."""
        pcm = np.asarray(pcm)
        if pcm.dtype == np.int16:
            return pcm.astype(np.float32) / 32768.0
        return np.asarray(pcm, np.float32)      # copy-free when already f32

    @staticmethod
    def _fmt_out_host(pcm: np.ndarray, pcm_format: str) -> np.ndarray:
        """Host-side counterpart of _fmt_out for decode overrides whose
        graphs aren't routed through the base jit wrapper (chunked /
        multi-stage decoders): identical write_wav formula."""
        if pcm_format == "f32":
            return np.asarray(pcm, np.float32)
        if pcm_format == "i16":
            return np.clip(np.rint(np.asarray(pcm, np.float32) * 32767.0),
                           -32768, 32767).astype(np.int16)
        raise CodecError(f"unknown pcm_format {pcm_format!r}")

    @staticmethod
    def _fmt_out(pcm: jax.Array, pcm_format: str) -> jax.Array:
        """In-graph output formatting. "i16" converts to 16-bit PCM with
        the exact formula of io/wav.py::write_wav (round-half-even), so a
        WAV written from device int16 is byte-identical to one written
        from f32 — at HALF the device→host bytes. On a remote-TPU
        transport (~40 MB/s observed) that wire is the product-surface
        bottleneck, not the graph."""
        if pcm_format == "f32":
            return pcm.astype(jnp.float32)
        if pcm_format == "i16":
            return jnp.clip(jnp.round(pcm.astype(jnp.float32) * 32767.0),
                            -32768, 32767).astype(jnp.int16)
        raise CodecError(f"unknown pcm_format {pcm_format!r}")

    def _decode_dispatch(self, codes, n_q: int, pcm_format: str = "f32"):
        """Validate + bucket + upload + dispatch one decode; returns the
        device-resident output and the crop metadata. Does NOT block: on
        the relay, dispatch is async, so several of these pipeline on the
        device while the host keeps preparing inputs."""
        if not self.has_decoder:
            raise CodecError(f"{self.arch}: model has no decoder")
        codes = np.asarray(codes)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        if codes.ndim != 3 or codes.shape[1] == 0:
            raise CodecError(f"bad codes shape {codes.shape}")
        use_nq = n_q if n_q > 0 else min(self.n_q, codes.shape[2])
        if n_q < 0 or use_nq < 1 or use_nq > self.n_q or codes.shape[2] < use_nq:
            raise CodecError(f"n_q must be 0 or in [1, {self.n_q}]")
        b, t = codes.shape[0], codes.shape[1]
        tb = bucket_length(t) if self.causal_time else t
        bb = self._bucket_b(b)
        buf = np.zeros((bb, tb, use_nq), dtype=np.int32)
        buf[:b, :t] = codes[:, :, :use_nq]
        fn = self._jitted(
            ("dec", bb, tb, use_nq, pcm_format),
            lambda: lambda c: self._fmt_out(self._decode_impl(c, use_nq),
                                           pcm_format))
        return fn(self._place(buf)), (b, t, squeeze)

    def _decode_crop(self, pcm: np.ndarray, meta) -> np.ndarray:
        b, t, squeeze = meta
        pcm = pcm[:b, : t * self.hop_size] if self.causal_time else pcm[:b]
        return pcm[0] if squeeze else pcm

    def decode(self, codes, n_q: int = 0,
               pcm_format: str = "f32") -> np.ndarray:
        """codes: [T, Q] or [B, T, Q] int → pcm [T*hop] / [B, T*hop];
        float32 by default, 16-bit PCM with pcm_format="i16" (write_wav-
        exact conversion done in-graph — half the device→host bytes).

        n_q=0 means all model codebooks (reference: codec_decode_params)."""
        with perf_scope("decode_total", self.arch):
            out, meta = self._decode_dispatch(codes, n_q, pcm_format)
            with perf_scope("graph_compute", "decode"):
                pcm = self._readback(out)
        return self._decode_crop(pcm, meta)

    def decode_async(self, codes, n_q: int = 0,
                     pcm_format: str = "f32") -> "PendingPcm":
        """Non-blocking decode: uploads + dispatches, returns a PendingPcm
        whose .result() fetches the PCM. Back-to-back decode_async calls
        pipeline on the device; fetch several at once with
        PendingPcm.gather() (one batched transfer)."""
        out, meta = self._decode_dispatch(codes, n_q, pcm_format)
        return PendingPcm(self, out, meta)

    def decode_many(self, seqs, n_q: int = 0,
                    pcm_format: str = "f32") -> list:
        """Decode a list of [T, Q] code sequences of possibly different
        lengths. Sequences that land in the same length bucket are decoded
        as ONE batched graph (batch rows are independent, so results match
        per-sequence decodes up to cross-compile float-reorder noise — in
        practice equal), groups are dispatched
        back-to-back, and every output is fetched in ONE batched
        device→host transfer. On a remote-device transport each dispatched
        op costs a ~30-50 ms round-trip, so minimizing op count — not just
        overlapping — is what makes this the many-stream throughput
        surface (reference codec_batch decodes serially,
        src/codec.cpp:640-786)."""
        if not self.has_decoder:
            raise CodecError(f"{self.arch}: model has no decoder")
        seqs = [np.asarray(s) for s in seqs]
        groups: Dict[Tuple[int, int], list] = {}
        for i, s in enumerate(seqs):
            if s.ndim != 2 or s.shape[0] == 0:
                raise CodecError(
                    f"decode_many wants [T, Q] sequences, got {s.shape}")
            use_nq = n_q if n_q > 0 else min(self.n_q, s.shape[1])
            if (n_q < 0 or use_nq < 1 or use_nq > self.n_q
                    or s.shape[1] < use_nq):
                raise CodecError(f"n_q must be 0 or in [1, {self.n_q}]")
            tb = bucket_length(s.shape[0]) if self.causal_time else s.shape[0]
            groups.setdefault((tb, use_nq), []).append(i)

        outs: list = [None] * len(seqs)
        with perf_scope("decode_total", f"{self.arch}_many{len(seqs)}"):
            dispatched = []
            for (tb, use_nq), idxs in groups.items():
                bb = self._bucket_b(len(idxs))
                buf = np.zeros((bb, tb, use_nq), dtype=np.int32)
                for row, i in enumerate(idxs):
                    buf[row, : seqs[i].shape[0]] = seqs[i][:, :use_nq]
                fn = self._jitted(
                    ("dec", bb, tb, use_nq, pcm_format),
                    lambda use_nq=use_nq:
                        lambda c: self._fmt_out(
                            self._decode_impl(c, use_nq), pcm_format))
                dispatched.append((fn(self._place(buf)), idxs))
            with perf_scope("graph_compute", "decode_many"):
                arrs = jax.device_get([o for o, _ in dispatched])
        for (_, idxs), a in zip(dispatched, arrs):
            a = np.asarray(a)
            for row, i in enumerate(idxs):
                t = seqs[i].shape[0]
                outs[i] = (a[row, : t * self.hop_size]
                           if self.causal_time else a[row])
        return outs

    def encode(self, pcm, n_q: int = 0) -> np.ndarray:
        """pcm: [n] / [B, n] float32 in [-1,1] — or int16 PCM, which is
        uploaded as-is (half the host→device bytes) and divided by 32768
        in-graph, bit-identical to converting on the host first →
        codes int32 [T, n_q] / [B, T, n_q]."""
        if not self.has_encoder:
            raise CodecError(f"{self.arch}: model has no encoder")
        pcm = np.asarray(pcm)
        i16_in = pcm.dtype == np.int16
        if not i16_in:
            pcm = pcm.astype(np.float32)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        if pcm.ndim != 2 or pcm.shape[1] == 0:
            raise CodecError(f"bad pcm shape {pcm.shape}")
        use_nq = n_q if n_q > 0 else self.n_q
        if n_q < 0 or use_nq < 1 or use_nq > self.n_q:
            raise CodecError(f"n_q must be 0 or in [1, {self.n_q}]")
        b, n = pcm.shape
        t_frames = -(-n // self.hop_size)
        nb = bucket_length(t_frames) * self.hop_size if self.causal_time else n
        bb = self._bucket_b(b)
        buf = np.zeros((bb, nb), dtype=np.int16 if i16_in else np.float32)
        buf[:b, :n] = pcm

        def make(use_nq=use_nq, i16_in=i16_in):
            # in-graph cast to the model's compute dtype: 16-bit-weight
            # models (explicit --dtype bfloat16, or "auto" on a 16-bit /
            # quantized-on-TPU checkpoint) otherwise crash mixing the f32
            # pcm input into their first conv
            cd = self.compute_dtype
            if i16_in:
                base = lambda x, *a: self._encode_impl(
                    (x.astype(jnp.float32) * (1.0 / 32768.0)).astype(cd),
                    use_nq, *a)
            else:
                base = lambda x, *a: self._encode_impl(x.astype(cd),
                                                       use_nq, *a)
            if not self.exact_encode:
                return base

            def exact(x, *a):
                # trace-time context: every dot/conv in the encode graph
                # gets f32 HIGHEST instead of the TPU bf16 default
                with jax.default_matmul_precision("highest"):
                    return base(x, *a)
            return exact

        # traced scalar, so one compile per bucket serves every n in it
        extra = (np.int32(n),) if self.encode_per_layer_pad else ()
        with perf_scope("encode_total", self.arch):
            fn = self._jitted(("enc", bb, nb, use_nq, i16_in,
                               self.exact_encode), make)
            with perf_scope("graph_compute", "encode"):
                codes = self._readback(
                    fn(self._place(buf), *extra))
        codes = codes[:b, :t_frames] if self.causal_time else codes[:b]
        return codes[0] if squeeze else codes

    def decode_latent(self, latent, pcm_format: str = "f32") -> np.ndarray:
        raise CodecError(f"{self.arch}: decode_latent not supported")

    def encode_latent(self, pcm) -> np.ndarray:
        raise CodecError(f"{self.arch}: continuous-latent encode not supported")


class PendingPcm:
    """Handle for an in-flight decode (decode_async): the device-resident
    output plus crop metadata. result() blocks on one device→host fetch."""

    def __init__(self, model: CodecModel, out, meta):
        self._model = model
        self._out = out
        self._meta = meta

    def device_array(self):
        """The uncropped device output [B_bucket, T_bucket*hop] — for
        device-resident consumers (no host round-trip)."""
        return self._out

    def result(self) -> np.ndarray:
        return self._model._decode_crop(self._model._readback(self._out),
                                        self._meta)

    @staticmethod
    def gather(pending: list) -> list:
        """Fetch many PendingPcm in ONE batched device→host transfer (a
        single round-trip on remote-device transports)."""
        arrs = jax.device_get([p._out for p in pending])
        return [p._model._decode_crop(np.asarray(a), p._meta)
                for p, a in zip(pending, arrs)]

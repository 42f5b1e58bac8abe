"""Continuous-batching TTS engine over the batched on-device chunk.

Static batching (`lm/tts_runner.run_codebook_ar_batch`) fixes the request
set at launch: a stream that finishes rides inert — its slot keeps
computing junk — until the whole batch drains, and a request arriving
mid-flight waits for the next batch. This engine keeps the SAME compiled
B-slot chunk (`lm/fused_gen.build_gen_chunk_batched`: every active
stream's fused LM frame + feedback compose + backbone step as batched
GEMMs on shared weights) but treats the batch dimension as B *slots*:

  - a slot is retired the moment its stream stops (EOS observed by the
    host state machine, or the request's max_steps), its delay-tail is
    flushed and its result delivered immediately;
  - the next queued request is admitted into the free slot at the chunk
    boundary (prompt prefill on the host, then one batched scatter of
    its KV/hidden/PRNG state into the device-resident slot arrays);
  - empty slots ride into the chunk with `done0=True`, so their carried
    state is frozen in-graph rather than advanced on junk frames.

Per-request code streams are bit-identical to the single-stream chunked
run (`run_codebook_ar(on_device=...)`) with the same seed: each slot owns
its PRNG key (seeded at admission), KV slice, hidden, and AudioLM state,
and the compiled frame fn + `jax.random.split` sequence are exactly the
single-stream path's.

Reference contrast: the reference serializes generations — one
codec_lm_state per stream but a full host loop per frame each
(/root/reference/src/lm/lm_internal.h:63-68,
/root/reference/common/tts_runner.cpp:707). Continuous batching has no
reference counterpart; it is the TPU-native serving upgrade that keeps
the MXU fed with B streams' GEMMs while requests arrive and finish
asynchronously.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import List, Optional, Sequence

import numpy as np

from ..lm.audio_lm import AudioLM, ObserveAction
from ..ops.sample import OnDeviceSampling


class RequestCancelled(RuntimeError):
    """Raised by TtsRequest.wait() when the request was cancelled."""


class TtsRequest:
    """Handle for one queued synthesis. `wait()` blocks for the result
    (a `lm.tts_runner.SynthesisResult`) or re-raises the engine-side
    error for this request."""

    def __init__(self, audio_lm: AudioLM, prompt_embeds: Sequence,
                 seed: int, max_steps: int,
                 sampling: Optional[OnDeviceSampling] = None,
                 frame_cb=None):
        self.audio_lm = audio_lm
        self.prompt_embeds = list(prompt_embeds)
        self.seed = int(seed)
        self.max_steps = int(max_steps)
        self.sampling = sampling
        self.frame_cb = frame_cb
        self.result = None
        self.error: Optional[BaseException] = None
        self._done = threading.Event()
        self._cancel = threading.Event()

    def wait(self, timeout: Optional[float] = None):
        if not self._done.wait(timeout):
            raise TimeoutError("synthesis not finished")
        if self.error is not None:
            raise self.error
        return self.result

    def cancel(self) -> bool:
        """Request cancellation: a queued request is dropped at the next
        admission scan; an active one is retired without decode at the
        next chunk boundary (a running chunk cannot be interrupted), its
        slot freed for the next queued request. `wait()` then raises
        RequestCancelled. Returns False if the request already finished
        (the result stands)."""
        if self._done.is_set():
            return False
        self._cancel.set()
        return True

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()

    @property
    def done(self) -> bool:
        return self._done.is_set()

    def _finish(self, result=None, error=None) -> None:
        self.result, self.error = result, error
        self._done.set()


class ContinuousBatcher:
    """B-slot continuous-batching engine for plain codebook-AR kinds
    (CSM / Qwen3-TTS / MOSS-TTSD families).

    One `ContinuousBatcher` owns the backbone's device state between
    chunk calls; drive `step()` from a single engine thread (serve's
    `--cont-batch` starts one) or call `drain()` inline for batch jobs.
    `submit()` is thread-safe. The sampler chain (temperature/top_k/
    top_p/min_p) rides as a traced per-slot [B, 4] chunk input
    (`ops.sample.sample_logits_dyn`), so each request may carry its own
    chain (`submit(sampling=...)`, engine `on_device` as the default) —
    any mix shares one compiled executable. The PRNG seed is per request.
    """

    def __init__(self, backbone, shared_lm, *, n_slots: int = 4,
                 on_device: OnDeviceSampling, pi=None, decode: bool = True,
                 n_q: int = 0, mesh=None, dp_axis: str = "dp",
                 prefill_bucket: int = 0):
        from ..lm.fused_gen import gen_chunk_cached, supports_gen_chunk

        if n_slots < 1:
            raise ValueError("need at least one slot")
        if not supports_gen_chunk(shared_lm, backbone):
            raise ValueError("continuous batching needs a JAX backbone and "
                             "a chunk-capable LM kind")
        if mesh is not None and n_slots % int(mesh.shape[dp_axis]):
            raise ValueError(f"continuous batching DP: {n_slots} slots not "
                             f"divisible by mesh size "
                             f"{int(mesh.shape[dp_axis])}")
        # mesh: shard the slot state (KV caches, hiddens, PRNG keys) over
        # mesh[dp_axis] — data-parallel serving; composes with a
        # TP-sharded backbone on a 2-D mesh exactly like
        # run_codebook_ar_batch(mesh=...). Admission scatters preserve
        # the sharding (jit follows the argument placements).
        self._mesh, self._dp_axis = mesh, dp_axis
        self.backbone = backbone
        self.lm = shared_lm
        self.B = int(n_slots)
        self.K = max(2, int(on_device.chunk_frames))
        self.ods = on_device
        self.decode = decode
        self.n_q = int(n_q)
        self.n_cb = int(shared_lm.info.n_codebook)
        # prefill_bucket > 0: admission prefills the whole prompt in ONE
        # bucketed-length forward (lm/tts_runner.prefill_prompt) instead
        # of T per-token dispatches — admission cost stops scaling with
        # prompt length on dispatch-bound transports (docs/PERF.md).
        self.prefill_bucket = int(prefill_bucket)

        cb0_range = None
        if pi is not None and pi.cb0_speech_range_start >= 0 \
                and pi.cb0_speech_range_end > pi.cb0_speech_range_start:
            cb0_range = (int(pi.cb0_speech_range_start),
                         int(pi.cb0_speech_range_end),
                         int(pi.eos_code_c0) if pi.eos_code_c0 is not None
                         else -1)
        # traced_chain: the sampler chain rides as a per-slot [B, 4] input
        # instead of compiled-in statics, so each request brings its own
        # temperature/top_k/top_p/min_p (engine `on_device` = the default
        # for requests that don't) and any mix shares ONE executable.
        self._chunk_fn = gen_chunk_cached(
            shared_lm, backbone, n_frames=self.K, batched=True,
            cb0_range=cb0_range, traced_chain=True)
        self._chains = np.tile(on_device.chain_vec(), (self.B, 1))

        self._queue: deque = deque()
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self.slots: List[Optional[TtsRequest]] = [None] * self.B
        self._steps = [0] * self.B
        self._stopped = [False] * self.B
        # device-resident slot state, allocated at first admission
        self._admit_fn = None           # jitted single-slot scatter
        self._kv = None                 # [B, L, 2, nkv, ctx, D]
        self._h = None                  # [B, hidden] f32
        self._keys = None               # [B] PRNG keys
        self._pos = np.zeros(self.B, np.int32)
        self._tc = np.zeros(self.B, np.int32)
        self._base = np.zeros(self.B, np.int32)

    # -- request side -------------------------------------------------------
    def submit(self, audio_lm: AudioLM, prompt_embeds: Sequence,
               seed: int = 0, max_steps: int = 512,
               sampling: Optional[OnDeviceSampling] = None,
               frame_cb=None) -> TtsRequest:
        """Queue one synthesis. `audio_lm` must share this engine's
        CodecLM (`AudioLM(reader, codec, lm=engine.lm)`); `prompt_embeds`
        is the prompt's embedding rows (composed for merged-cb0 models).

        `sampling` overrides the engine default chain (temperature/top_k/
        top_p/min_p) for THIS request only — the chain is a traced
        per-slot input, so no recompile. Its `seed`/`chunk_frames` fields
        are ignored (`seed` arg and the engine-wide K apply).

        `frame_cb(codes int32 [n_cb])` is invoked from the ENGINE thread
        for every surviving frame as its chunk is consumed (EOS and
        post-max_steps frames excluded) — keep it O(queue.put); it feeds
        streaming vocoders (serve /synthesize "stream")."""
        if audio_lm.lm is not self.lm:
            raise ValueError("request must share the engine CodecLM "
                             "(AudioLM(reader, codec, lm=engine.lm))")
        if not prompt_embeds:
            raise ValueError("every request needs >= 1 prompt embedding")
        req = TtsRequest(audio_lm, prompt_embeds, seed, max_steps,
                         sampling=sampling, frame_cb=frame_cb)
        with self._work:
            self._queue.append(req)
            self._work.notify()
        return req

    def wait_for_work(self, timeout: Optional[float] = None) -> bool:
        """Block until a request is queued (engine-thread idle wait)."""
        with self._work:
            if self._queue or any(r is not None for r in self.slots):
                return True
            return self._work.wait(timeout)

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.slots)

    @property
    def n_queued(self) -> int:
        with self._lock:
            return len(self._queue)

    # -- engine side ----------------------------------------------------
    def _admit_one(self, s: int, kv_s, h_s, key_s) -> None:
        """Write one admitted stream's state into slot `s` with ONE
        compiled donated-buffer scatter. The slot index is a traced
        scalar, so a single executable serves every admission — a
        varying-length batched `at[idx].set` would compile a fresh
        scatter per admission-count (measured: tens of seconds each
        through the remote-compile relay)."""
        import jax
        import jax.numpy as jnp

        if self._kv is None:
            self._kv = jnp.zeros((self.B,) + kv_s.shape, kv_s.dtype)
            self._h = jnp.zeros((self.B, int(h_s.shape[0])), jnp.float32)
            self._keys = jax.vmap(jax.random.PRNGKey)(
                jnp.zeros(self.B, jnp.uint32))
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                def _dp(x):
                    return jax.device_put(x, NamedSharding(
                        self._mesh,
                        P(self._dp_axis, *([None] * (x.ndim - 1)))))
                self._kv, self._h, self._keys = (
                    _dp(self._kv), _dp(self._h), _dp(self._keys))
        if self._admit_fn is None:
            self._admit_fn = jax.jit(
                lambda kv, h, keys, nkv, nh, nk, s: (
                    kv.at[s].set(nkv), h.at[s].set(nh), keys.at[s].set(nk)),
                donate_argnums=(0, 1, 2))
        self._kv, self._h, self._keys = self._admit_fn(
            self._kv, self._h, self._keys, kv_s,
            jnp.asarray(h_s, jnp.float32), key_s, jnp.int32(s))

    def _admit(self) -> None:
        """Fill free slots from the queue: prompt prefill on the host
        backbone, then one single-slot scatter per admitted stream.
        Cancelled queued requests are purged (and resolved) up front,
        even when no slot is free."""
        import jax

        cancelled = []
        with self._lock:
            if any(r.cancelled for r in self._queue):
                keep = []
                while self._queue:
                    r = self._queue.popleft()
                    (cancelled if r.cancelled else keep).append(r)
                self._queue.extend(keep)
        for r in cancelled:
            r._finish(error=RequestCancelled(
                "request cancelled while queued"))

        for s in range(self.B):
            if self.slots[s] is not None:
                continue
            req = None
            while req is None:
                with self._lock:
                    if not self._queue:
                        break
                    req = self._queue.popleft()
                if req is not None and req.cancelled:
                    req._finish(error=RequestCancelled(
                        "request cancelled while queued"))
                    req = None
            if req is None:
                break
            try:
                from ..lm.tts_runner import prefill_prompt

                self.backbone.reset()
                h = prefill_prompt(self.backbone, req.prompt_embeds,
                                   bucket=self.prefill_bucket)
                req.audio_lm.reset()
                st = req.audio_lm.state
            except BaseException as e:               # noqa: BLE001
                req._finish(error=e)
                continue
            self.slots[s] = req
            self._steps[s] = 0
            self._stopped[s] = False
            self._pos[s] = int(self.backbone.pos)
            self._tc[s] = int(st.text_context or 0)
            self._base[s] = int(st.frame_counter)
            self._chains[s] = (req.sampling or self.ods).chain_vec()
            self._admit_one(s, self.backbone.kv, np.asarray(h, np.float32),
                            jax.random.PRNGKey(req.seed))

    def step(self) -> int:
        """Admissions + ONE K-frame chunk + retirements. Returns the
        number of active slots after retirement (0 = engine idle)."""
        import jax.numpy as jnp

        from ..lm.tts_runner import finalize_batch_stream

        self._admit()
        active = [s for s in range(self.B) if self.slots[s] is not None]
        if not active:
            return 0

        done0 = np.asarray([self.slots[s] is None for s in range(self.B)])
        packed, self._h, self._kv, self._keys = self._chunk_fn(
            self.backbone.params, self._kv, jnp.asarray(self._pos),
            jnp.asarray(self._base), self._h, self._keys,
            jnp.asarray(self._tc), done0, jnp.asarray(self._chains))
        arr = np.asarray(packed)
        n_emit = int(arr[self.K * self.B * self.n_cb])
        pos_after = arr[-self.B:].astype(np.int32)
        rows = arr[: self.K * self.B * self.n_cb].reshape(
            self.K, self.B, self.n_cb)

        for s in active:
            self._pos[s] = pos_after[s]
        cb_err: dict[int, BaseException] = {}
        for i in range(n_emit):
            for s in active:
                req = self.slots[s]
                if s in cb_err or self._stopped[s] \
                        or self._steps[s] >= req.max_steps:
                    continue
                codes = req.audio_lm.state.push_frame(rows[i, s])
                self._steps[s] += 1
                # compose=False: feedback embeddings are composed IN the
                # chunk graph; the host compose would add a device round
                # trip per frame per slot (the round-4 serving collapse)
                if req.audio_lm.observe_codes(
                        codes, compose=False) is ObserveAction.STOP:
                    self._stopped[s] = True
                elif req.frame_cb is not None:
                    try:
                        req.frame_cb(np.asarray(codes, np.int32))
                    except BaseException as e:        # noqa: BLE001
                        # a broken callback fails ITS request, not the
                        # engine: retire the slot below, keep stepping
                        cb_err[s] = e
        for s in active:
            self._base[s] += n_emit

        n_left = 0
        for s in active:
            req = self.slots[s]
            if req.cancelled:
                # retire without flush/decode; the slot state is simply
                # abandoned (the next admission scatters over it)
                req._finish(error=RequestCancelled(
                    "request cancelled mid-generation"))
                self.slots[s] = None
                continue
            if s in cb_err:
                req._finish(error=cb_err[s])
                self.slots[s] = None
                continue
            if not self._stopped[s] and self._steps[s] < req.max_steps:
                n_left += 1
                continue
            try:
                from ..lm.tts_runner import slice_slot

                result = finalize_batch_stream(
                    req.audio_lm, self.backbone,
                    (lambda s=s: slice_slot(self._kv, s)),
                    int(self._pos[s]),
                    (lambda s=s: slice_slot(self._keys, s)),
                    req.sampling or self.ods,   # delay-tail flush samples
                    stopped=self._stopped[s], steps=self._steps[s],
                    decode=self.decode, n_q=self.n_q)
                req._finish(result=result)
            except BaseException as e:               # noqa: BLE001
                req._finish(error=e)
            self.slots[s] = None
        return n_left

    def drain(self) -> None:
        """Step until every queued and active request has finished
        (inline driving for batch jobs and tests)."""
        while True:
            n = self.step()
            if n == 0:
                with self._lock:
                    if not self._queue:
                        return

    def fail_all(self, err: BaseException) -> None:
        """Resolve every active and queued request with `err` (engine-
        level failure): handles unblock instead of hanging to their wait
        timeout, slots free for the next admissions."""
        for s in range(self.B):
            req, self.slots[s] = self.slots[s], None
            if req is not None:
                req._finish(error=err)
        with self._lock:
            queued, self._queue = list(self._queue), type(self._queue)()
        for req in queued:
            req._finish(error=err)


class EngineThread(threading.Thread):
    """Owns a ContinuousBatcher: steps while there is work, sleeps on the
    submit condition otherwise. `stop()` finishes in-flight work first."""

    def __init__(self, batcher: ContinuousBatcher):
        super().__init__(name="tts-cont-batch", daemon=True)
        self.batcher = batcher
        # NB: not `_stop` — that would shadow threading.Thread._stop()
        self._stop_flag = threading.Event()

    def run(self) -> None:
        while not self._stop_flag.is_set():
            try:
                n = self.batcher.step()
            except BaseException as e:                # noqa: BLE001
                # an engine-level step failure must not silently kill the
                # thread (every handle would hang to its wait timeout):
                # fail the in-flight requests, log, keep serving
                import traceback

                traceback.print_exc()
                self.batcher.fail_all(e)
                n = 0
            if n == 0 and self.batcher.n_queued == 0:
                self.batcher.wait_for_work(timeout=0.1)

    def stop(self, timeout: float = 30.0) -> None:
        self._stop_flag.set()
        with self.batcher._work:
            self.batcher._work.notify_all()
        self.join(timeout)

"""Fully on-device chunked AR generation for codebook-AR TTS.

`run_codebook_ar`'s fused path still makes TWO device dispatches per
frame (backbone step + fused LM frame); each dispatch on a relay-attached
TPU carries a ~30 ms floor (docs/PERF.md), so the per-frame wall is
transport-bound even though the device work is a few ms. This module
chains the whole loop — fused depth-AR frame → EOS gate → feedback-embed
compose → backbone step — inside ONE jitted `lax.while_loop` that runs up
to K frames per device call and stops early at EOS, returning the emitted
codes plus bookkeeping in a single packed fetch. Carried state (backbone
KV cache, hidden, PRNG key) stays device-resident between chunks.

Reference contrast: the reference host loop re-enters the host once per
codebook per frame AND once per backbone step
(/root/reference/common/tts_runner.cpp:707, run_codebook_ar); the
round-2 fused frame cut that to 2 dispatches/frame; this cuts it to
2/K dispatches per frame. Identical code streams: the frame fn and the
`jax.random.split` sequence are exactly the ones the per-frame fused
path uses, and the feedback compose matches `compose_next_embd`
(reference: codec_lm_compose_next_embd, src/lm/lm.cpp:535).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

# meta slots appended after the K*n_cb flattened codes
_META = 3          # [n_emitted, stopped_by_eos, backbone_pos]


def build_gen_chunk(lm, bb_cfg, chain: Tuple[float, int, float, float],
                    n_frames: int, cb0_range=None) -> Callable:
    """Compile a K-frame generation chunk for an LM kind exposing
    `_build_frame(chain)` + `compose_embd_fn()` (residual_depth_ar today).

    Returns fn(bb_params, kv, pos0, base_frame, h, key, text_ctx) →
    (packed int32 [K*n_cb + 3], h', kv', key') where packed =
    codes.flatten() ++ [n_emitted, stopped, pos_after]. Rows past
    n_emitted are unwritten (the loop exits at EOS); `pos_after` is the
    backbone position after the last feedback step (the EOS frame takes
    none, matching the host loop which breaks before `backbone.step`).

    `kv` is donated — pass the previous chunk's return (or the backbone's
    current cache) and treat it as consumed.
    """
    from ..runtime.jit_weights import array_attrs, jit_weighted
    from .backbone import backbone_forward

    frame = lm._build_frame(chain, cb0_range=cb0_range)
    compose = lm.compose_embd_fn()
    info = lm.info
    eos_code = int(info.eos_code_c0)
    eos_min = int(info.eos_min_step)
    n_cb = int(info.n_codebook)
    k_frames = int(n_frames)

    def chunk(bb_params, kv, pos0, base_frame, h, key, text_ctx):
        buf0 = jnp.zeros((k_frames, n_cb), jnp.int32)
        kv_dtype = jax.tree_util.tree_leaves(kv)[0].dtype

        def cond(s):
            return jnp.logical_and(s[0] < k_frames, jnp.logical_not(s[1]))

        def body(s):
            i, _done, h, kv, pos, key, buf = s
            key, sub = jax.random.split(key)
            codes = frame(h, sub, text_ctx)
            if eos_code >= 0:
                is_eos = jnp.logical_and(codes[0] == eos_code,
                                         base_frame + i >= eos_min)
            else:
                is_eos = jnp.bool_(False)
            buf = jax.lax.dynamic_update_slice(buf, codes[None], (i, 0))

            def advance(op):
                h_in, kv_in = op
                emb = compose(codes).astype(kv_dtype)
                h2, kv2 = backbone_forward(bb_params, kv_in, pos,
                                           emb[None], bb_cfg)
                return h2[0].astype(jnp.float32), kv2

            h, kv = jax.lax.cond(is_eos, lambda op: op, advance, (h, kv))
            pos = pos + jnp.where(is_eos, 0, 1)
            return (i + 1, is_eos, h, kv, pos, key, buf)

        i, done, h, kv, pos, key, buf = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.bool_(False), h, kv,
             jnp.asarray(pos0, jnp.int32), key, buf0))
        meta = jnp.stack([i, done.astype(jnp.int32), pos])
        packed = jnp.concatenate([buf.reshape(-1), meta])
        return packed, h, kv, key

    return jit_weighted(lm, chunk, array_attrs(lm), donate_argnums=(1,))


def build_gen_chunk_batched(lm, bb_cfg,
                            chain: Tuple[float, int, float, float],
                            n_frames: int, cb0_range=None) -> Callable:
    """B concurrent generations, whole frame loop batched on device: the
    vmapped frame + feedback compose + backbone step run all streams
    together (batched GEMMs through shared weights — the MXU-utilization
    win over B serial single-stream loops), each stream carrying its own
    KV cache / hidden / PRNG key / EOS state. The loop exits early only
    when EVERY stream is done; finished streams keep computing (vmap
    executes both sides of any select) but their hidden and position are
    frozen, so the emitted junk rows land at a fixed KV slot that the
    post-EOS host flush (or nothing) overwrites — per-stream code streams
    are EXACTLY the single-stream chunk's (same per-stream PRNG splits).

    Returns fn(bb_params, kv [B,L,2,nkv,ctx,D], pos [B], base_frame
    (scalar or [B] — per-stream frame counters, so streams admitted at
    different times can share one chunk), h [B,hidden],
    keys [B PRNG keys], text_ctx [B], done0 [B] bool) →
    (packed int32 [K*B*n_cb + 1 + 2B], h', kv', keys') with packed =
    codes[K,B,n_cb].flatten() ++ [n_iter] ++ done[B] ++ pos_after[B].
    `kv` is donated.

    `done0` carries per-stream done flags INTO the chunk: a stream that
    already stopped (or an empty continuous-batching slot) stays frozen —
    its hidden and position never advance, so the delay-tail flush later
    reads the KV state from the frame it actually stopped at instead of
    junk frames appended while other streams kept generating. Its rows in
    `packed` are junk the host must ignore.

    `chain=None` builds the TRACED-chain variant: the chunk takes one more
    argument, `chains` f32 [B, 4] (`[temperature, top_k, top_p, min_p]`
    per slot, `ops.sample.sample_logits_dyn`) — per-request sampling
    parameters in the continuous-batching engine, one executable for any
    parameter mix.

    Reference contrast: the reference is strictly single-stream per
    codec_lm_state and steps the host LLM per frame
    (src/lm/lm_internal.h:63-68, common/tts_runner.cpp:707).
    """
    from ..runtime.jit_weights import array_attrs, jit_weighted
    from .backbone import backbone_forward

    frame = lm._build_frame(chain, cb0_range=cb0_range)
    traced_chain = chain is None
    compose = lm.compose_embd_fn()
    info = lm.info
    eos_code = int(info.eos_code_c0)
    eos_min = int(info.eos_min_step)
    n_cb = int(info.n_codebook)
    k_frames = int(n_frames)
    max_pos = int(bb_cfg.max_ctx) - 1

    def chunk_impl(bb_params, kv, pos, base_frame, h, keys, text_ctx,
                   done0, chains):
        b = h.shape[0]
        base_frame = jnp.broadcast_to(
            jnp.asarray(base_frame, jnp.int32), (b,))
        done0 = jnp.broadcast_to(jnp.asarray(done0, bool), (b,))
        buf0 = jnp.zeros((k_frames, b, n_cb), jnp.int32)
        kv_dtype = jax.tree_util.tree_leaves(kv)[0].dtype

        vframe = jax.vmap(frame)
        vcompose = jax.vmap(compose)
        vstep = jax.vmap(
            lambda kv_b, pos_b, emb_b: backbone_forward(
                bb_params, kv_b, pos_b, emb_b[None], bb_cfg),
            in_axes=(0, 0, 0))

        def cond(s):
            return jnp.logical_and(s[0] < k_frames,
                                   jnp.logical_not(jnp.all(s[1])))

        def body(s):
            i, done, h, kv, pos, keys, buf = s
            nk = jax.vmap(jax.random.split)(keys)
            keys, subs = nk[:, 0], nk[:, 1]
            if traced_chain:
                codes = vframe(h, subs, text_ctx, chains)  # [B, n_cb]
            else:
                codes = vframe(h, subs, text_ctx)          # [B, n_cb]
            if eos_code >= 0:
                is_eos = jnp.logical_and(codes[:, 0] == eos_code,
                                         base_frame + i >= eos_min)
            else:
                is_eos = jnp.zeros((b,), bool)
            buf = jax.lax.dynamic_update_slice(buf, codes[None], (i, 0, 0))
            emb = vcompose(codes).astype(kv_dtype)
            h2, kv = vstep(kv, pos, emb)
            done = jnp.logical_or(done, is_eos)
            h = jnp.where(done[:, None], h, h2[:, 0].astype(jnp.float32))
            pos = jnp.where(done, pos, jnp.minimum(pos + 1, max_pos))
            return (i + 1, done, h, kv, pos, keys, buf)

        i, done, h, kv, pos, keys, buf = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), done0, h, kv,
             jnp.asarray(pos, jnp.int32), keys, buf0))
        packed = jnp.concatenate([buf.reshape(-1), i[None],
                                  done.astype(jnp.int32), pos])
        return packed, h, kv, keys

    if traced_chain:
        def chunk(bb_params, kv, pos, base_frame, h, keys, text_ctx,
                  done0, chains):
            return chunk_impl(bb_params, kv, pos, base_frame, h, keys,
                              text_ctx, done0, chains)
    else:
        def chunk(bb_params, kv, pos, base_frame, h, keys, text_ctx,
                  done0):
            return chunk_impl(bb_params, kv, pos, base_frame, h, keys,
                              text_ctx, done0, None)

    return jit_weighted(lm, chunk, array_attrs(lm), donate_argnums=(1,))


def build_stream_chunk(lm, bb_cfg, chain: Tuple[float, int, float, float],
                       rep: Tuple[float, int], n_frames: int) -> Callable:
    """K-frame chunk of the realtime streaming interleave (reference:
    run_realtime_streaming, tts_runner.cpp:490; host analog
    lm/tts_runner.py). Differences from build_gen_chunk: per-codebook
    repetition-penalty history rides in the carry (`rep=(penalty,
    window)`, see `_build_frame_rp`), and each non-EOS frame's backbone
    input row is tok_embd[text_sched[i]] + compose(codes) — the text side
    of the text⊕audio interleave, scheduled by the host per chunk.

    Returns fn(bb_params, kv, pos0, base_frame, h, key, hist, text_sched)
    → (packed int32 [K*n_cb + 3], h', kv', key', hist'); packed layout as
    build_gen_chunk. `text_sched` is int32 [K] (pad-filled past the spoken
    text); `kv` is donated.
    """
    from ..runtime.jit_weights import array_attrs, jit_weighted
    from .backbone import backbone_forward

    frame = lm._build_frame(chain, rep=rep)
    compose = lm.compose_embd_fn()
    info = lm.info
    eos_code = int(info.eos_code_c0)
    eos_min = int(info.eos_min_step)
    n_cb = int(info.n_codebook)
    k_frames = int(n_frames)

    def chunk(bb_params, kv, pos0, base_frame, h, key, hist, text_sched):
        buf0 = jnp.zeros((k_frames, n_cb), jnp.int32)
        kv_dtype = jax.tree_util.tree_leaves(kv)[0].dtype

        def cond(s):
            return jnp.logical_and(s[0] < k_frames, jnp.logical_not(s[1]))

        def body(s):
            i, _done, h, kv, pos, key, hist, buf = s
            key, sub = jax.random.split(key)
            codes, hist = frame(h, sub, jnp.int32(0), hist)
            if eos_code >= 0:
                is_eos = jnp.logical_and(codes[0] == eos_code,
                                         base_frame + i >= eos_min)
            else:
                is_eos = jnp.bool_(False)
            buf = jax.lax.dynamic_update_slice(buf, codes[None], (i, 0))

            def advance(op):
                h_in, kv_in = op
                emb = (bb_params["tok_embd"][text_sched[i]].astype(jnp.float32)
                       + compose(codes)).astype(kv_dtype)
                h2, kv2 = backbone_forward(bb_params, kv_in, pos,
                                           emb[None], bb_cfg)
                return h2[0].astype(jnp.float32), kv2

            h, kv = jax.lax.cond(is_eos, lambda op: op, advance, (h, kv))
            pos = pos + jnp.where(is_eos, 0, 1)
            return (i + 1, is_eos, h, kv, pos, key, hist, buf)

        i, done, h, kv, pos, key, hist, buf = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.bool_(False), h, kv,
             jnp.asarray(pos0, jnp.int32), key, hist, buf0))
        meta = jnp.stack([i, done.astype(jnp.int32), pos])
        packed = jnp.concatenate([buf.reshape(-1), meta])
        return packed, h, kv, key, hist

    return jit_weighted(lm, chunk, array_attrs(lm), donate_argnums=(1,))


def build_continuous_chunk(lm, bb_cfg, n_steps: int,
                           n_timesteps: int = 10) -> Callable:
    """K steps of the continuous-latent (CFM) flow in ONE device call:
    CFM step (9 Euler × 2 CFG LocDiT passes + RALM KV step + feedbacks)
    → in-graph stop gate (stop-head argmax + min_len guard, matching
    step_generate's host gate) → backbone step on the fb_tslm feedback
    embed. The host loop (run_continuous) otherwise pays one relay
    dispatch per step (~35 ms floor vs a ~21 ms graph, docs/PERF.md);
    this is the continuous-kind analog of build_gen_chunk.

    Returns fn(bb_params, bb_kv, bb_pos0, h, kcs, vcs, pfb_lm, prim_lm,
    prim_res, cond, noises [K,P,D], kv_pos0, base_idx, min_len, tsin,
    dtsin, dts, cfgv) → (packed f32 [K·P·D + h_barbet + 3], h', kcs',
    vcs', pfb_lm', prev_patch', bb_kv') with packed = patches.ravel() ++
    last fb_tslm ++ [n_emitted, stopped, bb_pos_after]. Emitted patches
    and the stop decision are bit-identical to K step_generate calls
    with the same noise sequence (primed=False steady state — the host
    runs the first post-prefill step per-step). `bb_kv`, `kcs`, `vcs`
    are donated."""
    from ..runtime.jit_weights import jit_weighted
    from .backbone import backbone_forward

    K = int(n_steps)
    pd = lm.patch_size * lm.latent_dim

    def chunk(bb_params, bb_kv, bb_pos0, h, kcs, vcs, pfb_lm, prim_lm,
              prim_res, cond, noises, kv_pos0, base_idx, min_len, tsin,
              dtsin, dts, cfgv):
        kv_dtype = jax.tree_util.tree_leaves(bb_kv)[0].dtype
        buf0 = jnp.zeros((K, pd), jnp.float32)
        fb0 = jnp.zeros((lm.h_barbet,), jnp.float32)
        le0 = jnp.zeros((lm.patch_size, lm.latent_dim), jnp.float32)

        def cond_fn(s):
            return jnp.logical_and(s[0] < K, jnp.logical_not(s[1]))

        def body(s):
            i, _done, h, kcs, vcs, pfb, cnd, bb_kv, pos, buf, _fb = s
            k2, v2, patch, fb_lm, packed = lm._step_fn(
                kcs, vcs, h, pfb, prim_lm, prim_res, cnd, noises[i],
                tsin, dtsin, dts, kv_pos0 + i, False, cfgv, le0,
                jnp.asarray(False))
            buf = jax.lax.dynamic_update_slice(buf, packed[None, :pd],
                                               (i, 0))
            fb_tslm = packed[pd + 2:]
            # step_generate's gate: stop only after patch_index > min_len
            stop = jnp.logical_and(packed[pd + 1] > packed[pd],
                                   base_idx + i > min_len)

            def advance(op):
                bb_kv_in, h_in, pos_in = op
                h2, kv2 = backbone_forward(bb_params, bb_kv_in, pos_in,
                                           fb_tslm.astype(kv_dtype)[None],
                                           bb_cfg)
                return kv2, h2[0].astype(jnp.float32), pos_in + 1

            bb_kv, h, pos = jax.lax.cond(stop, lambda op: op, advance,
                                         (bb_kv, h, pos))
            return (i + 1, stop, h, k2, v2, fb_lm, patch, bb_kv, pos,
                    buf, fb_tslm)

        s = jax.lax.while_loop(
            cond_fn, body,
            (jnp.int32(0), jnp.bool_(False), h, kcs, vcs, pfb_lm, cond,
             bb_kv, jnp.asarray(bb_pos0, jnp.int32), buf0, fb0))
        i, done, h, kcs, vcs, pfb, cnd, bb_kv, pos, buf, fb_last = s
        meta = jnp.stack([i.astype(jnp.float32), done.astype(jnp.float32),
                          pos.astype(jnp.float32)])
        packed_out = jnp.concatenate([buf.reshape(-1), fb_last, meta])
        return packed_out, h, kcs, vcs, pfb, cnd, bb_kv

    return jit_weighted(lm, chunk, ("w",), donate_argnums=(1, 4, 5))


def continuous_chunk_cached(lm, backbone, n_steps: int) -> Callable:
    cache = getattr(lm, "_cont_chunk_cache", None)
    if cache is None:
        cache = lm._cont_chunk_cache = {}
    key = (int(n_steps), repr(backbone.cfg))
    fn = cache.get(key)
    if fn is None:
        fn = build_continuous_chunk(lm, backbone.cfg, n_steps)
        cache[key] = fn
    return fn


def build_chatterbox_chunk(bb_cfg, chain: Tuple[float, int, float, float],
                           rep_pen: float, n_frames: int, *, n_seq: int,
                           cfg_weight: float, stop_token: int,
                           n_pos: int) -> Callable:
    """K frames of the Chatterbox T3 dual-lane CFG loop in ONE device
    call (reference host loop: run_chatterbox, tts_runner.cpp:876; host
    analog lm/tts_runner.run_chatterbox). Per frame: speech-head logits
    for both lanes → CFG combine cond + w·(cond − uncond) → T3 sampler
    chain in-graph (unbounded-history repetition penalty over a [V] seen
    mask → temperature → top_k → min_p → top_p; greedy at temperature
    <= 0, mirroring the host SamplerChain) → stop on `stop_token` →
    speech-embed + per-step pos-emb compose → one backbone step per lane
    (vmapped: the two CFG lanes ride as a batch dim through shared
    weights). The host loop pays 2·n_seq dispatches per frame; this pays
    2/K per frame.

    Returns fn(bb_params, head [V, hidden], speech_emb [V, hidden],
    pos_emb [P, hidden], kv [S, L, 2, nkv, ctx, D] (donated), pos0,
    step0, h [S, hidden] f32, key, seen [V] bool) →
    (packed int32 [K + 4], h', kv', key', seen') with packed =
    codes ++ [n_emit, stopped, pos_after, step_after]. `seen` carries
    the sampler's repetition history (seed it with the BOS speech token,
    matching T3Sampler's seed_token); `step0` is the global frame index
    (pos-emb row = step + 1, reference: compose_speech_embd)."""
    from ..ops.sample import apply_repetition_penalty, sample_logits
    from .backbone import backbone_forward

    k_frames = int(n_frames)
    cfg_w = float(cfg_weight)
    stop = int(stop_token)
    greedy = chain[0] <= 0.0
    use_pen = (not greedy) and rep_pen != 1.0

    def chunk(bb_params, head, speech_emb, pos_emb, kv, pos0, step0, h,
              key, seen):
        kv_dtype = jax.tree_util.tree_leaves(kv)[0].dtype
        buf0 = jnp.zeros((k_frames,), jnp.int32)

        def cond_fn(s):
            return jnp.logical_and(s[0] < k_frames, jnp.logical_not(s[1]))

        def body(s):
            i, _done, h, kv, pos, step, key, seen, buf = s
            lg = h @ head.T                                  # [S, V]
            logits = lg[0] + cfg_w * (lg[0] - lg[1]) if n_seq == 2 \
                else lg[0]
            key, sub = jax.random.split(key)
            if greedy:
                code = jnp.argmax(logits).astype(jnp.int32)
            else:
                pl = apply_repetition_penalty(logits, seen, rep_pen) \
                    if use_pen else logits
                code = sample_logits(pl, sub, temperature=chain[0],
                                     top_k=chain[1], top_p=chain[2],
                                     min_p=chain[3])
            seen = seen.at[code].set(True)
            buf = jax.lax.dynamic_update_slice(buf, code[None], (i,))
            is_stop = code == stop

            def advance(op):
                h_in, kv_in = op
                prow = jnp.clip(step + 1, 0, n_pos - 1)
                emb = (speech_emb[code]
                       + jnp.where(step + 1 < n_pos, pos_emb[prow], 0.0)
                       ).astype(kv_dtype)
                h2, kv2 = jax.vmap(
                    lambda kv_l: backbone_forward(bb_params, kv_l, pos,
                                                  emb[None], bb_cfg))(kv_in)
                return h2[:, 0].astype(jnp.float32), kv2

            h, kv = jax.lax.cond(is_stop, lambda op: op, advance, (h, kv))
            pos = pos + jnp.where(is_stop, 0, 1)
            step = step + jnp.where(is_stop, 0, 1)
            return (i + 1, is_stop, h, kv, pos, step, key, seen, buf)

        i, done, h, kv, pos, step, key, seen, buf = jax.lax.while_loop(
            cond_fn, body,
            (jnp.int32(0), jnp.bool_(False), h, kv,
             jnp.asarray(pos0, jnp.int32), jnp.asarray(step0, jnp.int32),
             key, seen, buf0))
        meta = jnp.stack([i, done.astype(jnp.int32), pos, step])
        return jnp.concatenate([buf, meta]), h, kv, key, seen

    return jax.jit(chunk, donate_argnums=(4,))


def build_chatterbox_chunk_batched(bb_cfg, n_frames: int, *, n_seq: int,
                                   cfg_weight: float, stop_token: int,
                                   n_pos: int,
                                   rep_pen: float = 1.2) -> Callable:
    """B concurrent Chatterbox generations, each with its S CFG lanes,
    in ONE vmapped device loop — the /synthesize_batch shape for the T3
    family (the single-stream loop is build_chatterbox_chunk; contract
    identical per stream, including the `jax.random.split` sequence).
    The T3 sampler chain rides as a traced per-stream [B, 4] input
    (`[temperature, top_k, top_p, min_p]`, `sample_logits_dyn`; the
    repetition penalty stays a build-time static — T3's preset — and is
    skipped per stream when its temperature <= 0, matching the host
    SamplerChain).

    Returns fn(bb_params, head, speech_emb, pos_emb,
    kv [B, S, L, 2, nkv, ctx, D] (donated), pos [B], step [B],
    h [B, S, hidden] f32, keys [B] PRNG, seen [B, V] bool, done0 [B],
    chains [B, 4]) → (packed int32 [K·B + 1 + 3B], h', kv', keys',
    seen') with packed = codes[K, B].ravel() ++ [n_iter] ++ done[B] ++
    pos[B] ++ step[B]. Frozen (done) streams' rows are junk the host
    must ignore; their state never advances."""
    from ..ops.sample import apply_repetition_penalty, sample_logits_dyn
    from .backbone import backbone_forward

    k_frames = int(n_frames)
    cfg_w = float(cfg_weight)
    stop = int(stop_token)
    rep_pen = float(rep_pen)              # T3Sampler preset by default

    def chunk(bb_params, head, speech_emb, pos_emb, kv, pos, step, h,
              keys, seen, done0, chains):
        b = h.shape[0]
        kv_dtype = jax.tree_util.tree_leaves(kv)[0].dtype
        buf0 = jnp.zeros((k_frames, b), jnp.int32)

        def sample_one(logits, sub, seen_row, chain):
            pen = apply_repetition_penalty(logits, seen_row, rep_pen)
            use = jnp.logical_and(chain[0] > 0.0, rep_pen != 1.0)
            return sample_logits_dyn(jnp.where(use, pen, logits), sub,
                                     chain)

        def cond_fn(s):
            return jnp.logical_and(s[0] < k_frames,
                                   jnp.logical_not(jnp.all(s[1])))

        def body(s):
            i, done, h, kv, pos, step, keys, seen, buf = s
            nk = jax.vmap(jax.random.split)(keys)
            keys, subs = nk[:, 0], nk[:, 1]
            lg = jnp.einsum("bsh,vh->bsv", h, head)      # [B, S, V]
            logits = lg[:, 0] + cfg_w * (lg[:, 0] - lg[:, 1]) \
                if n_seq == 2 else lg[:, 0]
            codes = jax.vmap(sample_one)(logits, subs, seen, chains)
            seen = seen.at[jnp.arange(b), codes].set(True)
            buf = jax.lax.dynamic_update_slice(buf, codes[None], (i, 0))
            is_stop = jnp.logical_or(codes == stop, done)

            prow = jnp.clip(step + 1, 0, n_pos - 1)
            emb = (speech_emb[codes]
                   + jnp.where((step + 1 < n_pos)[:, None],
                               pos_emb[prow], 0.0)).astype(kv_dtype)
            h2, kv2 = jax.vmap(jax.vmap(
                lambda kv_l, p, e: backbone_forward(bb_params, kv_l, p,
                                                    e[None], bb_cfg),
                in_axes=(0, None, None)), in_axes=(0, 0, 0))(kv, pos, emb)
            done = is_stop
            h = jnp.where(done[:, None, None], h,
                          h2[:, :, 0].astype(jnp.float32))
            kv = kv2
            pos = jnp.where(done, pos, pos + 1)
            step = jnp.where(done, step, step + 1)
            return (i + 1, done, h, kv, pos, step, keys, seen, buf)

        i, done, h, kv, pos, step, keys, seen, buf = jax.lax.while_loop(
            cond_fn, body,
            (jnp.int32(0), jnp.asarray(done0, bool), h, kv,
             jnp.asarray(pos, jnp.int32), jnp.asarray(step, jnp.int32),
             keys, seen, buf0))
        packed = jnp.concatenate([buf.reshape(-1), i[None],
                                  done.astype(jnp.int32), pos, step])
        return packed, h, kv, keys, seen

    return jax.jit(chunk, donate_argnums=(4,))


def init_rep_hist(lm, window: int):
    """Fresh repetition-penalty history for build_stream_chunk's carry:
    a (−1-filled ring [n_cb, window], slot pointer) for window > 0, or a
    seen-mask [n_cb, max vocab] for window < 0."""
    n_cb = int(lm.info.n_codebook)
    if window > 0:
        return (jnp.full((n_cb, int(window)), -1, jnp.int32), jnp.int32(0))
    return jnp.zeros((n_cb, max(lm.info.codebook_sizes)), bool)


def gen_chunk_cached(lm, backbone, *, n_frames: int,
                     temperature: float = 0.0, top_k: int = 0,
                     top_p: float = 1.0, min_p: float = 0.0,
                     rep: Tuple[float, int] | None = None,
                     stream: bool = False, cb0_range=None,
                     batched: bool = False,
                     traced_chain: bool = False) -> Callable:
    """Per-LM cache over build_gen_chunk / build_stream_chunk, keyed by
    (sampler chain, rep, K, flavor, backbone shape). Backbone weights ride
    as explicit jit arguments, so one compiled chunk serves any checkpoint
    of the same config.

    `traced_chain=True` (batched only) ignores the temperature/top_k/
    top_p/min_p statics and builds the chunk that takes per-slot sampler
    parameters as a traced [B, 4] input — the continuous-batching engine's
    per-request-sampling mode."""
    if traced_chain and not batched:
        raise ValueError("traced_chain is a batched-chunk mode")
    chain = None if traced_chain else (
        float(temperature), int(top_k), float(top_p), float(min_p))
    cache = getattr(lm, "_gen_chunk_cache", None)
    if cache is None:
        cache = lm._gen_chunk_cache = {}
    key = (chain, rep, int(n_frames), stream, cb0_range, batched,
           repr(backbone.cfg))
    fn = cache.get(key)
    if fn is None:
        if stream:
            fn = build_stream_chunk(lm, backbone.cfg, chain,
                                    rep or (1.0, 0), n_frames)
        elif batched:
            fn = build_gen_chunk_batched(lm, backbone.cfg, chain, n_frames,
                                         cb0_range=cb0_range)
        else:
            fn = build_gen_chunk(lm, backbone.cfg, chain, n_frames,
                                 cb0_range=cb0_range)
        cache[key] = fn
    return fn


def supports_gen_chunk(lm: Any, backbone: Any) -> bool:
    """The chunked loop needs a traceable frame + compose on the LM kind
    and a JAX backbone with functional KV (the tts_runner Backbone
    protocol alone — an opaque host LLM — cannot be chained in-graph).
    Pipeline-staged backbones (set_mesh_pp) also stand down: the chunk
    inlines `backbone_forward`, not the shard_map GPipe program, so a
    PP backbone generates through the host per-frame loop (its
    prefill/step ARE the pipelined fns). TP and EP compose fine — they
    are plain sharding annotations that jit propagates into the chunk."""
    return (hasattr(lm, "_build_frame") and hasattr(lm, "compose_embd_fn")
            and getattr(lm, "gen_chunk_ok", lambda: True)()
            and hasattr(backbone, "params") and hasattr(backbone, "kv")
            and hasattr(backbone, "cfg")
            and getattr(backbone, "_pp", None) is None)

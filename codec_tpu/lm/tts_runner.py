"""tts_runner — reference host loop driving a backbone + codec_lm + codec.

Reference behavior: common/tts_runner.cpp. The backbone is NEVER linked in
(the reference isolates llama.cpp behind libttsbackbone; here the backbone
is any object satisfying the `Backbone` protocol below — a JAX LLM, an HF
model, or a test stub). The data boundary is identical: the runner feeds
input embeddings, receives a hidden state per step, samples with a
caller-supplied sampler, and drives the codec_lm step machine.

Flows implemented (reference dispatch: tts_runner_synthesize,
tts_runner.cpp:1043):
  - run_codebook_ar         (CSM / Qwen3-TTS / MOSS-TTSD — Type C/D)
  - run_continuous          (BlueMagpie continuous-latent CFM)
  - run_chatterbox          (T3 dual-lane CFG loop, tts_runner.cpp:876)
  - run_realtime_streaming  (MOSS-TTS-Realtime text⊕audio interleave, :490)
  - run_lfm2_sequential     (LFM2-Audio text→audio switch, :609)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Protocol, Sequence

import numpy as np

from ..ops.sample import OnDeviceSampling
from .audio_lm import AudioLM, ObserveAction
from .decode_transform import transform_lm_codes


def _decode_transformed(audio_lm: AudioLM, codes: np.ndarray, n_q: int = 0,
                        n_speech_frames=None) -> Optional[np.ndarray]:
    """codes [T, n_cb] → PCM via the LM-codes→codec-codes transform
    (reference: audio_lm_decode_audio, common/audio_lm.cpp:1513-1580).
    Identity for models with no control cb0 / delay / merged vocab."""
    out = transform_lm_codes(
        codes, audio_lm.decode_transform,
        codebook_size=getattr(audio_lm.codec, "codebook_size", 0),
        n_frames_out=n_speech_frames)
    if not len(out):
        return None
    return audio_lm.codec.decode(out, n_q=n_q)


class Backbone(Protocol):
    """Minimal host-LLM interface: one AR step on an input embedding."""

    def step(self, embed: np.ndarray) -> np.ndarray:
        """Feed one input embedding [hidden] → backbone hidden [hidden]."""
        ...


def greedy_sampler(cb_idx: int, logits: np.ndarray) -> int:
    return int(np.argmax(logits))


@dataclass
class SynthesisResult:
    codes: np.ndarray              # [T, n_cb]
    pcm: Optional[np.ndarray]      # decoded audio (None when no codec attached)
    n_steps: int
    stopped_by_eos: bool


def run_continuous(
    audio_lm: AudioLM,
    backbone: Backbone,
    prompt_embeds: Sequence[np.ndarray],
    max_steps: int = 1024,
    prefill_hiddens=None,
    decode: bool = True,
    chunk_steps: int = 1,
    min_len: int = -1,
) -> SynthesisResult:
    """Continuous-latent flow (reference: run_continuous, tts_runner.cpp:450):
    optional RALM text-prefill over prompt hiddens, then per step: backbone
    hidden → step_generate (patch + stop + feedback embed).

    `chunk_steps > 1` with a JAX backbone chains K whole steps — CFM step
    + in-graph stop gate + backbone step — per device call
    (lm/fused_gen.build_continuous_chunk): the first post-prefill step
    runs per-step (it may be primed), the rest chunk; emitted latents are
    identical to the per-step loop (same host-RNG noise sequence).

    `min_len >= 0` overrides the GGUF's stop-head guard (the stop flag is
    ignored before that many patches; reference --min-len →
    audio_lm_set_continuous_params)."""
    if audio_lm.lm is None or not audio_lm.is_continuous:
        raise ValueError("run_continuous requires a continuous-latent codec_lm")
    audio_lm.reset()
    if min_len >= 0:
        audio_lm.lm.set_min_len(audio_lm.state, int(min_len))
    if prefill_hiddens is not None:
        audio_lm.text_prefill(np.asarray(prefill_hiddens, np.float32))

    h = None
    for e in prompt_embeds:
        h = backbone.step(np.asarray(e, np.float32))
    if h is None:
        raise ValueError("prompt_embeds must contain at least one embedding")

    lm = audio_lm.lm
    use_chunk = (chunk_steps > 1 and hasattr(backbone, "params")
                 and hasattr(backbone, "kv") and hasattr(backbone, "cfg")
                 and hasattr(lm, "_step_fn")
                 and getattr(backbone, "_pp", None) is None)

    stopped = False
    steps = 0
    # first step per-step (handles the primed-after-prefill case and
    # populates the timestep-schedule cache the chunk reuses)
    action = audio_lm.observe_hidden(h)
    steps += 1
    if action is ObserveAction.STOP:
        stopped = True
    elif use_chunk:
        import jax.numpy as jnp

        from .fused_gen import continuous_chunk_cached

        chunk_fn = continuous_chunk_cached(lm, backbone, int(chunk_steps))
        ks = audio_lm.state.kind_state
        tsin, dtsin, dts = lm._sched_cache[
            getattr(audio_lm, "_n_timesteps", 10)]
        cfgv = np.float32(getattr(audio_lm, "_cfg_value", 2.0))
        min_len = int(ks["min_len"] if ks["min_len"] >= 0 else lm.min_len)
        K = int(chunk_steps)
        P, D = lm.patch_size, lm.latent_dim
        pd = P * D
        h_dev = jnp.asarray(np.asarray(
            backbone.step(audio_lm.next_embed), np.float32))
        while steps < max_steps and not stopped:
            noises = np.stack(
                [ks["rng"].standard_normal((P, D)) for _ in range(K)]
            ).astype(np.float32)
            (packed, h_dev, ks["k"], ks["v"], ks["prev_fb_lm"],
             ks["prev_patch"], backbone.kv) = chunk_fn(
                backbone.params, backbone.kv, np.int32(backbone.pos),
                h_dev, ks["k"], ks["v"], ks["prev_fb_lm"],
                ks["prefill_lm"], ks["prefill_res"], ks["prev_patch"],
                jnp.asarray(noises), np.int32(ks["kv_pos"]),
                np.int32(ks["patch_index"]), np.int32(min_len),
                tsin, dtsin, dts, cfgv)
            arr = np.asarray(packed)
            n_emit = int(arr[-3])
            done = bool(arr[-2])
            backbone.pos = int(arr[-1])
            if n_emit == 0:
                break
            patches = arr[: K * pd].reshape(K, P, D)
            take = min(n_emit, max_steps - steps)
            for i in range(take):
                audio_lm.latents.append(
                    np.asarray(patches[i], np.float32))
            steps += take
            ks["kv_pos"] += n_emit
            ks["patch_index"] += n_emit
            ks["fb_tslm"] = arr[K * pd: K * pd + lm.h_barbet].astype(
                np.float32)
            audio_lm.next_embed = ks["fb_tslm"]
            if done and take == n_emit:
                stopped = True
    if not stopped and not use_chunk:
        while steps < max_steps:
            h = backbone.step(audio_lm.next_embed)
            action = audio_lm.observe_hidden(h)
            steps += 1
            if action is ObserveAction.STOP:
                stopped = True
                break

    latents = (np.concatenate(audio_lm.latents, axis=0)
               if audio_lm.latents else np.zeros((0, audio_lm.lm.info.latent_dim)))
    pcm = None
    if decode and audio_lm.codec is not None and len(latents):
        pcm = audio_lm.codec.decode_latent(latents)
    return SynthesisResult(codes=latents, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


class SamplerChain:
    """llama-style chain: repetition penalty (ring buffer) → temperature →
    top_k → min_p → top_p → categorical (reference: SamplerChain,
    tts_runner.cpp:242-246 — llama samplers renormalize between stages).
    window<0 ⇒ unbounded history; 0 ⇒ no penalty."""

    def __init__(self, seed: int = 0xC0DEC1AB, temperature: float = 0.8,
                 top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0, repetition_window: int = -1,
                 seed_token: Optional[int] = None):
        self.rng = np.random.default_rng(seed)
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.min_p = min_p
        self.rep_pen = repetition_penalty
        self.rep_window = repetition_window
        self.history: List[int] = [] if seed_token is None else [seed_token]

    def __call__(self, logits: np.ndarray) -> int:
        logits = np.asarray(logits, np.float64).copy()
        if self.temperature <= 0.0:
            code = int(np.argmax(logits))
            self.history.append(code)
            return code
        hist = self.history if self.rep_window < 0 else \
            self.history[-self.rep_window:] if self.rep_window else []
        if self.rep_pen != 1.0 and hist:
            seen = np.unique(hist)
            pos = logits[seen] > 0
            logits[seen[pos]] /= self.rep_pen
            logits[seen[~pos]] *= self.rep_pen
        logits /= self.temperature
        if self.top_k > 0 and self.top_k < len(logits):
            kth = np.partition(logits, -self.top_k)[-self.top_k]
            logits[logits < kth] = -np.inf
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        if self.min_p > 0.0:
            probs[probs < self.min_p * probs.max()] = 0.0
            probs /= probs.sum()
        if self.top_p < 1.0:
            order = np.argsort(probs)[::-1]
            csum = np.cumsum(probs[order])
            cut = np.searchsorted(csum, self.top_p) + 1
            mask = np.zeros_like(probs)
            mask[order[:cut]] = 1.0
            probs *= mask
        probs /= probs.sum()
        code = int(self.rng.choice(len(probs), p=probs))
        self.history.append(code)
        return code


class T3Sampler(SamplerChain):
    """Chatterbox T3 preset: penalties(full history, BOS-seeded) → temp →
    min_p → top_p (reference: tts_runner.cpp:965-975)."""

    def __init__(self, seed: int = 0xC0DEC1AB, temperature: float = 0.8,
                 top_p: float = 1.0, min_p: float = 0.05,
                 repetition_penalty: float = 1.2,
                 seed_token: Optional[int] = None):
        super().__init__(seed=seed, temperature=temperature, top_k=0,
                         top_p=top_p, min_p=min_p,
                         repetition_penalty=repetition_penalty,
                         repetition_window=-1, seed_token=seed_token)


def run_realtime_streaming(
    audio_lm: AudioLM,
    backbone: Backbone,
    text_embd_fn: Callable[[int], np.ndarray],
    ctx_tokens: Sequence[int],
    text_tokens: Sequence[int],
    pi,
    max_frames: int = 1024,
    samplers: Optional[Sequence[Callable[[np.ndarray], int]]] = None,
    decode: bool = True,
    on_device: "OnDeviceSampling | None" = None,
) -> SynthesisResult:
    """MOSS-TTS-Realtime streaming interleave (reference:
    run_realtime_streaming, tts_runner.cpp:490). Each backbone input row is
    text_embd[token] + compose_audio_embd(codes); the prompt prefill pads
    the audio channel, the last prefill row carries the BOS code, then the
    spoken text streams one token per generated audio frame (padded out
    with text_pad once exhausted). `pi` is a PromptInfo.

    `on_device` with chunk_frames > 1 and a JAX backbone runs the loop as
    K-frame device chunks (lm/fused_gen.py build_stream_chunk): fused
    frame with per-codebook repetition penalty (on_device.repetition_*;
    ring/mask history carried on device), text⊕audio compose and backbone
    step all in one lax.while_loop per chunk. `samplers` is then unused —
    the sampler chain is on_device's, and the text schedule must be a
    concrete token list (text_embd_fn must be the backbone's tok_embd
    lookup, which it is for every caller)."""
    if audio_lm.lm is None:
        raise ValueError("model has no codec_lm adaptor")
    audio_lm.reset()
    audio_lm.set_uses_embed_override(True, start_step=1)
    n_cb = audio_lm.n_codebook
    pad_codes = [pi.audio_pad_code] * n_cb
    if samplers is None:
        samplers = [SamplerChain(temperature=pi.default_temperature,
                                 top_k=pi.default_top_k, top_p=pi.default_top_p,
                                 repetition_penalty=pi.default_repetition_penalty,
                                 repetition_window=pi.repetition_window)
                    for _ in range(n_cb)]

    def compose_row(text_tok: int, codes) -> np.ndarray:
        return (np.asarray(text_embd_fn(text_tok), np.float32) +
                audio_lm.lm.compose_audio_embd(codes))

    prefill_n = min(pi.prefill_text_len, len(text_tokens))
    h = None
    for tok in ctx_tokens:
        h = backbone.step(compose_row(tok, pad_codes))
    for i in range(prefill_n):
        codes = list(pad_codes)
        if i == prefill_n - 1:
            codes[0] = pi.bos_code_c0
        h = backbone.step(compose_row(text_tokens[i], codes))
    if h is None:
        raise ValueError("empty context tokens")

    st = audio_lm.state
    text_idx = prefill_n
    stopped = False
    steps = 0

    chunk_n = int(getattr(on_device, "chunk_frames", 1) or 1) \
        if on_device is not None else 1
    if chunk_n > 1:
        from .fused_gen import supports_gen_chunk

        if not (supports_gen_chunk(audio_lm.lm, backbone)
                and hasattr(audio_lm.lm, "_build_frame_rp")):
            chunk_n = 1
    if chunk_n > 1:
        import jax
        import jax.numpy as jnp

        from .fused_gen import gen_chunk_cached, init_rep_hist

        rep = (float(on_device.repetition_penalty),
               int(on_device.repetition_window))
        chunk_fn = gen_chunk_cached(
            audio_lm.lm, backbone, n_frames=chunk_n, stream=True, rep=rep,
            temperature=on_device.temperature, top_k=on_device.top_k,
            top_p=on_device.top_p, min_p=on_device.min_p)
        hist = init_rep_hist(audio_lm.lm, rep[1])
        key = jax.random.PRNGKey(on_device.seed)
        kv = backbone.kv
        pos = backbone.pos
        hd = jnp.asarray(np.asarray(h, np.float32))
        while steps < max_frames and not stopped:
            sched = np.asarray(
                [text_tokens[text_idx + j] if text_idx + j < len(text_tokens)
                 else pi.text_pad_id for j in range(chunk_n)], np.int32)
            packed, hd, kv, key, hist = chunk_fn(
                backbone.params, kv, np.int32(pos),
                np.int32(st.frame_counter), hd, key, hist,
                jnp.asarray(sched))
            arr = np.asarray(packed)
            n_emit = int(arr[-3])
            pos = int(arr[-1])
            if n_emit == 0:
                break
            rows = arr[: chunk_n * n_cb].reshape(chunk_n, n_cb)[:n_emit]
            for row in rows:
                codes = st.push_frame(row)
                # compose=False: the chunk composes feedback in-graph
                if audio_lm.observe_codes(
                        codes, compose=False) is ObserveAction.STOP:
                    stopped = True
                    break
                steps += 1
                text_idx += 1
                if steps >= max_frames:
                    break
        backbone.kv = kv
        backbone.pos = pos
        max_frames = 0                           # skip the per-frame loop

    for _ in range(max_frames):
        st.step_begin(np.asarray(h, np.float32))
        for cb in range(n_cb):
            logits, cb_idx = st.step_logits()
            st.step_push_code(samplers[cb_idx](logits))
        codes = st.step_finish()
        action = audio_lm.observe_codes(codes, last_hidden=h)
        if action is ObserveAction.STOP:
            stopped = True
            break
        steps += 1
        text_tok = (text_tokens[text_idx] if text_idx < len(text_tokens)
                    else pi.text_pad_id)
        text_idx += 1
        h = backbone.step(compose_row(text_tok, codes))

    codes = audio_lm.codes_matrix()
    if stopped and audio_lm.lm.info.eos_code_c0 >= 0 and len(codes):
        codes = codes[:-1]
    pcm = None
    if decode and audio_lm.codec is not None and len(codes):
        pcm = _decode_transformed(audio_lm, codes)
    return SynthesisResult(codes=codes, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


def run_lfm2_sequential(
    audio_lm: AudioLM,
    backbone: Backbone,
    text_embd_table: np.ndarray,
    prompt_tokens: Sequence[int],
    pi,
    max_frames: int = 1024,
    sampler: Optional[Callable[[np.ndarray], int]] = None,
    decode: bool = True,
    on_device: "OnDeviceSampling | None" = None,
) -> SynthesisResult:
    """LFM2-Audio sequential text→audio (reference: run_lfm2_sequential,
    tts_runner.cpp:609). Free-runs in text modality (tied-embedding logits
    = text_embd_table @ hidden) until audio_start_id, then codebook-AR
    until EOS. One sampler stream drives both phases.

    `on_device` with chunk_frames > 1 and a JAX backbone runs the AUDIO
    phase as K-frame device chunks (lm/fused_gen.py); the short text
    phase stays on the host. `sampler` then only drives the text phase."""
    if audio_lm.lm is None:
        raise ValueError("model has no codec_lm adaptor")
    audio_lm.reset()
    audio_lm.set_uses_embed_override(True, start_step=1)
    table = np.asarray(text_embd_table, np.float32)
    if sampler is None:
        sampler = SamplerChain(temperature=pi.default_temperature,
                               top_k=pi.default_top_k, top_p=pi.default_top_p)

    h = None
    for tok in prompt_tokens:
        h = backbone.step(table[tok])
    if h is None:
        raise ValueError("empty prompt tokens")

    for _ in range(pi.max_text_tokens):
        tok = sampler(table @ np.asarray(h, np.float32))
        if tok == pi.audio_start_id:
            break
        if tok == pi.text_end_id:
            return SynthesisResult(codes=np.zeros((0, audio_lm.n_codebook),
                                                  np.int32),
                                   pcm=None, n_steps=0, stopped_by_eos=True)
        h = backbone.step(table[tok])
    h = backbone.step(table[pi.audio_start_id])

    st = audio_lm.state
    stopped = False
    steps = 0

    chunk_n = int(getattr(on_device, "chunk_frames", 1) or 1) \
        if on_device is not None else 1
    if chunk_n > 1:
        from .fused_gen import supports_gen_chunk

        if not supports_gen_chunk(audio_lm.lm, backbone):
            chunk_n = 1
    if chunk_n > 1:
        import jax
        import jax.numpy as jnp

        from .fused_gen import gen_chunk_cached

        chunk_fn = gen_chunk_cached(
            audio_lm.lm, backbone, n_frames=chunk_n,
            temperature=on_device.temperature, top_k=on_device.top_k,
            top_p=on_device.top_p, min_p=on_device.min_p)
        n_cb = audio_lm.n_codebook
        key = jax.random.PRNGKey(on_device.seed)
        kv = backbone.kv
        pos = backbone.pos
        hd = jnp.asarray(np.asarray(h, np.float32))
        while steps < max_frames and not stopped:
            packed, hd, kv, key = chunk_fn(
                backbone.params, kv, np.int32(pos),
                np.int32(st.frame_counter), hd, key, np.int32(0))
            arr = np.asarray(packed)
            n_emit = int(arr[-3])
            pos = int(arr[-1])
            if n_emit == 0:
                break
            rows = arr[: chunk_n * n_cb].reshape(chunk_n, n_cb)[:n_emit]
            for row in rows:
                codes = st.push_frame(row)
                # compose=False: the chunk composes feedback in-graph
                if audio_lm.observe_codes(
                        codes, compose=False) is ObserveAction.STOP:
                    stopped = True
                    break
                steps += 1
                if steps >= max_frames:
                    break
        backbone.kv = kv
        backbone.pos = pos
        max_frames = 0                           # skip the per-frame loop

    for _ in range(max_frames):
        st.step_begin(np.asarray(h, np.float32))
        for _cb in range(audio_lm.n_codebook):
            logits, _ = st.step_logits()
            st.step_push_code(sampler(logits))
        codes = st.step_finish()
        action = audio_lm.observe_codes(codes, last_hidden=h)
        if action is ObserveAction.STOP:
            stopped = True
            break
        steps += 1
        h = backbone.step(audio_lm.lm.compose_audio_embd(codes))

    codes = audio_lm.codes_matrix()
    if stopped and audio_lm.lm.info.eos_code_c0 >= 0 and len(codes):
        codes = codes[:-1]
    pcm = None
    if decode and audio_lm.codec is not None and len(codes):
        pcm = _decode_transformed(audio_lm, codes)
    return SynthesisResult(codes=codes, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


def run_chatterbox(
    audio_lm: AudioLM,
    t3,
    backbones: Sequence[Backbone],
    text: str,
    max_frames: int = 1024,
    cfg_weight: float = 0.5,
    sampler: Optional[Callable[[np.ndarray], int]] = None,
    speaker_emb=None,
    ref_speech_tokens=None,
    ref_pcm=None,
    emotion: Optional[float] = None,
    decode: bool = True,
    on_device: "OnDeviceSampling | None" = None,
    prefill_bucket: int = 0,
) -> SynthesisResult:
    """Chatterbox T3 flow (reference: run_chatterbox, tts_runner.cpp:876).

    `t3` is a ChatterboxT3; `backbones` holds one Backbone per CFG lane
    (the reference multiplexes lanes through llama seq-ids; here each lane
    owns a backbone instance with its own KV state). Per step: speech-head
    logits per lane via the codec_lm step machine → CFG combine
    cond + w·(cond − uncond) → sample → stop on stop_speech_token →
    compose next speech embedding fed to every lane.

    `on_device` (with JAX backbones): the whole loop runs as K-frame
    device chunks (lm/fused_gen.build_chatterbox_chunk) — both CFG lanes
    batched through shared weights, the T3 sampler chain (repetition
    penalty/temperature/top_k/min_p/top_p from `on_device`, greedy at
    temperature <= 0) in-graph; `sampler` is then unused. The host path
    pays 2·n_seq dispatches per frame, the chunked path 2/K.
    `prefill_bucket` buckets the per-lane prompt prefill either way."""
    text_ids = t3.tokenize(text)
    prompt = t3.build_prompt(text_ids, cfg_weight=cfg_weight,
                             speaker_emb=speaker_emb,
                             ref_speech_tokens=ref_speech_tokens,
                             ref_pcm=ref_pcm, emotion=emotion)
    n_seq = prompt.shape[0]
    if len(backbones) < n_seq:
        raise ValueError(f"chatterbox needs {n_seq} backbone lanes "
                         f"(cfg_weight={cfg_weight})")
    if sampler is None:
        sampler = T3Sampler(seed_token=t3.info.start_speech_token)

    hiddens = [prefill_prompt(backbones[s], list(prompt[s]),
                              bucket=prefill_bucket) for s in range(n_seq)]

    if on_device is not None:
        jax_ok = all(hasattr(b, "params") and hasattr(b, "kv")
                     and hasattr(b, "cfg")
                     and getattr(b, "_pp", None) is None
                     for b in backbones[:n_seq])
        if jax_ok:
            return _run_chatterbox_chunked(
                audio_lm, t3, backbones[:n_seq], hiddens, on_device,
                max_frames=max_frames, cfg_weight=cfg_weight,
                decode=decode)

    def speech_logits(h):
        st = audio_lm.state
        st.step_begin(np.asarray(h, np.float32))
        logits, _ = st.step_logits()
        st.step_push_code(0)
        st.step_finish()
        return logits

    audio_lm.reset()
    codes: List[int] = []
    stopped = False
    steps = 0
    for step in range(max_frames):
        cond = speech_logits(hiddens[0])
        logits = cond
        if n_seq == 2:
            uncond = speech_logits(hiddens[1])
            logits = cond + cfg_weight * (cond - uncond)
        code = sampler(np.asarray(logits))
        steps += 1
        if code == t3.info.stop_speech_token:
            stopped = True
            break
        if code < t3.info.start_speech_token:
            codes.append(code)
        nb = t3.compose_speech_embd(code, step + 1)
        hiddens = [backbones[s].step(nb) for s in range(n_seq)]

    codes_arr = np.asarray(codes, np.int32).reshape(-1, 1)
    pcm = None
    if decode and audio_lm.codec is not None and len(codes_arr):
        pcm = _decode_transformed(audio_lm, codes_arr)
    return SynthesisResult(codes=codes_arr, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


def _run_chatterbox_chunked(audio_lm, t3, backbones, hiddens,
                            on_device: OnDeviceSampling, *,
                            max_frames: int, cfg_weight: float,
                            decode: bool) -> SynthesisResult:
    """Chunked device loop for run_chatterbox (contract there): the CFG
    lanes' KV caches ride stacked [S, ...] between chunk calls; the
    sampler's unbounded repetition history is a device-resident [V] seen
    mask seeded with the BOS speech token (T3Sampler's seed_token)."""
    import jax
    import jax.numpy as jnp

    from .fused_gen import build_chatterbox_chunk

    info = t3.info
    n_seq = len(backbones)
    k_frames = max(2, int(on_device.chunk_frames))
    chain = (float(on_device.temperature), int(on_device.top_k),
             float(on_device.top_p), float(on_device.min_p))
    cache = getattr(t3, "_cbx_chunk_cache", None)
    if cache is None:
        cache = t3._cbx_chunk_cache = {}
    key_ = (chain, float(on_device.repetition_penalty), k_frames, n_seq,
            float(cfg_weight), repr(backbones[0].cfg))
    chunk = cache.get(key_)
    if chunk is None:
        chunk = build_chatterbox_chunk(
            backbones[0].cfg, chain, float(on_device.repetition_penalty),
            k_frames, n_seq=n_seq, cfg_weight=cfg_weight,
            stop_token=info.stop_speech_token,
            n_pos=int(t3.speech_pos_emb.shape[0]))
        cache[key_] = chunk

    head = audio_lm.lm.heads[0]
    vocab = int(head.shape[0])
    kv = jnp.stack([b.kv for b in backbones])
    h = jnp.asarray(np.stack([np.asarray(x, np.float32) for x in hiddens]))
    pos = int(backbones[0].pos)
    key = jax.random.PRNGKey(on_device.seed)
    seen = jnp.zeros((vocab,), bool).at[info.start_speech_token].set(True)

    audio_lm.reset()
    codes: List[int] = []
    stopped = False
    steps = 0
    while not stopped and steps < max_frames:
        packed, h, kv, key, seen = chunk(
            backbones[0].params, head, jnp.asarray(t3.speech_emb),
            jnp.asarray(t3.speech_pos_emb), kv, np.int32(pos),
            np.int32(steps), h, key, seen)
        arr = np.asarray(packed)
        n_emit = int(arr[k_frames])
        pos = int(arr[k_frames + 2])
        if n_emit == 0:
            break
        for i in range(min(n_emit, max_frames - steps)):
            code = int(arr[i])
            steps += 1
            if code == info.stop_speech_token:
                stopped = True
                break
            if code < info.start_speech_token:
                codes.append(code)

    codes_arr = np.asarray(codes, np.int32).reshape(-1, 1)
    pcm = None
    if decode and audio_lm.codec is not None and len(codes_arr):
        pcm = _decode_transformed(audio_lm, codes_arr)
    return SynthesisResult(codes=codes_arr, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


def run_chatterbox_batch(
    audio_lms: Sequence[AudioLM],
    t3,
    backbone,
    texts: Sequence[str],
    on_device: OnDeviceSampling,
    max_frames: int = 512,
    cfg_weight: float = 0.5,
    decode: bool = True,
    sampling: Optional[Sequence[OnDeviceSampling]] = None,
    prefill_bucket: int = 0,
    mesh=None,
    dp_axis: str = "dp",
) -> List[SynthesisResult]:
    """B concurrent Chatterbox T3 generations, each with its CFG lanes,
    through ONE vmapped device loop (lm/fused_gen.
    build_chatterbox_chunk_batched) on shared weights — the
    /synthesize_batch shape for the chatterbox family. Per-stream codes
    are bit-identical to the single-stream chunked run
    (`run_chatterbox(on_device=...)`) with seed `on_device.seed + i`.
    `sampling` optionally carries one chain per stream (traced [B, 4]
    input; the repetition PENALTY stays the engine-wide T3 preset).

    `mesh`: shard the B streams' carried state (lane KV stacks, hiddens,
    PRNG keys, seen masks) over `mesh[dp_axis]` — data-parallel
    multi-stream chatterbox serving, exactly like
    run_codebook_ar_batch(mesh=...). Requires B divisible by the mesh.

    Reference contrast: the reference runs one chatterbox synthesis at a
    time (run_chatterbox, tts_runner.cpp:876, host loop per frame per
    CFG lane)."""
    import jax
    import jax.numpy as jnp

    from .fused_gen import build_chatterbox_chunk_batched

    b = len(audio_lms)
    if b == 0 or b != len(texts):
        raise ValueError("need one text per stream")
    if sampling is not None and len(sampling) != b:
        raise ValueError("sampling needs one OnDeviceSampling per stream")
    if mesh is not None and b % int(mesh.shape[dp_axis]):
        raise ValueError(f"batched chatterbox DP: {b} streams not "
                         f"divisible by mesh size "
                         f"{int(mesh.shape[dp_axis])}")
    if not (hasattr(backbone, "params") and hasattr(backbone, "kv")
            and hasattr(backbone, "cfg")
            and getattr(backbone, "_pp", None) is None):
        raise ValueError("batched chatterbox needs a JAX backbone "
                         "(pipeline-staged backbones run per-stream)")
    info = t3.info
    k_frames = max(2, int(on_device.chunk_frames))
    n_seq = 2 if cfg_weight > 0.0 else 1
    # compile hygiene (docs/SERVING.md): cache the jitted chunk on t3 —
    # a fresh jax.jit per request would retrace the whole B-stream
    # while_loop graph every /synthesize_batch call. B itself is a
    # traced input shape, so one cached fn serves any request size.
    cache = getattr(t3, "_cbx_batch_chunk_cache", None)
    if cache is None:
        cache = t3._cbx_batch_chunk_cache = {}
    key_ = (k_frames, n_seq, float(cfg_weight),
            float(on_device.repetition_penalty),
            int(t3.speech_pos_emb.shape[0]), repr(backbone.cfg))
    chunk = cache.get(key_)
    if chunk is None:
        chunk = cache[key_] = build_chatterbox_chunk_batched(
            backbone.cfg, k_frames, n_seq=n_seq, cfg_weight=cfg_weight,
            stop_token=info.stop_speech_token,
            n_pos=int(t3.speech_pos_emb.shape[0]),
            rep_pen=float(on_device.repetition_penalty))

    # per-stream, per-lane prompt prefill into stacked KV slices
    kvs, hs, poss = [], [], []
    for text in texts:
        prompt = t3.build_prompt(t3.tokenize(text), cfg_weight=cfg_weight)
        lane_kv, lane_h = [], []
        for s in range(n_seq):
            backbone.reset()
            lane_h.append(np.asarray(
                prefill_prompt(backbone, list(prompt[s]),
                               bucket=prefill_bucket), np.float32))
            lane_kv.append(backbone.kv)
        kvs.append(jnp.stack(lane_kv))
        hs.append(np.stack(lane_h))
        poss.append(backbone.pos)
    kv = jnp.stack(kvs)                            # [B, S, L, 2, ...]
    h = jnp.asarray(np.stack(hs))                  # [B, S, hidden]
    pos = np.asarray(poss, np.int32)
    step = np.zeros(b, np.int32)
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(on_device.seed, on_device.seed + b, dtype=jnp.uint32))
    head = jnp.asarray(audio_lms[0].lm.heads[0])
    vocab = int(head.shape[0])
    seen = jnp.zeros((b, vocab), bool).at[
        :, info.start_speech_token].set(True)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _dp(x):
            return jax.device_put(
                x, NamedSharding(mesh, P(dp_axis, *([None] * (x.ndim - 1)))))
        kv, h, keys, seen = _dp(kv), _dp(h), _dp(keys), _dp(seen)
    chains = jnp.asarray(np.stack(
        [(sampling[i] if sampling is not None else on_device).chain_vec()
         for i in range(b)]))
    semb = jnp.asarray(t3.speech_emb)
    pemb = jnp.asarray(t3.speech_pos_emb)
    for alm in audio_lms:
        alm.reset()

    codes: List[List[int]] = [[] for _ in range(b)]
    stopped = [False] * b
    steps = [0] * b
    while any(not stopped[s] and steps[s] < max_frames for s in range(b)):
        done0 = np.asarray([stopped[s] or steps[s] >= max_frames
                            for s in range(b)])
        packed, h, kv, keys, seen = chunk(
            backbone.params, head, semb, pemb, kv, jnp.asarray(pos),
            jnp.asarray(step), h, keys, seen, done0, chains)
        arr = np.asarray(packed)
        n_emit = int(arr[k_frames * b])
        pos = arr[k_frames * b + 1 + b: k_frames * b + 1 + 2 * b] \
            .astype(np.int32)
        step = arr[-b:].astype(np.int32)
        if n_emit == 0:
            break
        rows = arr[: k_frames * b].reshape(k_frames, b)
        for i in range(n_emit):
            for s in range(b):
                if stopped[s] or steps[s] >= max_frames:
                    continue
                code = int(rows[i, s])
                steps[s] += 1
                if code == info.stop_speech_token:
                    stopped[s] = True
                elif code < info.start_speech_token:
                    codes[s].append(code)

    results: List[SynthesisResult] = []
    for s in range(b):
        arr_s = np.asarray(codes[s], np.int32).reshape(-1, 1)
        pcm = None
        if decode and audio_lms[s].codec is not None and len(arr_s):
            pcm = _decode_transformed(audio_lms[s], arr_s)
        results.append(SynthesisResult(codes=arr_s, pcm=pcm,
                                       n_steps=steps[s],
                                       stopped_by_eos=stopped[s]))
    return results


def run_codebook_ar_batch(
    audio_lms: Sequence[AudioLM],
    backbone,
    prompt_embeds_list: Sequence[Sequence[np.ndarray]],
    on_device: OnDeviceSampling,
    max_steps: int = 1024,
    decode: bool = True,
    n_q: int = 0,
    pi=None,
    mesh=None,
    dp_axis: str = "dp",
    prefill_bucket: int = 0,
    sampling: Optional[Sequence[OnDeviceSampling]] = None,
) -> List[SynthesisResult]:
    """B concurrent Type C/D generations on SHARED weights with the whole
    frame loop batched on device (lm/fused_gen.build_gen_chunk_batched):
    one vmapped chunk steps every stream's fused frame + feedback compose
    + backbone forward together — batched GEMMs through one weight set,
    the multi-stream TTS serving shape. Each stream owns its AudioLM
    context (create them with a shared CodecLM: `AudioLM(reader, codec,
    lm=shared)`), KV cache, PRNG stream (seed + stream index — matching
    the single-stream chunked run with that seed), and EOS state; streams
    that stop early ride along inert until the chunk drains.

    Requires a JAX backbone and a chunk-capable kind (raises otherwise —
    this is an explicit batched API, not a fast path with fallback).
    Grammar constraints are unsupported; the cb0 RangeConstraint applies
    in-graph via `pi` as in run_codebook_ar.

    `mesh`: shard the B streams' carried state (KV caches, hiddens, PRNG
    keys) over `mesh[dp_axis]` — data-parallel serving. On a 2-D mesh
    this composes with a TP-sharded backbone (`bb.set_mesh(mesh2d,
    axis="tp")` + `mesh=mesh2d`): streams split over `dp`, every GEMM
    splits over `tp` — the scale-out multi-stream TTS configuration.
    Requires B divisible by the dp mesh size.

    `sampling`: one OnDeviceSampling per stream — per-stream sampler
    chains ride as a traced [B, 4] chunk input (one executable for any
    mix, `ops.sample.sample_logits_dyn`); `on_device` then contributes
    only seed/chunk_frames. None (default) bakes `on_device`'s chain
    statically for every stream.

    Reference contrast: the reference serializes generations — one
    codec_lm_state per stream but a host loop per frame each
    (lm_internal.h:63-68, tts_runner.cpp:707)."""
    import jax
    import jax.numpy as jnp

    from .fused_gen import gen_chunk_cached, supports_gen_chunk

    b = len(audio_lms)
    if b == 0 or b != len(prompt_embeds_list):
        raise ValueError("need one prompt per stream")
    if sampling is not None and len(sampling) != b:
        raise ValueError("sampling needs one OnDeviceSampling per stream")
    lm = audio_lms[0].lm
    if lm is None:
        raise ValueError("model has no codec_lm adaptor")
    for alm in audio_lms[1:]:
        if alm.lm is not lm:
            raise ValueError("streams must share one CodecLM "
                             "(AudioLM(reader, codec, lm=shared))")
    if not supports_gen_chunk(lm, backbone):
        raise ValueError("batched generation needs a JAX backbone and a "
                         "chunk-capable LM kind (pipeline-staged backbones "
                         "generate per-stream via run_codebook_ar; TP/EP "
                         "sharding composes)")
    if mesh is not None and b % int(mesh.shape[dp_axis]):
        raise ValueError(f"batched generation DP: {b} streams not "
                         f"divisible by mesh size "
                         f"{int(mesh.shape[dp_axis])}")
    chunk_n = max(2, int(on_device.chunk_frames))

    cb0_range = None
    if pi is not None and pi.cb0_speech_range_start >= 0 \
            and pi.cb0_speech_range_end > pi.cb0_speech_range_start:
        cb0_range = (int(pi.cb0_speech_range_start),
                     int(pi.cb0_speech_range_end),
                     int(pi.eos_code_c0) if pi.eos_code_c0 is not None
                     else -1)
    chains = None
    if sampling is not None:
        chunk_fn = gen_chunk_cached(
            lm, backbone, n_frames=chunk_n, batched=True,
            cb0_range=cb0_range, traced_chain=True)
        chains = jnp.asarray(np.stack([s.chain_vec() for s in sampling]))
    else:
        chunk_fn = gen_chunk_cached(
            lm, backbone, n_frames=chunk_n, batched=True,
            cb0_range=cb0_range,
            temperature=on_device.temperature, top_k=on_device.top_k,
            top_p=on_device.top_p, min_p=on_device.min_p)

    # per-stream prompt prefill into per-stream KV slices
    kvs, hs, poss = [], [], []
    for embeds in prompt_embeds_list:
        backbone.reset()
        if not embeds:
            raise ValueError("every stream needs >= 1 prompt embedding")
        h = prefill_prompt(backbone, embeds, bucket=prefill_bucket)
        kvs.append(backbone.kv)
        hs.append(np.asarray(h, np.float32))
        poss.append(backbone.pos)
    kv = jnp.stack(kvs)
    hd = jnp.asarray(np.stack(hs))
    pos = np.asarray(poss, np.int32)
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(on_device.seed, on_device.seed + b, dtype=jnp.uint32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _dp(x):
            return jax.device_put(
                x, NamedSharding(mesh, P(dp_axis, *([None] * (x.ndim - 1)))))
        kv, hd, keys = _dp(kv), _dp(hd), _dp(keys)
    for alm in audio_lms:
        alm.reset()
    states = [alm.state for alm in audio_lms]
    tc = np.asarray([st.text_context if st.text_context is not None else 0
                     for st in states], np.int32)

    n_cb = lm.info.n_codebook
    stopped = [False] * b
    steps = [0] * b
    base = states[0].frame_counter
    while any(not stopped[s] and steps[s] < max_steps for s in range(b)):
        # done0 = the streams that already stopped (or hit max_steps):
        # frozen in-graph so their KV/pos stay at the frame they stopped
        # at — the delay-tail flush below reads that state
        done0 = jnp.asarray([stopped[s] or steps[s] >= max_steps
                             for s in range(b)])
        if chains is not None:
            packed, hd, kv, keys = chunk_fn(
                backbone.params, kv, jnp.asarray(pos), np.int32(base), hd,
                keys, jnp.asarray(tc), done0, chains)
        else:
            packed, hd, kv, keys = chunk_fn(
                backbone.params, kv, jnp.asarray(pos), np.int32(base), hd,
                keys, jnp.asarray(tc), done0)
        arr = np.asarray(packed)
        n_emit = int(arr[chunk_n * b * n_cb])
        pos = arr[-b:].astype(np.int32)
        if n_emit == 0:
            break
        rows = arr[: chunk_n * b * n_cb].reshape(chunk_n, b, n_cb)
        for i in range(n_emit):
            for s in range(b):
                if stopped[s] or steps[s] >= max_steps:
                    continue
                codes = states[s].push_frame(rows[i, s])
                steps[s] += 1          # the EOS frame counts, like the
                if audio_lms[s].observe_codes(     # single-stream loop's
                        codes,                     # n_steps; compose=False:
                        compose=False) is ObserveAction.STOP:  # in-graph
                    stopped[s] = True              # feedback
        base += n_emit

    # per-stream delay-tail flush (contract: include/codec_lm.h:387-401)
    # through the host step machine off each stream's KV slice
    results: List[SynthesisResult] = []
    for s in range(b):
        results.append(finalize_batch_stream(
            audio_lms[s], backbone,
            (lambda s=s: slice_slot(kv, s)), int(pos[s]),
            (lambda s=s: slice_slot(keys, s)),
            sampling[s] if sampling is not None else on_device,
            stopped=stopped[s], steps=steps[s],
            decode=decode, n_q=n_q))
    return results


_SLOT_SLICE_CACHE: dict = {}


def slice_slot(arr, s: int):
    """`arr[s]` through ONE compiled dynamic-slice per (shape, dtype):
    eager integer indexing bakes the index into the executable, so a
    B-slot finalize loop would compile B distinct slices — each paying
    the remote-compile relay's per-compile seconds."""
    import jax
    import jax.numpy as jnp

    fn = _SLOT_SLICE_CACHE.get("fn")
    if fn is None:
        fn = _SLOT_SLICE_CACHE["fn"] = jax.jit(
            lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                      keepdims=False))
    return fn(arr, jnp.int32(s))


def prefill_prompt(backbone, prompt_embeds: Sequence[np.ndarray],
                   bucket: int = 0) -> np.ndarray:
    """Prompt prefill → last backbone hidden.

    `bucket > 0` runs ONE whole-prompt forward padded to a bucket
    multiple (LlamaBackbone.prefill) — ceil(T/bucket) compiled graphs
    total and one device dispatch instead of T (the dispatch floor
    dominates admission cost on relay-attached TPUs, docs/PERF.md).
    `bucket == 0` (default) keeps the per-token Backbone-protocol loop:
    exact today's semantics, and the only option for opaque host LLMs.

    The batched forward is mathematically identical to the step loop but
    NOT bit-identical (different contraction shapes reassociate floats),
    so equivalence contracts must compare like with like — the tests pass
    the same `bucket` to both sides."""
    if not prompt_embeds:
        raise ValueError("prompt_embeds must contain at least one embedding")
    if bucket > 0 and len(prompt_embeds) > 1 and hasattr(backbone, "prefill"):
        return backbone.prefill(
            np.stack([np.asarray(e, np.float32) for e in prompt_embeds]),
            bucket=int(bucket))
    h = None
    for e in prompt_embeds:
        h = backbone.step(np.asarray(e, np.float32))
    return h


def finalize_batch_stream(alm: AudioLM, backbone, kv_s, pos_s: int, key_s,
                          on_device: OnDeviceSampling, *, stopped: bool,
                          steps: int, decode: bool = True,
                          n_q: int = 0) -> SynthesisResult:
    """Finish ONE stream of a batched generation: run the post-EOS
    `max(delay_pattern)` flush through the host step machine off the
    stream's KV slice (contract: include/codec_lm.h:387-401), then decode
    the transformed code matrix. Shared by run_codebook_ar_batch and the
    continuous batcher (serve/cont_batch.py), which retires streams at
    chunk boundaries while the rest of the batch keeps generating.

    `kv_s` / `key_s` may be zero-arg callables: they are only evaluated
    when the delay flush actually runs, so non-delay models pay no
    device work here at all."""
    import jax
    import jax.numpy as jnp

    lm = alm.lm
    st = alm.state
    tr = alm.decode_transform
    max_delay = tr.max_delay(alm.n_codebook)
    eos_c0 = lm.info.eos_code_c0
    n_speech = None
    if stopped and max_delay > 0 and eos_c0 >= 0:
        backbone.kv = kv_s() if callable(kv_s) else kv_s
        backbone.pos = int(pos_s)
        key_s = key_s() if callable(key_s) else key_s
        flush_key = jax.random.fold_in(key_s, 0x0F1D)
        from ..ops.sample import sample_logits as _sl

        n_speech = len(alm.frames) - 1
        last_codes = list(alm.frames[-1])
        for _ in range(max_delay):
            emb = lm.compose_next_embd(last_codes, alm._embed_step)
            alm._embed_step += 1
            h = backbone.step(emb)
            st.step_begin(np.asarray(h, np.float32))
            for _k in range(alm.n_codebook):
                logits, cb_idx = st.step_logits()
                if cb_idx == 0:
                    code = eos_c0
                else:
                    flush_key, sub = jax.random.split(flush_key)
                    code = int(np.asarray(_sl(
                        jnp.asarray(np.asarray(logits, np.float32)), sub,
                        temperature=on_device.temperature,
                        top_k=on_device.top_k, top_p=on_device.top_p,
                        min_p=on_device.min_p)))
                st.step_push_code(code)
            last_codes = list(st.step_finish())
            alm.frames.append(last_codes)
            steps += 1

    codes = alm.codes_matrix()
    if stopped and eos_c0 >= 0 and max_delay == 0 and len(codes):
        codes = codes[:-1]
    pcm = None
    if decode and alm.codec is not None and len(codes):
        pcm = _decode_transformed(alm, codes, n_q=n_q,
                                  n_speech_frames=n_speech)
    return SynthesisResult(codes=codes, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


class RangeConstraint:
    """GBNF-grammar analog (reference: tts_runner.h:64-73 constrains the
    backbone sampler so generated tokens stay inside the audio-token
    vocabulary). Masks every logit outside [start, end) plus `extra` ids
    (EOS) to -inf before delegating to the wrapped sampler."""

    def __init__(self, sampler: Callable[[np.ndarray], int], start: int,
                 end: int, extra: Sequence[int] = ()):
        self.sampler = sampler
        self.start, self.end = int(start), int(end)
        self.extra = [int(e) for e in extra if e is not None and e >= 0]

    def __call__(self, logits: np.ndarray) -> int:
        masked = np.full_like(logits, -np.inf)
        masked[self.start: self.end] = logits[self.start: self.end]
        for e in self.extra:
            if e < len(logits):
                masked[e] = logits[e]
        return self.sampler(masked)


def run_codebook_ar(
    audio_lm: AudioLM,
    backbone: Backbone,
    prompt_embeds: Sequence[np.ndarray],
    max_steps: int = 1024,
    sampler: Callable[[int, np.ndarray], int] = greedy_sampler,
    decode: bool = True,
    n_q: int = 0,
    pi=None,
    on_device: "OnDeviceSampling | None" = None,
    grammar: str = "",
    token_pieces: Optional[Sequence[str]] = None,
    prefill_bucket: int = 0,
) -> SynthesisResult:
    """Type C/D AR loop (reference: run_codebook_ar, tts_runner.cpp:707).

    `prefill_bucket > 0`: whole-prompt bucketed prefill instead of the
    per-token loop (see `prefill_prompt`).

    Per frame: backbone step → codec_lm step machine (begin → logits/sample/
    push × n_cb → finish) → EOS check → compose next backbone input.

    `pi` (PromptInfo): when its cb0 speech range is set (MOSS-TTSD — the
    c0 head is the tied backbone lm_head over the full text vocab), cb0
    sampling is range-constrained — the token-id-level equivalent of the
    reference's auto-grammar (tts_auto_grammar admits exactly the same
    "<CODE>"/sentinel set; common/audio_lm.cpp:1164).

    `grammar` + `token_pieces`: a user-supplied GBNF constraint on the cb0
    backbone sampler (reference: tts_runner.h:64-73 — never applied to
    audio-codebook heads). `token_pieces[i]` is token i's detokenized text;
    grammar state advances as sampled cb0 tokens are pushed. Takes
    precedence over the range constraint.

    `on_device` (ops.sample.OnDeviceSampling): TPU fast path — the whole
    frame (all codebooks + sampling) runs as one compiled graph via the
    kind's `fused_frame`, one device round-trip per frame instead of
    2·n_codebook. Ignored (host path) when the kind lacks fused_frame or a
    cb0 range constraint is active; `sampler` is unused on this path."""
    if audio_lm.lm is None:
        raise ValueError("model has no codec_lm adaptor")
    if grammar and token_pieces is None:
        raise ValueError(
            "grammar requires token_pieces (the per-token detokenized "
            "strings); without them the constraint would be silently "
            "dropped")
    if grammar and token_pieces is not None:
        from .gbnf import GrammarSampler

        base = sampler
        eog = (pi.eos_code_c0,) if pi is not None and pi.eos_code_c0 >= 0 \
            else ()
        gs = GrammarSampler(grammar, token_pieces,
                            lambda lg, _b=base: _b(0, lg), eog_tokens=eog)

        def sampler(cb, lg, _gs=gs, _b=base):
            if cb != 0:
                return _b(cb, lg)
            tok = _gs(lg)
            _gs.accept(tok)                  # cb0 picks are always pushed
            return tok
    elif pi is not None and pi.cb0_speech_range_start >= 0 \
            and pi.cb0_speech_range_end > pi.cb0_speech_range_start:
        base = sampler
        rc = RangeConstraint(lambda lg: base(0, lg),
                             pi.cb0_speech_range_start,
                             pi.cb0_speech_range_end,
                             extra=(pi.eos_code_c0,))
        sampler = lambda cb, lg, _rc=rc, _b=base: \
            _rc(lg) if cb == 0 else _b(cb, lg)
    audio_lm.reset()
    st = audio_lm.state

    fused = None
    fused_key = None
    cb0_range = None
    if pi is not None and pi.cb0_speech_range_start >= 0 \
            and pi.cb0_speech_range_end > pi.cb0_speech_range_start:
        # the RangeConstraint set is a static mask — expressible in-graph
        # (ops/sample.mask_outside_range), so it does NOT force the host
        # path the way a grammar (pushdown matcher) does
        cb0_range = (int(pi.cb0_speech_range_start),
                     int(pi.cb0_speech_range_end),
                     int(pi.eos_code_c0) if pi.eos_code_c0 is not None
                     else -1)
    if on_device is not None and not grammar \
            and hasattr(audio_lm.lm, "fused_frame"):
        import jax

        fused = audio_lm.lm.fused_frame(
            temperature=on_device.temperature, top_k=on_device.top_k,
            top_p=on_device.top_p, min_p=on_device.min_p,
            cb0_range=cb0_range)
        fused_key = jax.random.PRNGKey(on_device.seed)

    h = prefill_prompt(backbone, prompt_embeds, bucket=prefill_bucket)

    stopped = False
    steps = 0

    chunk_n = int(getattr(on_device, "chunk_frames", 1) or 1) \
        if on_device is not None else 1
    if fused is not None and chunk_n > 1:
        from .fused_gen import supports_gen_chunk

        if not supports_gen_chunk(audio_lm.lm, backbone):
            chunk_n = 1
    if fused is not None and chunk_n > 1:
        # Chunked on-device loop: K frames (LM frame + feedback compose +
        # backbone step) per device call, early-exit at EOS, one packed
        # fetch per chunk (lm/fused_gen.py). Code stream identical to the
        # per-frame fused path below.
        import jax.numpy as jnp

        from .fused_gen import gen_chunk_cached

        chunk_fn = gen_chunk_cached(
            audio_lm.lm, backbone, n_frames=chunk_n,
            temperature=on_device.temperature, top_k=on_device.top_k,
            top_p=on_device.top_p, min_p=on_device.min_p,
            cb0_range=cb0_range)
        n_cb = audio_lm.n_codebook
        kv = backbone.kv
        pos = backbone.pos
        hd = jnp.asarray(np.asarray(h, np.float32))
        tc = st.text_context if st.text_context is not None else 0
        while steps < max_steps and not stopped:
            packed, hd, kv, fused_key = chunk_fn(
                backbone.params, kv, np.int32(pos),
                np.int32(st.frame_counter), hd, fused_key, np.int32(tc))
            arr = np.asarray(packed)
            n_emit = int(arr[-3])
            pos = int(arr[-1])
            if n_emit == 0:                      # no progress: bail out
                break
            frames = arr[: chunk_n * n_cb].reshape(chunk_n, n_cb)[:n_emit]
            for row in frames:
                codes = st.push_frame(row)
                steps += 1
                # compose=False: the chunk composes feedback in-graph
                if audio_lm.observe_codes(
                        codes, compose=False) is ObserveAction.STOP:
                    stopped = True
                    break
                if steps >= max_steps:
                    break
        # hand the device-resident state back for the delay-flush path
        # (h itself is only ever reassigned below, no fetch needed)
        backbone.kv = kv
        backbone.pos = pos
        max_steps = 0                            # skip the per-frame loop

    for _ in range(max_steps):
        if fused is not None:
            fused_key, sub = jax.random.split(fused_key)
            tc = st.text_context if st.text_context is not None else 0
            codes = st.push_frame(
                np.asarray(fused(np.asarray(h, np.float32).reshape(-1),
                                 sub, np.int32(tc))))
        else:
            st.step_begin(h)
            for _k in range(audio_lm.n_codebook):
                logits, cb_idx = st.step_logits()
                st.step_push_code(sampler(cb_idx, logits))
            codes = st.step_finish()
        steps += 1
        action = audio_lm.observe_codes(codes, last_hidden=h)
        if action is ObserveAction.STOP:
            stopped = True
            break
        h = backbone.step(audio_lm.next_embed)

    # Delay-tail flush (contract: include/codec_lm.h:387-401): on a
    # delay-pattern model the cb0 EOS leaves up to max(delay) in-flight
    # frames in the later codebooks. Step that many more frames with cb0
    # forced to the EOS sentinel (the auto-grammar's trailing `end+`
    # window, common/audio_lm.cpp:1180-1184) so the trailing audio codes
    # land; decode_audio's unshift then reads them and the EOS rows never
    # reach the output (HF shifting_outputs semantics).
    tr = audio_lm.decode_transform
    max_delay = tr.max_delay(audio_lm.n_codebook)
    n_speech = None
    eos_c0 = audio_lm.lm.info.eos_code_c0
    if stopped and max_delay > 0 and eos_c0 >= 0:
        flush_sampler = sampler
        if fused is not None and on_device is not None:
            # The fused path never used the host `sampler` (default
            # greedy); the flush frames' acoustic codes DO reach the
            # decoded tail after the delay unshift, so keep the main
            # loop's sampling policy: same chain, continuing the device
            # RNG key.
            import jax
            import jax.numpy as jnp

            from ..ops.sample import sample_logits

            key_box = [fused_key]

            def flush_sampler(cb, lg):
                key_box[0], sub = jax.random.split(key_box[0])
                return int(np.asarray(sample_logits(
                    jnp.asarray(np.asarray(lg, np.float32)), sub,
                    temperature=on_device.temperature,
                    top_k=on_device.top_k, top_p=on_device.top_p,
                    min_p=on_device.min_p)))
        n_speech = len(audio_lm.frames) - 1     # rows before the EOS frame
        last_codes = list(audio_lm.frames[-1])
        for _ in range(max_delay):
            emb = audio_lm.lm.compose_next_embd(last_codes,
                                                audio_lm._embed_step)
            audio_lm._embed_step += 1
            h = backbone.step(emb)
            st.step_begin(np.asarray(h, np.float32))
            for _k in range(audio_lm.n_codebook):
                logits, cb_idx = st.step_logits()
                code = eos_c0 if cb_idx == 0 else flush_sampler(cb_idx,
                                                                logits)
                st.step_push_code(code)
            last_codes = list(st.step_finish())
            audio_lm.frames.append(last_codes)
            steps += 1

    codes = audio_lm.codes_matrix()
    if stopped and eos_c0 >= 0 and max_delay == 0:
        codes = codes[:-1]                      # drop the EOS frame
    pcm = None
    if decode and audio_lm.codec is not None and len(codes):
        pcm = _decode_transformed(audio_lm, codes, n_q=n_q,
                                  n_speech_frames=n_speech)
    return SynthesisResult(codes=codes, pcm=pcm, n_steps=steps, stopped_by_eos=stopped)

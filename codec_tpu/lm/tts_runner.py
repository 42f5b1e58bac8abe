"""tts_runner — reference host loop driving a backbone + codec_lm + codec.

Reference behavior: common/tts_runner.cpp. The backbone is NEVER linked in
(the reference isolates llama.cpp behind libttsbackbone; here the backbone
is any object satisfying the `Backbone` protocol below — a JAX LLM, an HF
model, or a test stub). The data boundary is identical: the runner feeds
input embeddings, receives a hidden state per step, samples with a
caller-supplied sampler, and drives the codec_lm step machine.

Flows implemented (reference dispatch: tts_runner_synthesize,
tts_runner.cpp:1043):
  - run_codebook_ar  (CSM / Qwen3-TTS / MOSS-TTSD — Type C/D)
More flows (continuous, realtime-streaming, chatterbox CFG) arrive with
their codec_lm kinds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Protocol, Sequence

import numpy as np

from .audio_lm import AudioLM, ObserveAction


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
) -> SynthesisResult:
    """Continuous-latent flow (reference: run_continuous, tts_runner.cpp:450):
    optional RALM text-prefill over prompt hiddens, then per step: backbone
    hidden → step_generate (patch + stop + feedback embed)."""
    if audio_lm.lm is None or not audio_lm.is_continuous:
        raise ValueError("run_continuous requires a continuous-latent codec_lm")
    audio_lm.reset()
    if prefill_hiddens is not None:
        audio_lm.text_prefill(np.asarray(prefill_hiddens, np.float32))

    h = None
    for e in prompt_embeds:
        h = backbone.step(np.asarray(e, np.float32))
    if h is None:
        raise ValueError("prompt_embeds must contain at least one embedding")

    stopped = False
    steps = 0
    for _ in range(max_steps):
        action = audio_lm.observe_hidden(h)
        steps += 1
        if action is ObserveAction.STOP:
            stopped = True
            break
        h = backbone.step(audio_lm.next_embed)

    latents = (np.concatenate(audio_lm.latents, axis=0)
               if audio_lm.latents else np.zeros((0, audio_lm.lm.info.latent_dim)))
    pcm = None
    if decode and audio_lm.codec is not None and len(latents):
        pcm = audio_lm.codec.decode_latent(latents)
    return SynthesisResult(codes=latents, pcm=pcm, n_steps=steps,
                           stopped_by_eos=stopped)


def run_codebook_ar(
    audio_lm: AudioLM,
    backbone: Backbone,
    prompt_embeds: Sequence[np.ndarray],
    max_steps: int = 1024,
    sampler: Callable[[int, np.ndarray], int] = greedy_sampler,
    decode: bool = True,
    n_q: int = 0,
) -> SynthesisResult:
    """Type C/D AR loop (reference: run_codebook_ar, tts_runner.cpp:707).

    Per frame: backbone step → codec_lm step machine (begin → logits/sample/
    push × n_cb → finish) → EOS check → compose next backbone input."""
    if audio_lm.lm is None:
        raise ValueError("model has no codec_lm adaptor")
    audio_lm.reset()
    st = audio_lm.state

    h = None
    for e in prompt_embeds:
        h = backbone.step(np.asarray(e, np.float32))
    if h is None:
        raise ValueError("prompt_embeds must contain at least one embedding")

    stopped = False
    steps = 0
    for _ in range(max_steps):
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

    codes = audio_lm.codes_matrix()
    if stopped and audio_lm.lm.info.eos_code_c0 >= 0:
        codes = codes[:-1]                      # drop the EOS frame
    pcm = None
    if decode and audio_lm.codec is not None and len(codes):
        pcm = audio_lm.codec.decode(codes, n_q=n_q)
    return SynthesisResult(codes=codes, pcm=pcm, n_steps=steps, stopped_by_eos=stopped)

"""audio_lm — generic audio-LM host hooks (build/observe/decode layer).

Reference behavior: common/audio_lm.cpp + common/codec_common.h. The host
owns the backbone decode loop and sampling; this layer provides:
  - modality bits from `codec.lm.modality.*`
  - Type A audio-token-range detection (`codec.audio_token.{offset,count,eos_id}`)
  - Type B embed-override compose (speech pos-emb via compose_next_embd)
  - Type C/D frame observe (codes accumulation + next-embed compose)
  - continuous-latent observe (CFM kinds; patch accumulation + stop)
  - end-of-sequence decode_audio through the codec
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, List, Optional, Sequence

import numpy as np

from ..io.gguf import GGUFReader
from .base import CodecLM, LmError, create_lm
from .decode_transform import (DecodeTransform, build_decode_transform,
                               transform_lm_codes)

MODALITY_TEXT_IN = 1
MODALITY_AUDIO_OUT = 2
MODALITY_AUDIO_IN = 4
MODALITY_TEXT_OUT = 8


class ObserveAction(Enum):
    PASSTHROUGH = 0        # ordinary text token; host continues as usual
    CONSUMED = 1           # audio code consumed; host keeps token decode path
    CONSUMED_EMBED = 2     # feed next_embed as inputs_embeds next step
    STOP = 3               # end of audio; host breaks and calls decode_audio


@dataclass
class AudioTokenRange:
    offset: int = -1
    count: int = 0
    eos_id: int = -1


class AudioLM:
    """Per-generation audio-LM context (reference: audio_lm_context)."""

    def __init__(self, reader: GGUFReader, codec=None, lm=None):
        """`lm`: share an existing CodecLM across contexts (reference:
        multiple codec_lm_states on one codec_lm, lm_internal.h:63-68) —
        batched serving creates one AudioLM per stream without reloading
        weights. Default loads from the reader."""
        self.reader = reader
        self.codec = codec              # CodecModel for decode_audio (optional)
        self.lm: Optional[CodecLM] = lm if lm is not None else create_lm(reader)
        self.modality = 0
        for bit, key in ((MODALITY_TEXT_IN, "codec.lm.modality.text_in"),
                         (MODALITY_AUDIO_OUT, "codec.lm.modality.audio_out"),
                         (MODALITY_AUDIO_IN, "codec.lm.modality.audio_in"),
                         (MODALITY_TEXT_OUT, "codec.lm.modality.text_out")):
            if reader.get_bool(key, False):
                self.modality |= bit
        self.token_range = AudioTokenRange(
            offset=reader.get_i32("codec.audio_token.offset", -1),
            count=reader.get_i32("codec.audio_token.count", 0),
            eos_id=reader.get_i32("codec.audio_token.eos_id", -1),
        )
        self.uses_embed_override = False
        self._embed_step_start = 0
        # codes→PCM decode transform (reference: init_decode_transform,
        # common/audio_lm.cpp:218-263) — see lm/decode_transform.py.
        self.decode_transform: DecodeTransform = build_decode_transform(
            reader, self.lm.info if self.lm is not None else None)
        self.reset()

    # -- lifecycle ---------------------------------------------------------
    def reset(self) -> None:
        self.frames: List[List[int]] = []        # accumulated [T][n_cb] codes
        self.latents: List[np.ndarray] = []      # continuous patches
        self.next_embed: Optional[np.ndarray] = None
        self._embed_step = self._embed_step_start
        self.state = self.lm.new_state() if self.lm is not None else None

    # -- capabilities ------------------------------------------------------
    @property
    def n_codebook(self) -> int:
        return self.lm.info.n_codebook if self.lm else 1

    @property
    def hidden_dim(self) -> int:
        return self.lm.info.hidden_dim if self.lm else 0

    @property
    def is_continuous(self) -> bool:
        return bool(self.lm and self.lm.info.is_continuous)

    def lm_eos(self):
        if self.lm is None:
            return -1, 0
        return self.lm.info.eos_code_c0, self.lm.info.eos_min_step

    # -- configuration -----------------------------------------------------
    def set_audio_token_range(self, offset: int, count: int, eos_id: int) -> None:
        self.token_range = AudioTokenRange(offset, count, eos_id)

    def set_uses_embed_override(self, enabled: bool, start_step: int = 0) -> None:
        self.uses_embed_override = enabled
        self._embed_step_start = start_step
        self._embed_step = start_step

    # -- per-step hooks ----------------------------------------------------
    def observe_token(self, tok: int, last_hidden=None) -> ObserveAction:
        """Type A/B dispatch (reference: audio_lm_observe_token)."""
        tr = self.token_range
        if tr.eos_id >= 0 and tok == tr.eos_id:
            return ObserveAction.STOP
        if tr.offset < 0 or not (tr.offset <= tok < tr.offset + tr.count):
            return ObserveAction.PASSTHROUGH
        code = tok - tr.offset
        self.frames.append([code])
        if self.uses_embed_override and self.lm is not None:
            self.next_embed = self.lm.compose_next_embd([code], self._embed_step)
            self._embed_step += 1
            return ObserveAction.CONSUMED_EMBED
        return ObserveAction.CONSUMED

    def observe_codes(self, codes: Sequence[int], last_hidden=None,
                      compose: bool = True) -> ObserveAction:
        """Type C/D frame observe (reference: audio_lm_observe_codes).

        `compose=False` skips the feedback-embedding compose (a device
        gather + fetch): drivers whose feedback path is already in-graph
        (the fused gen chunk / continuous batcher) must pass it — through
        a dispatch-serializing relay the per-frame compose here was the
        round-4 serving collapse (BENCH_r04: 823 ms/frame)."""
        codes = list(codes)
        self.frames.append(codes)
        if self.state is not None and self.state.step_is_eos(codes):
            return ObserveAction.STOP
        if self.lm is not None and compose:
            self.next_embed = self.lm.compose_next_embd(codes, self._embed_step)
            self._embed_step += 1
            return ObserveAction.CONSUMED_EMBED
        if self.lm is not None:
            self._embed_step += 1
            return ObserveAction.CONSUMED_EMBED
        return ObserveAction.CONSUMED

    def set_continuous_params(self, cfg_value: float = 2.0, n_timesteps: int = 10,
                              min_len: int = -1) -> None:
        """reference: audio_lm_set_continuous_params."""
        self._cfg_value = cfg_value
        self._n_timesteps = n_timesteps
        if min_len >= 0 and self.state is not None:
            self.lm.set_min_len(self.state, min_len)

    def text_prefill(self, hiddens: np.ndarray) -> None:
        """Prime the continuous kind's RALM over the prompt prefix
        (reference: audio_lm_text_prefill)."""
        if not self.is_continuous:
            raise ValueError("text_prefill requires a continuous-latent kind")
        self.lm.text_prefill(self.state, hiddens)

    def observe_hidden(self, hidden: np.ndarray, noise=None) -> ObserveAction:
        """Continuous-latent per-step observe (CFM kinds)."""
        if not self.is_continuous:
            raise ValueError("observe_hidden requires a continuous-latent kind")
        patch, stop, feedback = self.lm.step_generate(
            self.state, hidden,
            cfg_value=getattr(self, "_cfg_value", 2.0),
            n_timesteps=getattr(self, "_n_timesteps", 10),
            noise=noise)
        self.latents.append(np.asarray(patch).reshape(-1, self.lm.info.latent_dim))
        self.next_embed = feedback
        return ObserveAction.STOP if stop else ObserveAction.CONSUMED_EMBED

    # -- composed prompt rows (merged-cb0 models) ---------------------------
    @property
    def prompt_needs_composed(self) -> bool:
        """MOSS-TTSD-style merged-cb0 models: the host must feed composed
        prompt embeddings (reference: audio_lm_prompt_needs_composed_embd)."""
        return self.decode_transform.prompt_needs_composed

    def compose_prompt_embd(self, text_token: int) -> np.ndarray:
        """One composed prompt row: cb0 = raw merged-vocab text token,
        cb1..N-1 = speech_pad — the HF processor's prompt grid before the
        delay shift, summed over the per-codebook embedding tables
        (reference: audio_lm_compose_prompt_embd, audio_lm.cpp:1274-1305)."""
        if self.lm is None:
            raise LmError("compose_prompt_embd: no codec_lm adaptor")
        if self.n_codebook <= 0:
            raise LmError("compose_prompt_embd: n_codebook unknown")
        codes = [self.decode_transform.speech_pad_code] * self.n_codebook
        codes[0] = int(text_token)
        return self.lm.compose_audio_embd(codes)

    # -- end of sequence ---------------------------------------------------
    def codes_matrix(self) -> np.ndarray:
        if not self.frames:
            return np.zeros((0, self.n_codebook), np.int32)
        return np.asarray(self.frames, np.int32)

    def push_codes(self, codes: np.ndarray) -> None:
        """Append externally produced [T, n_cb] frames to the accumulator
        (reference: audio_lm_push_codes — offline / debug path)."""
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 1:
            codes = codes[:, None]
        if self.frames and len(self.frames[0]) != codes.shape[1]:
            raise LmError(f"push_codes: width {codes.shape[1]} mismatches "
                          f"accumulated n_cb {len(self.frames[0])}")
        self.frames.extend(codes.tolist())

    def decode_audio(self, n_q: int = 0,
                     n_speech_frames: Optional[int] = None) -> np.ndarray:
        """Decode accumulated codes (or latents) through the codec
        (reference: audio_lm_decode_audio, common/audio_lm.cpp:1455-1600).

        Codebook kinds first apply the LM-codes→codec-codes transform
        (delay-pattern unshift, text/control-cb0 drop, merged-cb0 speech
        remap, sentinel clamp — lm/decode_transform.py) and decode with
        n_q = n_cb - audio_cb_offset. `n_speech_frames` is the explicit
        output length for hosts that flushed the delay tail after cb0 EOS;
        None uses the reference formula T - max(delay). `n_q` overrides the
        decode depth (0 = the transform's width)."""
        if self.codec is None:
            raise ValueError("no codec attached for decode_audio")
        if self.is_continuous:
            latent = np.concatenate(self.latents, axis=0)
            return self.codec.decode_latent(latent)
        codes = self.codes_matrix()
        if not len(codes):
            raise LmError("decode_audio: no codes accumulated")
        codes = transform_lm_codes(
            codes, self.decode_transform,
            codebook_size=getattr(self.codec, "codebook_size", 0),
            n_frames_out=n_speech_frames)
        if not len(codes):
            raise LmError("decode_audio: no frames left after the decode "
                          "transform")
        return self.codec.decode(codes, n_q=n_q)

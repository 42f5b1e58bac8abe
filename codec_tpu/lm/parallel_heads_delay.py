"""parallel_heads_delay (Type D) — N parallel linear heads off one backbone
hidden; unfused per-cb audio-embed tables; optional tied heads; optional
Chatterbox learned speech positional embedding on compose_next_embd.

Reference: src/lm/parallel_heads_delay.cpp. All N logits are computed at
step_begin (one jitted fn); step_logits just hands out slices; push_code
records into the delay register sized max(delay_pattern)+1. Models:
MOSS-TTSD (heterogeneous cb sizes: c0=text vocab, rest audio).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops.sample import (mask_outside_range, sample_logits,
                          sample_logits_dyn)
from .base import CodecLM, LmError, LmInfo, LmState, read_common_info, register_kind


@register_kind("parallel_heads_delay")
class ParallelHeadsDelayLM(CodecLM):
    def _load(self, r: GGUFReader) -> LmInfo:
        info = read_common_info(r, "parallel_heads_delay")
        tied = r.get_bool("codec.lm.parallel.tied_heads_to_embd", False)
        self.audio_embds: List[jnp.ndarray] = []
        self.heads: List[jnp.ndarray] = []
        for i in range(info.n_codebook):
            embd = r.get(f"lm.audio_embd_{i}.weight")          # [vocab_i, hidden]
            self.audio_embds.append(jnp.asarray(embd))
            if tied:
                self.heads.append(self.audio_embds[-1])
            else:
                self.heads.append(jnp.asarray(r.get(f"lm.heads_{i}.weight")))
        # Chatterbox learned per-step positional embedding (optional)
        pe = r.get_or_none("lm.chatterbox.speech_pos_emb.weight")
        self.pos_emb = np.asarray(pe) if pe is not None else None

        if not info.codebook_sizes:
            info.codebook_sizes = tuple(int(h.shape[0]) for h in self.heads)

        from ..runtime.jit_weights import jit_weighted
        _attrs = ("heads", "audio_embds")
        self._logits_fn = jit_weighted(self, self._all_logits, _attrs)
        self._compose_fn = jit_weighted(self, self._compose, _attrs)
        self._fused_cache: Dict = {}
        return info

    def _all_logits(self, h: jax.Array) -> List[jax.Array]:
        return [head @ h for head in self.heads]

    def _compose(self, codes: jax.Array) -> jax.Array:
        """codes int32 [n_cb]; -1 entries contribute zero."""
        acc = jnp.zeros((self.info.hidden_dim,), jnp.float32)
        for i, embd in enumerate(self.audio_embds):
            row = embd[jnp.clip(codes[i], 0, embd.shape[0] - 1)]
            acc = acc + jnp.where(codes[i] >= 0, row, 0.0)
        return acc

    # -- step machine hooks ------------------------------------------------
    def _begin(self, state: LmState, h: np.ndarray) -> None:
        outs = self._logits_fn(jnp.asarray(h))
        state.kind_state["logits"] = [np.asarray(o) for o in outs]

    def _logits(self, state: LmState, k: int) -> np.ndarray:
        return state.kind_state["logits"][k]

    # -- fused on-device frame ----------------------------------------------
    def _build_frame(self, chain, rep=None, cb0_range=None):
        """Un-jitted frame for the fused/chunked paths: all N heads + one
        sample each. `cb0_range=(start, end, *extra)` applies the
        RangeConstraint mask to head 0 in-graph (MOSS-TTSD's merged text
        vocab — reference auto-grammar, common/audio_lm.cpp:1164).
        `chain=None` builds the traced-chain variant
        frame(h, key, text_ctx, chain_vec) — contract in
        residual_depth_ar._build_frame."""
        if rep is not None:
            raise LmError(
                "parallel_heads_delay has no repetition-penalty frame")

        if chain is None:
            def sample(lg, key, cv):
                return sample_logits_dyn(lg, key, cv)
        else:
            def sample(lg, key, cv):
                return sample_logits(lg, key, temperature=chain[0],
                                     top_k=chain[1], top_p=chain[2],
                                     min_p=chain[3])

        def frame_core(h, key, text_ctx, cv):
            keys = jax.random.split(key, len(self.heads))
            outs = []
            for i, head in enumerate(self.heads):
                lg = head @ h
                if i == 0 and cb0_range is not None:
                    lg = mask_outside_range(lg, cb0_range[0], cb0_range[1],
                                            cb0_range[2:])
                outs.append(sample(lg, keys[i], cv))
            return jnp.stack(outs)

        if chain is None:
            return frame_core
        return lambda h, key, text_ctx: frame_core(h, key, text_ctx, None)

    def compose_embd_fn(self):
        """Traceable feedback compose for the fused generation chunk
        (lm/fused_gen.py); sampled codes are >= 0 so _compose's pad guard
        stays inert. Chatterbox's per-step pos_emb is step-dependent —
        gen_chunk_ok gates those models back to the host loop."""
        return self._compose

    def gen_chunk_ok(self) -> bool:
        return self.pos_emb is None

    def fused_frame(self, *, temperature: float = 0.0, top_k: int = 0,
                    top_p: float = 1.0, min_p: float = 0.0, cb0_range=None):
        """All N heads + on-device sampling in one compiled graph (heads are
        independent given the hidden, so this is exact, not just a fast
        path). fn(h, key, text_ctx) → codes [n_codebook] int32; text_ctx is
        ignored (uniform fused-frame signature across kinds)."""
        chain = (float(temperature), int(top_k), float(top_p), float(min_p))
        key = (chain, cb0_range)
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        from ..runtime.jit_weights import jit_weighted
        fn = jit_weighted(self, self._build_frame(chain, cb0_range=cb0_range),
                          ("heads", "audio_embds"))
        self._fused_cache[key] = fn
        return fn

    # -- embeddings --------------------------------------------------------
    def audio_embd(self, cb_idx: int, code: int) -> np.ndarray:
        if not (0 <= cb_idx < self.info.n_codebook):
            raise LmError(f"cb_idx {cb_idx} out of range")
        embd = self.audio_embds[cb_idx]
        if not (0 <= code < embd.shape[0]):
            raise LmError(f"code {code} out of range (code=-1 is pad; use compose)")
        return np.asarray(embd[code])

    def compose_audio_embd(self, codes: Sequence[int]) -> np.ndarray:
        codes = np.asarray(list(codes), np.int32)
        if codes.shape[0] != self.info.n_codebook:
            raise LmError("codes length must equal n_codebook")
        return np.asarray(self._compose_fn(jnp.asarray(codes)))

    def compose_next_embd(self, codes: Sequence[int], step: int = 0) -> np.ndarray:
        out = self.compose_audio_embd(codes)
        if self.pos_emb is not None:
            out = out + self.pos_emb[min(step, self.pos_emb.shape[0] - 1)]
        return out

"""On-device token sampling for fused AR decode loops.

The reference samples on the host (llama.cpp sampler chain driven from
common/tts_runner.cpp:242-246, order: penalties -> temperature -> top_k ->
min_p -> top_p). For the TPU fast path the whole per-frame codebook loop
lives in one compiled graph, so sampling must be expressible in jax. This
module mirrors the host `SamplerChain` semantics (lm/tts_runner.py) with
static chain parameters: every (temperature, top_k, top_p, min_p) combo
compiles its own graph, which is fine — a synthesis run uses one setting.

All filters operate on raw logits by masking to -inf (equivalent to
llama.cpp's candidate-list truncation followed by softmax renormalisation:
softmax over the surviving set equals softmax of masked logits).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_NEG = -jnp.inf


def _apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits (ties at the threshold all survive, which
    only widens the candidate set the way llama.cpp's partial sort can)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, _NEG)


def _apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    """Drop tokens with prob < min_p * max_prob (llama.cpp llama_sampler_min_p).
    In logit space: keep logit >= max_logit + log(min_p)."""
    if min_p <= 0.0:
        return logits
    cutoff = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
    return jnp.where(logits >= cutoff, logits, _NEG)


def _apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter: keep the smallest prefix of descending-prob tokens
    whose cumulative probability reaches top_p (the token that crosses the
    boundary is kept, matching llama.cpp llama_sampler_top_p)."""
    if top_p >= 1.0:
        return logits
    sorted_lg = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # position i survives if the cumulative mass BEFORE it is < top_p
    keep = (cum - probs) < top_p
    # threshold = smallest kept logit
    kth = jnp.min(jnp.where(keep, sorted_lg, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= kth, logits, _NEG)


def mask_outside_range(logits: jax.Array, start: int, end: int,
                       extra=()) -> jax.Array:
    """RangeConstraint analog on device (lm/tts_runner.py:508 — the
    reference's auto-grammar admits exactly the speech-code range plus the
    EOS sentinel, common/audio_lm.cpp:1164): -inf everything outside
    [start, end) except the `extra` ids. All bounds are Python statics."""
    idx = jnp.arange(logits.shape[-1])
    keep = (idx >= int(start)) & (idx < int(end))
    for e in extra:
        if e is not None and 0 <= int(e) < logits.shape[-1]:
            keep = keep | (idx == int(e))
    return jnp.where(keep, logits, _NEG)


def apply_repetition_penalty(logits: jax.Array, seen: jax.Array,
                             penalty: float) -> jax.Array:
    """llama-style repetition penalty on raw logits (host analog:
    SamplerChain, lm/tts_runner.py — positive seen logits are divided by
    the penalty, negative ones multiplied). `seen` is a boolean mask over
    the vocab (True = token appeared in the penalized history window)."""
    if penalty == 1.0:
        return logits
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def seen_mask_from_ring(ring: jax.Array, vocab: int) -> jax.Array:
    """Boolean [vocab] mask of the token ids present in a history ring
    buffer (int32 [W], empty slots = -1: out-of-range scatter indices are
    dropped)."""
    mask = jnp.zeros((vocab,), bool)
    return mask.at[ring].set(True, mode="drop")


def sample_logits(logits: jax.Array, key: jax.Array, *,
                  temperature: float = 0.0, top_k: int = 0,
                  top_p: float = 1.0, min_p: float = 0.0) -> jax.Array:
    """One sampled token id (int32) from a 1-D logits row.

    temperature <= 0 means greedy argmax (filters are then irrelevant).
    Chain order matches the reference: temperature -> top_k -> min_p ->
    top_p -> categorical. All chain params are Python statics: use inside
    jit with a fixed config, not as traced values.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / temperature
    lg = _apply_top_k(lg, int(top_k))
    lg = _apply_min_p(lg, float(min_p))
    lg = _apply_top_p(lg, float(top_p))
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def sample_logits_dyn(logits: jax.Array, key: jax.Array,
                      chain: jax.Array) -> jax.Array:
    """`sample_logits` with the chain as a TRACED f32[4] vector
    `[temperature, top_k, top_p, min_p]`.

    Per-element semantics match the static path exactly: temperature <= 0
    means greedy argmax over the raw logits; top_k outside [1, V) / top_p
    >= 1 / min_p <= 0 each disable that filter. Used by the batched
    generation chunk so per-slot sampling parameters ride as data — ONE
    compiled executable serves any parameter mix across the continuous-
    batching slots (a static chain would compile per combination and force
    every concurrent request onto the same settings).

    Reference contrast: the reference's sampler chain lives on the host
    per stream (common/tts_runner.cpp:242-246), so per-request parameters
    are free there; on-device batched sampling has to thread them as
    traced values instead.
    """
    v = logits.shape[-1]
    temp, top_k, top_p, min_p = chain[0], chain[1], chain[2], chain[3]
    lg = logits.astype(jnp.float32) / jnp.where(temp > 0.0, temp, 1.0)
    # top_k: threshold at the k-th largest (ties at the threshold all
    # survive, exactly like _apply_top_k's lax.top_k form)
    ki = top_k.astype(jnp.int32)
    kth = jnp.sort(lg, axis=-1)[..., ::-1][jnp.clip(ki, 1, v) - 1]
    k_on = jnp.logical_and(ki >= 1, ki < v)
    lg = jnp.where(jnp.logical_and(k_on, lg < kth), _NEG, lg)
    # min_p: keep logit >= max_logit + log(min_p)  (_apply_min_p)
    cut = jnp.max(lg, axis=-1) + jnp.log(jnp.maximum(min_p, 1e-30))
    lg = jnp.where(jnp.logical_and(min_p > 0.0, lg < cut), _NEG, lg)
    # top_p: smallest descending-prob prefix reaching top_p (_apply_top_p)
    sorted_lg = jnp.sort(lg, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p
    kth_p = jnp.min(jnp.where(keep, sorted_lg, jnp.inf), axis=-1)
    lg = jnp.where(jnp.logical_and(top_p < 1.0, lg < kth_p), _NEG, lg)
    sampled = jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(temp > 0.0, sampled, greedy)


@dataclass(frozen=True)
class OnDeviceSampling:
    """Marker config for AR runners: requests the fused on-device frame
    step (one device call per frame) instead of the host sampler chain.
    Seed feeds a jax PRNG split per frame/codebook.

    `chunk_frames` > 1 additionally chains up to that many whole frames
    (LM frame + EOS gate + feedback compose + backbone step) inside one
    device call (lm/fused_gen.py) when the kind and backbone support it —
    same code stream as chunk_frames=1, ~1/K the dispatch overhead."""
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    seed: int = 0xC0DEC1AB
    chunk_frames: int = 1
    # repetition penalty (realtime-streaming chunks): >0 window = ring of
    # the last N frames per codebook, <0 = unbounded, 0 = no penalty
    repetition_penalty: float = 1.0
    repetition_window: int = 0

    def chain_vec(self):
        """This config's sampler chain as the f32[4] row `sample_logits_dyn`
        consumes (per-slot traced sampling in the batched chunk)."""
        import numpy as np

        return np.asarray([self.temperature, self.top_k, self.top_p,
                           self.min_p], np.float32)

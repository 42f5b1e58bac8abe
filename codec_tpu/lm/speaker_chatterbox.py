"""Chatterbox VoiceEncoder speaker encoder, TPU-native.

Reference behavior: src/lm/speaker_chatterbox.cpp + the VE mel front-end in
src/runtime/audio_dsp.cpp (codec_runtime_chatterbox_ve_mel_partials):

  ref 16 kHz PCM
    → host: librosa-style centered power STFT → mel → overlapping
      "partials" [n_partials, 160, 40] (get_num_wins slicing)
    → jit:  3-layer LSTM (batched over partials) → last hidden → proj →
      ReLU → per-partial L2 norm → mean → L2 norm = spk_emb_raw [256]
    → jit:  cond_enc: spkr_enc linear (→1 row), perceiver (32 learned
      queries cross-attending speech_emb(ref_tokens)+pos, then
      self-attending — BOTH attention blocks share the same q/k/v/out/norm
      weights, as upstream), emotion_adv_fc (→1 row)
    → cond_emb [n_rows=34, hidden=1024]
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops.blocks import lstm_stack

PERCEIVER_HEADS = 4


@dataclass(frozen=True)
class VeConfig:
    n_mels: int = 40
    hidden_size: int = 256
    num_layers: int = 3
    embed_size: int = 256
    n_fft: int = 400
    hop: int = 160
    win: int = 400
    partial_frames: int = 160
    sample_rate: int = 16000
    overlap: float = 0.5
    rate: float = 1.3
    min_coverage: float = 0.8
    final_relu: bool = True
    hidden_dim: int = 1024
    n_rows: int = 34

    @classmethod
    def from_gguf(cls, r: GGUFReader, hidden_dim: int) -> "VeConfig":
        d = cls()
        return cls(
            n_mels=r.get_i32("codec.speaker.ve.num_mels", d.n_mels),
            hidden_size=r.get_i32("codec.speaker.ve.hidden_size", d.hidden_size),
            num_layers=r.get_i32("codec.speaker.ve.num_layers", d.num_layers),
            embed_size=r.get_i32("codec.speaker.ve.speaker_embed_dim", d.embed_size),
            n_fft=r.get_i32("codec.speaker.ve.n_fft", d.n_fft),
            hop=r.get_i32("codec.speaker.ve.hop_size", d.hop),
            win=r.get_i32("codec.speaker.ve.win_size", d.win),
            partial_frames=r.get_i32("codec.speaker.ve.partial_frames",
                                     d.partial_frames),
            sample_rate=r.get_i32("codec.speaker.ref_sample_rate", d.sample_rate),
            overlap=r.get_f32("codec.speaker.ve.overlap", d.overlap),
            rate=r.get_f32("codec.speaker.ve.rate", d.rate),
            min_coverage=r.get_f32("codec.speaker.ve.min_coverage",
                                   d.min_coverage),
            final_relu=r.get_bool("codec.speaker.ve.final_relu", d.final_relu),
            hidden_dim=r.get_i32("codec.speaker.hidden_dim", hidden_dim),
            n_rows=r.get_i32("codec.speaker.n_rows", d.n_rows),
        )


def ve_mel_partials(pcm: np.ndarray, mel_basis: np.ndarray, window: np.ndarray,
                    cfg: VeConfig) -> np.ndarray:
    """16 kHz mono PCM → partials [n_wins, partial_frames, n_mels]
    (reference: codec_runtime_chatterbox_ve_mel_partials)."""
    pcm = np.asarray(pcm, np.float64).reshape(-1)
    n_fft, hop = cfg.n_fft, cfg.hop
    pad = n_fft // 2
    if pad >= len(pcm):
        raise ValueError("PCM too short for reflect padding")
    padded = np.pad(pcm, (pad, pad), mode="reflect")
    n_frames = 1 + len(pcm) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = padded[idx] * np.asarray(window, np.float64)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2              # [T, n_freq]
    mel = power @ np.asarray(mel_basis, np.float64).T             # [T, n_mels]
    mel = mel.astype(np.float32)

    # get_num_wins slicing
    pf = cfg.partial_frames
    if cfg.rate <= 0.0:
        frame_step = int(round(pf * (1.0 - cfg.overlap)))
    else:
        frame_step = int(round(16000.0 / cfg.rate / pf))
    if frame_step <= 0 or frame_step > pf:
        raise ValueError("invalid frame_step (rate / overlap out of range)")
    numer = max(n_frames - pf + frame_step, 0)
    n_wins, rem = divmod(numer, frame_step)
    if n_wins == 0 or (rem + (pf - frame_step)) / pf >= cfg.min_coverage:
        n_wins += 1
    target_n = pf + frame_step * (n_wins - 1)
    if target_n > n_frames:
        mel = np.pad(mel, ((0, target_n - n_frames), (0, 0)))
    else:
        mel = mel[:target_n]
    starts = frame_step * np.arange(n_wins)
    return np.stack([mel[s:s + pf] for s in starts])              # [W, pf, M]


def load_ve_params(r: GGUFReader, cfg: VeConfig, dtype=jnp.float32):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    p = {
        "lstm": [{
            "w_ih": g(f"speaker.voice_encoder.lstm_{l}.W_ih"),
            "w_hh": g(f"speaker.voice_encoder.lstm_{l}.W_hh"),
            "b_ih": g(f"speaker.voice_encoder.lstm_{l}.b_ih"),
            "b_hh": g(f"speaker.voice_encoder.lstm_{l}.b_hh"),
        } for l in range(cfg.num_layers)],
        "proj_w": g("speaker.voice_encoder.proj.weight"),
        "proj_b": g("speaker.voice_encoder.proj.bias"),
    }
    return p


def load_cond_params(r: GGUFReader, dtype=jnp.float32):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    c = "lm.chatterbox.cond"
    return {
        "spkr_enc_w": g(c + ".spkr_enc.weight"),
        "spkr_enc_b": g(c + ".spkr_enc.bias"),
        "emotion_w": g(c + ".emotion_adv_fc.weight"),
        "speech_emb": g("lm.audio_embd_0.weight"),
        "speech_pos_emb": g("lm.chatterbox.speech_pos_emb.weight"),
        "queries": g(c + ".perceiver.queries").reshape(32, -1),
        "norm_w": g(c + ".perceiver.norm.weight"),
        "norm_b": g(c + ".perceiver.norm.bias"),
        "q_w": g(c + ".perceiver.to_q.weight"), "q_b": g(c + ".perceiver.to_q.bias"),
        "k_w": g(c + ".perceiver.to_k.weight"), "k_b": g(c + ".perceiver.to_k.bias"),
        "v_w": g(c + ".perceiver.to_v.weight"), "v_b": g(c + ".perceiver.to_v.bias"),
        "o_w": g(c + ".perceiver.proj_out.weight"),
        "o_b": g(c + ".perceiver.proj_out.bias"),
    }


def ve_embed_fn(params, partials: jax.Array, cfg: VeConfig) -> jax.Array:
    """partials [W, pf, n_mels] → spk_emb_raw [embed_size]."""
    h = lstm_stack(partials, params["lstm"], skip=False)          # [W, pf, H]
    last = h[:, -1]                                               # [W, H]
    e = last @ params["proj_w"].T + params["proj_b"]
    if cfg.final_relu:
        e = jax.nn.relu(e)
    e = e / jnp.sqrt(jnp.sum(e * e, axis=-1, keepdims=True) + 1e-12)
    m = jnp.mean(e, axis=0)
    return m / jnp.sqrt(jnp.sum(m * m) + 1e-12)


def _perc_attn(x1, x2, p):
    """AttentionBlock2: shared LN/qkv/out weights across both perceiver
    blocks (reference perceiver_attn_block). x1 [Tq, H], x2 [Tk, H]."""
    h = x1.shape[-1]
    hd = h // PERCEIVER_HEADS

    def ln(x):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["norm_w"] + p["norm_b"]

    x1n, x2n = ln(x1), ln(x2)
    q = (x1n @ p["q_w"].T + p["q_b"]).reshape(-1, PERCEIVER_HEADS, hd)
    k = (x2n @ p["k_w"].T + p["k_b"]).reshape(-1, PERCEIVER_HEADS, hd)
    v = (x2n @ p["v_w"].T + p["v_b"]).reshape(-1, PERCEIVER_HEADS, hd)
    logits = jnp.einsum("qhd,khd->hqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", w, v).reshape(-1, h)
    return x1 + (o @ p["o_w"].T + p["o_b"])


def cond_enc_fn(params, spk_emb: jax.Array, ref_tokens: jax.Array,
                emotion: jax.Array) -> jax.Array:
    """spk_emb [E], ref_tokens [T] int32, emotion [] → cond_emb [34, H]
    (reference build_cond_graph)."""
    cond_spkr = (spk_emb @ params["spkr_enc_w"].T + params["spkr_enc_b"])[None]
    cond_emotion = (emotion * params["emotion_w"][:, 0])[None]
    seq = jnp.take(params["speech_emb"], ref_tokens, axis=0)
    seq = seq + params["speech_pos_emb"][:ref_tokens.shape[0]]
    att = _perc_attn(params["queries"], seq, params)
    att = _perc_attn(att, att, params)
    return jnp.concatenate([cond_spkr, att, cond_emotion], axis=0)


class ChatterboxSpeakerEncoder:
    """reference: chatterbox_speaker_encode / _from_emb."""

    def __init__(self, reader: GGUFReader, hidden_dim: int):
        self.cfg = VeConfig.from_gguf(reader, hidden_dim)
        self.ve_params = load_ve_params(reader, self.cfg)
        self.cond_params = load_cond_params(reader)
        self.mel_basis = np.asarray(
            reader.get("speaker.voice_encoder.mel_basis"), np.float64)
        self.window = np.asarray(
            reader.get("speaker.voice_encoder.window"), np.float64)
        self._jit_embed = {}
        self._jit_cond = {}

    def embed_ref(self, pcm: np.ndarray) -> np.ndarray:
        """16 kHz mono PCM → speaker embedding [embed_size]."""
        partials = ve_mel_partials(pcm, self.mel_basis, self.window, self.cfg)
        key = partials.shape[0]
        if key not in self._jit_embed:
            from ..runtime.jit_weights import jit_weighted
            self._jit_embed[key] = jit_weighted(
                self, lambda x: ve_embed_fn(self.ve_params, x, self.cfg),
                ("ve_params",))
        return np.asarray(jax.block_until_ready(
            self._jit_embed[key](jnp.asarray(partials))))

    def cond_emb(self, spk_emb: np.ndarray, ref_tokens: np.ndarray,
                 emotion: float) -> np.ndarray:
        """→ cond block [n_rows, hidden]."""
        ref_tokens = np.asarray(ref_tokens, np.int32).reshape(-1)
        key = len(ref_tokens)
        if key not in self._jit_cond:
            from ..runtime.jit_weights import jit_weighted
            self._jit_cond[key] = jit_weighted(
                self, lambda s, t, e: cond_enc_fn(self.cond_params, s, t, e),
                ("cond_params",))
        return np.asarray(jax.block_until_ready(self._jit_cond[key](
            jnp.asarray(spk_emb, jnp.float32), jnp.asarray(ref_tokens),
            jnp.float32(emotion))))

    def encode(self, ref_pcm: np.ndarray, ref_tokens: np.ndarray,
               emotion: float) -> np.ndarray:
        return self.cond_emb(self.embed_ref(ref_pcm), ref_tokens, emotion)

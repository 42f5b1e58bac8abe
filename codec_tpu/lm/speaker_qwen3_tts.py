"""Qwen3-TTS ECAPA-TDNN speaker encoder, TPU-native.

Reference behavior: src/lm/speaker_qwen3_tts.cpp + the mel front-end
codec_runtime_qwen3_tts_speaker_mel (audio_dsp.cpp):

  ref 24 kHz PCM
    → host: BigVGAN-style mel (reflect pad (n_fft−hop)/2, magnitude
      spectrum, mel_basis @ |X|, log clip @ 1e-5)         [T, n_mels]
    → jit:  ECAPA-TDNN — initial TDNN+ReLU → SE-Res2Net blocks (reflect
      "same" convs, chunked Res2Net chain, SE gating, identity skip when
      channels match) → MFA concat+conv+ReLU → attentive statistical
      pooling (conv→ReLU→tanh→conv→time-softmax, weighted mean‖std) →
      fc (k=1) → speaker embedding [enc_dim]  (1 row of hidden_dim)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader


@dataclass(frozen=True)
class EcapaConfig:
    mel_dim: int = 128
    enc_dim: int = 1024
    attn_ch: int = 128
    res2net_scale: int = 8
    se_ch: int = 128
    n_fft: int = 1024
    hop: int = 256
    win: int = 1024
    sample_rate: int = 24000
    enc_channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    enc_kernels: Tuple[int, ...] = (5, 3, 3, 3, 1)
    enc_dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    n_rows: int = 1
    hidden_dim: int = 1024

    @classmethod
    def from_gguf(cls, r: GGUFReader, hidden_dim: int) -> "EcapaConfig":
        d = cls()
        arr = lambda k, v: tuple(r.get_arr(f"codec.speaker.ecapa.{k}") or v)
        return cls(
            mel_dim=r.get_i32("codec.speaker.ecapa.mel_dim", d.mel_dim),
            enc_dim=r.get_i32("codec.speaker.ecapa.enc_dim", d.enc_dim),
            attn_ch=r.get_i32("codec.speaker.ecapa.enc_attention_channels",
                              d.attn_ch),
            res2net_scale=r.get_i32("codec.speaker.ecapa.enc_res2net_scale",
                                    d.res2net_scale),
            se_ch=r.get_i32("codec.speaker.ecapa.enc_se_channels", d.se_ch),
            n_fft=r.get_i32("codec.speaker.ecapa.n_fft", d.n_fft),
            hop=r.get_i32("codec.speaker.ecapa.hop_size", d.hop),
            win=r.get_i32("codec.speaker.ecapa.win_size", d.win),
            sample_rate=r.get_i32("codec.speaker.ref_sample_rate",
                                  d.sample_rate),
            enc_channels=arr("enc_channels", d.enc_channels),
            enc_kernels=arr("enc_kernel_sizes", d.enc_kernels),
            enc_dilations=arr("enc_dilations", d.enc_dilations),
            n_rows=r.get_i32("codec.speaker.n_rows", d.n_rows),
            hidden_dim=r.get_i32("codec.speaker.hidden_dim", hidden_dim),
        )


def qwen3_speaker_mel(pcm: np.ndarray, mel_basis: np.ndarray,
                      window: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """24 kHz mono PCM → [T, n_mels] log-mel (reference:
    codec_runtime_qwen3_tts_speaker_mel — magnitude, clip @ 1e-5)."""
    pcm = np.asarray(pcm, np.float64).reshape(-1)
    pad = (n_fft - hop) // 2
    if pad >= len(pcm):
        raise ValueError("PCM too short for the n_fft / hop pair")
    padded = np.pad(pcm, (pad, pad), mode="reflect")
    n_frames = len(pcm) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = padded[idx] * np.asarray(window, np.float64)
    mag = np.abs(np.fft.rfft(frames, axis=1))                # [T, n_freq]
    mel = mag @ np.asarray(mel_basis, np.float64).T          # [T, n_mels]
    return np.log(np.maximum(mel, 1e-5)).astype(np.float32)


def _load_conv(r: GGUFReader, prefix: str, dilation: int = 1, dtype=jnp.float32):
    w = np.asarray(r.get(prefix + ".weight"))                # [out, in, K]
    b = np.asarray(r.get(prefix + ".bias"))
    return {"w": jnp.asarray(w).astype(dtype), "b": jnp.asarray(b).astype(dtype),
            "dil": dilation}


def load_ecapa_params(r: GGUFReader, cfg: EcapaConfig, dtype=jnp.float32):
    n_blocks = len(cfg.enc_channels)
    p = {
        "init": _load_conv(r, "speaker.qwen3_tts.blocks.0.conv",
                           cfg.enc_dilations[0], dtype),
        "blocks": [],
        "mfa": _load_conv(r, "speaker.qwen3_tts.mfa.conv", 1, dtype),
        "asp_tdnn": _load_conv(r, "speaker.qwen3_tts.asp.tdnn.conv", 1, dtype),
        "asp_conv": _load_conv(r, "speaker.qwen3_tts.asp.conv", 1, dtype),
        "fc": _load_conv(r, "speaker.qwen3_tts.fc", 1, dtype),
    }
    for bi in range(1, n_blocks - 1):
        base = f"speaker.qwen3_tts.blocks.{bi}"
        p["blocks"].append({
            "tdnn1": _load_conv(r, base + ".tdnn1.conv", 1, dtype),
            "tdnn2": _load_conv(r, base + ".tdnn2.conv", 1, dtype),
            "se1": _load_conv(r, base + ".se.conv1", 1, dtype),
            "se2": _load_conv(r, base + ".se.conv2", 1, dtype),
            "res2net": [_load_conv(r, f"{base}.res2net.{ri}.conv",
                                   cfg.enc_dilations[bi], dtype)
                        for ri in range(cfg.res2net_scale - 1)],
        })
    return p


def _conv_reflect(x: jax.Array, cw) -> jax.Array:
    """'Same' conv with reflect padding. x: [T, C_in] → [T, C_out]
    (reference conv1d_reflect)."""
    w, dil = cw["w"], cw["dil"]
    k = w.shape[-1]
    k_eff = (k - 1) * dil + 1
    center = k_eff // 2
    xp = jnp.pad(x, ((center, k_eff - 1 - center), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp[None], w.transpose(2, 1, 0), window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"))[0]
    return y + cw["b"]


def _se_res2net(x: jax.Array, blk, scale: int) -> jax.Array:
    res = x
    h = jax.nn.relu(_conv_reflect(x, blk["tdnn1"]))
    parts = jnp.split(h, scale, axis=-1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if i == 1 else parts[i] + prev
        prev = jax.nn.relu(_conv_reflect(inp, blk["res2net"][i - 1]))
        outs.append(prev)
    h = jnp.concatenate(outs, axis=-1)
    h = jax.nn.relu(_conv_reflect(h, blk["tdnn2"]))
    # SE gate
    m = jnp.mean(h, axis=0)
    z = jax.nn.relu(m @ blk["se1"]["w"][:, :, 0].T + blk["se1"]["b"])
    g = jax.nn.sigmoid(z @ blk["se2"]["w"][:, :, 0].T + blk["se2"]["b"])
    h = h * g[None, :]
    if res.shape[-1] == h.shape[-1]:
        h = h + res
    return h


def ecapa_embed_fn(params, mel: jax.Array, cfg: EcapaConfig) -> jax.Array:
    """mel [T, mel_dim] → speaker embedding [enc_dim]."""
    x = jax.nn.relu(_conv_reflect(mel, params["init"]))
    outs = []
    for blk in params["blocks"]:
        x = _se_res2net(x, blk, cfg.res2net_scale)
        outs.append(x)
    cat = jnp.concatenate(outs, axis=-1)
    h = jax.nn.relu(_conv_reflect(cat, params["mfa"]))       # [T, Cmfa]
    t = h.shape[0]
    mu = jnp.mean(h, axis=0)
    sd = jnp.sqrt(jnp.maximum(jnp.mean((h - mu) ** 2, axis=0), 1e-12))
    asp_in = jnp.concatenate(
        [h, jnp.broadcast_to(mu, h.shape), jnp.broadcast_to(sd, h.shape)], -1)
    a = jnp.tanh(jax.nn.relu(_conv_reflect(asp_in, params["asp_tdnn"])))
    a = _conv_reflect(a, params["asp_conv"])                 # [T, Cmfa]
    w = jax.nn.softmax(a, axis=0)
    pm = jnp.sum(w * h, axis=0)
    pv = jnp.sum(w * (h - pm) ** 2, axis=0)
    ps = jnp.sqrt(jnp.maximum(pv, 1e-12))
    pooled = jnp.concatenate([pm, ps])
    return pooled @ params["fc"]["w"][:, :, 0].T + params["fc"]["b"]


class Qwen3TTSSpeakerEncoder:
    """reference: qwen3_tts_speaker_encode."""

    def __init__(self, reader: GGUFReader, hidden_dim: int):
        self.cfg = EcapaConfig.from_gguf(reader, hidden_dim)
        self.params = load_ecapa_params(reader, self.cfg)
        self.mel_basis = np.asarray(
            reader.get("speaker.qwen3_tts.mel_basis"), np.float64)
        self.window = np.asarray(
            reader.get("speaker.qwen3_tts.window"), np.float64)
        self._jit = {}

    def encode(self, ref_pcm: np.ndarray) -> np.ndarray:
        """24 kHz mono PCM → [n_rows=1, hidden_dim] speaker row."""
        mel = qwen3_speaker_mel(ref_pcm, self.mel_basis, self.window,
                                self.cfg.n_fft, self.cfg.hop)
        if mel.shape[0] < 2:
            raise ValueError("qwen3_tts speaker: too few mel frames")
        key = mel.shape[0]
        if key not in self._jit:
            from ..runtime.jit_weights import jit_weighted
            self._jit[key] = jit_weighted(
                self, lambda m: ecapa_embed_fn(self.params, m, self.cfg),
                ("params",))
        emb = np.asarray(jax.block_until_ready(self._jit[key](jnp.asarray(mel))))
        return emb[None, :self.cfg.hidden_dim]

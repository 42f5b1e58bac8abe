"""Chatterbox S3Tokenizer (speech → 25 Hz ternary-FSQ tokens), TPU-native.

Reference behavior: src/models/chatterbox_s3t.cpp.
  host:  16 kHz PCM padded to a 640-sample multiple → Whisper-style log-mel
         (n_fft 400, hop 160, baked mel filters + optional window, log10
         floored at global-max−8, (x+4)/4)            [T_mel, n_mels]
  graph: conv k3 s2 p1 + gelu_erf ×2 → T_mel/4 frames → 6 blocks of
         (LN → q/k/v (k bias-less) → RoPE-NEOX → SDPA → o-proj, plus an FSMN
         depthwise k31 branch on pre-RoPE v added to the same residual) →
         (LN → fc1 → gelu_erf → fc2) → q.proj → tanh → ×0.999 → round → +1
         → ternary digits → Σ 3^k  ∈ [0, 6561).

Encoder-only: tokens decode through chatterbox_s3g.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.audio import whisper_log_mel
from ..io.gguf import GGUFReader
from ..ops import conv, norms, rope
from ..ops.act import gelu_erf
from ..ops.attn import sdpa
from ..runtime.model import CodecModel, CodecError

TOKEN_HOP = 640          # 16 kHz samples per token (25 Hz)
MEL_HOP = 160


@dataclass(frozen=True)
class S3TConfig:
    sample_rate: int = 24000
    encode_sample_rate: int = 16000
    hop_size: int = 960
    n_q: int = 1
    codebook_size: int = 6561
    n_fft: int = 400
    win_length: int = 400
    n_mels: int = 128
    hidden: int = 1280
    n_heads: int = 20
    n_layers: int = 6
    fsmn_kernel: int = 31
    rope_theta: float = 10000.0

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "S3TConfig":
        d = cls()
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", d.sample_rate),
            encode_sample_rate=r.get_i32("codec.encode_sample_rate",
                                         d.encode_sample_rate),
            hop_size=r.get_i32("codec.hop_size", d.hop_size),
            n_q=r.get_i32("codec.n_q", d.n_q),
            codebook_size=r.get_i32("codec.codebook_size", d.codebook_size),
            n_fft=r.get_i32("codec.n_fft", d.n_fft),
            win_length=r.get_i32("codec.win_length", d.win_length),
            n_mels=r.get_i32("codec.n_mels", d.n_mels),
            hidden=r.get_i32("chatterbox_s3t.audio_state", d.hidden),
            n_heads=r.get_i32("chatterbox_s3t.audio_head", d.n_heads),
            n_layers=r.get_i32("chatterbox_s3t.audio_layer", d.n_layers),
            fsmn_kernel=r.get_i32("chatterbox_s3t.fsmn_kernel_size",
                                  d.fsmn_kernel),
            rope_theta=r.get_f32("chatterbox_s3t.rope_theta", d.rope_theta),
        )


def load_s3t_params(r: GGUFReader, cfg: S3TConfig, dtype=jnp.float32):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    gc = lambda n: conv.prepare_conv_weight(r.get(n)).astype(dtype)
    p = {
        "conv1_w": gc("s3t.enc.conv1.w"), "conv1_b": g("s3t.enc.conv1.b"),
        "conv2_w": gc("s3t.enc.conv2.w"), "conv2_b": g("s3t.enc.conv2.b"),
        "proj_w": g("s3t.q.proj.w"), "proj_b": g("s3t.q.proj.b"),
    }
    layers = []
    for li in range(cfg.n_layers):
        base = f"s3t.enc.blk.{li}"
        layers.append({
            "attn_ln_w": g(base + ".attn_ln.w"), "attn_ln_b": g(base + ".attn_ln.b"),
            "q_w": g(base + ".attn.q.w"), "q_b": g(base + ".attn.q.b"),
            "k_w": g(base + ".attn.k.w"),
            "v_w": g(base + ".attn.v.w"), "v_b": g(base + ".attn.v.b"),
            "o_w": g(base + ".attn.o.w"), "o_b": g(base + ".attn.o.b"),
            "fsmn_w": gc(base + ".attn.fsmn.w"),
            "mlp_ln_w": g(base + ".mlp_ln.w"), "mlp_ln_b": g(base + ".mlp_ln.b"),
            "fc1_w": g(base + ".mlp.fc1.w"), "fc1_b": g(base + ".mlp.fc1.b"),
            "fc2_w": g(base + ".mlp.fc2.w"), "fc2_b": g(base + ".mlp.fc2.b"),
        })
    p["layers"] = layers
    return p


def _s3t_block(x, lw, cfg: S3TConfig):
    b, t, c = x.shape
    nh = cfg.n_heads
    hd = c // nh
    h = norms.layer_norm(x, lw["attn_ln_w"], lw["attn_ln_b"], 1e-5)
    q = h @ lw["q_w"].T + lw["q_b"]
    k = h @ lw["k_w"].T
    v = h @ lw["v_w"].T + lw["v_b"]
    qh = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    qh = rope.apply_rope(qh, theta=cfg.rope_theta, neox=True)
    kh = rope.apply_rope(kh, theta=cfg.rope_theta, neox=True)
    a = sdpa(qh, kh, vh)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
    attn_out = a @ lw["o_w"].T + lw["o_b"]
    # FSMN memory branch on the pre-RoPE value projection
    fsmn = conv.conv1d(v, lw["fsmn_w"], padding=cfg.fsmn_kernel // 2,
                       groups=c)
    x = x + attn_out + fsmn + v
    m = norms.layer_norm(x, lw["mlp_ln_w"], lw["mlp_ln_b"], 1e-5)
    m = gelu_erf(m @ lw["fc1_w"].T + lw["fc1_b"])
    return x + (m @ lw["fc2_w"].T + lw["fc2_b"])


def s3t_encode_fn(params, mel: jax.Array, cfg: S3TConfig) -> jax.Array:
    """mel [B, T_mel, n_mels] → tokens [B, T_mel/4, 1] int32."""
    x = gelu_erf(conv.conv1d(mel, params["conv1_w"], params["conv1_b"],
                             stride=2, padding=1))
    x = gelu_erf(conv.conv1d(x, params["conv2_w"], params["conv2_b"],
                             stride=2, padding=1))
    for lw in params["layers"]:
        x = _s3t_block(x, lw, cfg)
    q = jnp.tanh(x @ params["proj_w"].T + params["proj_b"]) * 0.9990000128746033
    digits = jnp.round(q) + 1.0                          # {0, 1, 2}
    powers = jnp.asarray([3.0 ** i for i in range(q.shape[-1])], jnp.float32)
    idx = jnp.sum(digits * powers, axis=-1)
    return idx.astype(jnp.int32)[..., None]


class ChatterboxS3T(CodecModel):
    arch = "chatterbox_s3t"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = S3TConfig.from_gguf(reader)
        self.sample_rate = self.cfg.sample_rate
        self.encode_sample_rate = self.cfg.encode_sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = -1
        self.has_encoder = reader.get_bool("codec.has_encoder", True)
        self.has_decoder = reader.get_bool("codec.has_decoder", False)
        self.params = load_s3t_params(reader, self.cfg, dtype=self.compute_dtype)
        mf = np.asarray(reader.get("s3t.mel_filters"), np.float64)
        self._mel_filters = mf.T                         # [n_bins, n_mels]
        self._window = (np.asarray(reader.get("s3t.window"), np.float64)
                        if reader.has_tensor("s3t.window") else None)

    def log_mel(self, pcm: np.ndarray) -> np.ndarray:
        """16 kHz PCM → [T_mel, n_mels] (reference:
        codec_chatterbox_s3t_prepare_log_mel)."""
        pcm = self._pcm_host_f32(pcm).reshape(-1)
        if pcm.size == 0:
            raise CodecError("empty Chatterbox-S3T PCM input")
        padded = -(-len(pcm) // TOKEN_HOP) * TOKEN_HOP
        pcm = np.pad(pcm, (0, padded - len(pcm)))
        mel = whisper_log_mel(pcm, n_mels=self.cfg.n_mels, n_fft=self.cfg.n_fft,
                              hop=MEL_HOP, sr=self.encode_sample_rate,
                              mel_filters=self._mel_filters,
                              window=self._window)
        return mel.T                                     # [T_mel, n_mels]

    def encode(self, pcm, n_q: int = 0):
        if not self.has_encoder:
            raise CodecError(f"{self.arch}: model has no encoder")
        if n_q not in (0, 1):
            raise CodecError("Chatterbox-S3T encode n_q must be 0 or 1")
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        outs = []
        for row in pcm:
            mel = self.log_mel(row)
            fn = self._jitted(("enc", mel.shape[0]),
                              lambda: lambda m: s3t_encode_fn(self.params, m,
                                                              self.cfg))
            toks = np.asarray(jax.block_until_ready(
                fn(self._place_f(mel[None]))))
            outs.append(np.clip(toks[0], 0, self.codebook_size - 1))
        return outs[0] if squeeze else np.stack(outs)

"""Chatterbox S3Gen (25 Hz speech tokens → 24 kHz PCM), TPU-native.

Reference behavior: src/models/chatterbox_s3g.cpp — one fused graph:
  flow encoder (UpsampleConformerEncoder: token embed → Linear+LN·√d →
    pre-lookahead conv → 6 rel-pos conformer blocks → ×2 nearest upsample +
    causal conv → Linear+LN·√d → 4 conformer blocks → LN → proj 512→80 = mu)
  CFM (ConditionalDecoder UNet: pack [x, mu, spks, cond] → causal-resnet +
    4 BasicTransformerBlocks per stage, 12 mid stages; 10 Euler steps on
    the cosine schedule via ONE lax.scan with the CFG 0.7 cond/uncond
    pair batched — the unrolled form compiled ~10 min at production dims)
  HiFT vocoder (f0 predictor → NSF harmonic source → source STFT →
    NSF-HiFiGAN main stack (3 ups × snake resblocks + source fusion) →
    (log-mag, sin-phase) head → double-window iSTFT OLA) → trim-fade.

Conditioning is builtin (prompt tokens + prompt mel + speaker embedding
baked in the GGUF — reference requires the same).

Here the whole pipeline is one jitted function; CFM noise and NSF
phase/noise are host-sampled inputs (parity with the reference, which feeds
them as graph inputs because ggml has no portable RNG).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import conv, norms
from ..ops.act import mish
from ..ops.attn import espnet_rel_pos_emb, sdpa, sdpa_rel_pos
from ..runtime.model import CodecModel, CodecError

# HiFT structural constants (reference chatterbox_s3g.cpp:23-48)
HIFT_N_FFT = 16
HIFT_HOP = 4
HIFT_N_BINS = HIFT_N_FFT // 2 + 1
HIFT_UPS = (8, 5, 3)
HIFT_UP_KERNELS = (16, 11, 7)
HIFT_SRC_STRIDES = (15, 3, 1)
HIFT_SRC_PADS = (7, 1, 0)
HIFT_RB_KERNELS = (3, 7, 11)
HIFT_SRC_RB_KERNELS = (7, 7, 11)
HIFT_RB_DILATIONS = (1, 3, 5)
HIFT_NB_HARMONICS = 8
HIFT_NSF_ALPHA = 0.1
HIFT_NSF_SIGMA = 0.003
HIFT_NSF_VOICED_THRESHOLD = 10.0
HIFT_LRELU = 0.1
HIFT_LRELU_DEFAULT = 0.01
HIFT_AUDIO_LIMIT = 0.99
HIFT_F0_LAYERS = 5
HIFT_SOURCE_UPSAMPLE = 480
CFM_N_TIMESTEPS = 10
CFM_CFG_RATE = 0.7


@dataclass(frozen=True)
class S3GConfig:
    sample_rate: int = 24000
    hop_size: int = 960
    n_q: int = 1
    codebook_size: int = 6561
    mel_dim: int = 80                  # kCfmOutChannels
    spk_dim: int = 192
    enc_hidden: int = 512
    enc_layers: int = 6
    enc_up_layers: int = 4
    attn_heads: int = 8
    attn_head_dim: int = 64
    cfm_mid_blocks: int = 12
    cfm_transformers: int = 4
    time_embed_scale: float = 1000.0

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "S3GConfig":
        d = cls()
        g = lambda k, v: r.get_i32(f"chatterbox_s3g.{k}", v)
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", d.sample_rate),
            hop_size=r.get_i32("codec.hop_size", d.hop_size),
            n_q=r.get_i32("codec.n_q", d.n_q),
            codebook_size=r.get_i32("codec.codebook_size", d.codebook_size),
            mel_dim=g("mel_dim", d.mel_dim),
            spk_dim=g("spk_dim", d.spk_dim),
            enc_hidden=g("enc_hidden", d.enc_hidden),
            enc_layers=g("enc_layers", d.enc_layers),
            enc_up_layers=g("enc_up_layers", d.enc_up_layers),
            attn_heads=g("attn_heads", d.attn_heads),
            attn_head_dim=g("attn_head_dim", d.attn_head_dim),
            cfm_mid_blocks=g("cfm_mid_blocks", d.cfm_mid_blocks),
            cfm_transformers=g("cfm_transformers", d.cfm_transformers),
        )


def load_s3g_params(r: GGUFReader, cfg: S3GConfig, dtype=jnp.float32):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    gc = lambda n: conv.prepare_conv_weight(r.get(n)).astype(dtype)
    gtr = lambda n: conv.prepare_convtr_weight(r.get(n)).astype(dtype)

    def conformer(base):
        return {
            "norm_mha_w": g(base + ".norm_mha.w"), "norm_mha_b": g(base + ".norm_mha.b"),
            "norm_ff_w": g(base + ".norm_ff.w"), "norm_ff_b": g(base + ".norm_ff.b"),
            "q_w": g(base + ".attn.q.w"), "q_b": g(base + ".attn.q.b"),
            "k_w": g(base + ".attn.k.w"), "k_b": g(base + ".attn.k.b"),
            "v_w": g(base + ".attn.v.w"), "v_b": g(base + ".attn.v.b"),
            "o_w": g(base + ".attn.o.w"), "o_b": g(base + ".attn.o.b"),
            "pos_w": g(base + ".attn.pos.w"),
            "pbu": g(base + ".attn.pbu"), "pbv": g(base + ".attn.pbv"),
            "ff1_w": g(base + ".ff.w1.w"), "ff1_b": g(base + ".ff.w1.b"),
            "ff2_w": g(base + ".ff.w2.w"), "ff2_b": g(base + ".ff.w2.b"),
        }

    def causal_block(base):
        return {"cv_w": gc(base + ".cv.w"), "cv_b": g(base + ".cv.b"),
                "ln_w": g(base + ".ln.w"), "ln_b": g(base + ".ln.b")}

    def cfm_resnet(base):
        return {"b1": causal_block(base + ".b1"), "b2": causal_block(base + ".b2"),
                "mlp_w": g(base + ".mlp.w"), "mlp_b": g(base + ".mlp.b"),
                "res_w": gc(base + ".res.w"), "res_b": g(base + ".res.b")}

    def basic_transformer(base):
        return {
            "n1_w": g(base + ".norm1.w"), "n1_b": g(base + ".norm1.b"),
            "q_w": g(base + ".attn.q.w"), "k_w": g(base + ".attn.k.w"),
            "v_w": g(base + ".attn.v.w"),
            "o_w": g(base + ".attn.o.w"), "o_b": g(base + ".attn.o.b"),
            "n3_w": g(base + ".norm3.w"), "n3_b": g(base + ".norm3.b"),
            "ff1_w": g(base + ".ff.w1.w"), "ff1_b": g(base + ".ff.w1.b"),
            "ff2_w": g(base + ".ff.w2.w"), "ff2_b": g(base + ".ff.w2.b"),
        }

    def cfm_stage(base):
        return {"r": cfm_resnet(base + ".r"),
                "t": [basic_transformer(f"{base}.t.{ti}")
                      for ti in range(cfg.cfm_transformers)]}

    def resblock(base):
        return [{
            "a1": g(f"{base}.a1.{i}"), "a2": g(f"{base}.a2.{i}"),
            "c1_w": gc(f"{base}.cv1.{i}.w"), "c1_b": g(f"{base}.cv1.{i}.b"),
            "c2_w": gc(f"{base}.cv2.{i}.w"), "c2_b": g(f"{base}.cv2.{i}.b"),
        } for i in range(3)]

    p: Dict[str, Any] = {
        # flow encoder
        "emb": g("s3g.flow.input_emb.w"),
        "embed_lin_w": g("s3g.flow.enc.embed.lin.w"),
        "embed_lin_b": g("s3g.flow.enc.embed.lin.b"),
        "embed_ln_w": g("s3g.flow.enc.embed.ln.w"),
        "embed_ln_b": g("s3g.flow.enc.embed.ln.b"),
        "pre_cv1_w": gc("s3g.flow.enc.pre.cv1.w"), "pre_cv1_b": g("s3g.flow.enc.pre.cv1.b"),
        "pre_cv2_w": gc("s3g.flow.enc.pre.cv2.w"), "pre_cv2_b": g("s3g.flow.enc.pre.cv2.b"),
        "blk": [conformer(f"s3g.flow.enc.blk.{i}") for i in range(cfg.enc_layers)],
        "up_w": gc("s3g.flow.enc.up.w"), "up_b": g("s3g.flow.enc.up.b"),
        "up_embed_lin_w": g("s3g.flow.enc.up_embed.lin.w"),
        "up_embed_lin_b": g("s3g.flow.enc.up_embed.lin.b"),
        "up_embed_ln_w": g("s3g.flow.enc.up_embed.ln.w"),
        "up_embed_ln_b": g("s3g.flow.enc.up_embed.ln.b"),
        "up_blk": [conformer(f"s3g.flow.enc.up_blk.{i}")
                   for i in range(cfg.enc_up_layers)],
        "after_norm_w": g("s3g.flow.enc.after_norm.w"),
        "after_norm_b": g("s3g.flow.enc.after_norm.b"),
        "proj_w": g("s3g.flow.proj.w"), "proj_b": g("s3g.flow.proj.b"),
        "spk_aff_w": g("s3g.flow.spk_aff.w"), "spk_aff_b": g("s3g.flow.spk_aff.b"),
        # builtin conditioning
        "cond_embedding": g("s3g.cond.embedding").reshape(-1),
        "cond_prompt_feat": g("s3g.cond.prompt_feat").reshape(-1, cfg.mel_dim),
        # CFM
        "t_l1_w": g("s3g.cfm.t.l1.w"), "t_l1_b": g("s3g.cfm.t.l1.b"),
        "t_l2_w": g("s3g.cfm.t.l2.w"), "t_l2_b": g("s3g.cfm.t.l2.b"),
        "dn": cfm_stage("s3g.cfm.dn.0"),
        "dn_x_w": gc("s3g.cfm.dn.0.x.w"), "dn_x_b": g("s3g.cfm.dn.0.x.b"),
        "md": [cfm_stage(f"s3g.cfm.md.{i}") for i in range(cfg.cfm_mid_blocks)],
        "up": cfm_stage("s3g.cfm.up.0"),
        "up_x_w": gc("s3g.cfm.up.0.x.w"), "up_x_b": g("s3g.cfm.up.0.x.b"),
        "final": {
            "cv_w": gc("s3g.cfm.final.cv.w"), "cv_b": g("s3g.cfm.final.cv.b"),
            "ln_w": g("s3g.cfm.final.ln.w"), "ln_b": g("s3g.cfm.final.ln.b")},
        "cfm_proj_w": gc("s3g.cfm.proj.w"), "cfm_proj_b": g("s3g.cfm.proj.b"),
        # HiFT
        "f0_cn": [{"w": gc(f"s3g.hift.f0.cn.{i}.w"),
                   "b": g(f"s3g.hift.f0.cn.{i}.b")} for i in range(HIFT_F0_LAYERS)],
        "f0_cls_w": g("s3g.hift.f0.cls.w"), "f0_cls_b": g("s3g.hift.f0.cls.b"),
        "src_lin_w": g("s3g.hift.src.lin.w"), "src_lin_b": g("s3g.hift.src.lin.b"),
        "conv_pre_w": gc("s3g.hift.conv_pre.w"), "conv_pre_b": g("s3g.hift.conv_pre.b"),
        "ups": [{"w": gtr(f"s3g.hift.up.{i}.w"), "b": g(f"s3g.hift.up.{i}.b")}
                for i in range(len(HIFT_UPS))],
        "src_dn": [{"w": gc(f"s3g.hift.src_dn.{i}.w"),
                    "b": g(f"s3g.hift.src_dn.{i}.b")} for i in range(len(HIFT_UPS))],
        "src_rb": [resblock(f"s3g.hift.src_rb.{i}") for i in range(len(HIFT_UPS))],
        "rb": [resblock(f"s3g.hift.rb.{i}") for i in range(3 * len(HIFT_UPS))],
        "conv_post_w": gc("s3g.hift.conv_post.w"), "conv_post_b": g("s3g.hift.conv_post.b"),
    }
    return p


# ---------------- flow encoder ----------------

def _conformer_block(x, lw, pos, cfg: S3GConfig):
    b, t, c = x.shape
    nh, hd = cfg.attn_heads, cfg.attn_head_dim
    h = norms.layer_norm(x, lw["norm_mha_w"], lw["norm_mha_b"], 1e-12)
    q = (h @ lw["q_w"].T + lw["q_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (h @ lw["k_w"].T + lw["k_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = (h @ lw["v_w"].T + lw["v_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    p = (pos @ lw["pos_w"].T).reshape(1, 2 * t - 1, nh, hd).transpose(0, 2, 1, 3)
    a = sdpa_rel_pos(q, k, v, p, lw["pbu"], lw["pbv"])
    a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + (a @ lw["o_w"].T + lw["o_b"])
    f = norms.layer_norm(x, lw["norm_ff_w"], lw["norm_ff_b"], 1e-12)
    f = jax.nn.silu(f @ lw["ff1_w"].T + lw["ff1_b"])
    return x + (f @ lw["ff2_w"].T + lw["ff2_b"])


def s3g_flow_encode_fn(params, tokens: jax.Array, cfg: S3GConfig) -> jax.Array:
    """tokens [B, T] int32 → mu [B, 2T, mel_dim]."""
    b, t = tokens.shape
    x = jnp.take(params["emb"], tokens, axis=0)          # [B, T, hidden]
    x = x @ params["embed_lin_w"].T + params["embed_lin_b"]
    x = norms.layer_norm(x, params["embed_ln_w"], params["embed_ln_b"], 1e-5)
    x = x * math.sqrt(cfg.enc_hidden)
    # pre-lookahead: right-pad 3 → conv k4 → leaky 0.01 → left-pad 2 → conv k3 → +res
    h = jnp.pad(x, ((0, 0), (0, 3), (0, 0)))
    h = conv.conv1d(h, params["pre_cv1_w"], params["pre_cv1_b"])
    h = jax.nn.leaky_relu(h, HIFT_LRELU_DEFAULT)
    h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
    h = conv.conv1d(h, params["pre_cv2_w"], params["pre_cv2_b"])
    x = x + h
    pos1 = espnet_rel_pos_emb(t, cfg.enc_hidden)
    for lw in params["blk"]:
        x = _conformer_block(x, lw, pos1, cfg)
    # up: ×2 nearest, left-pad 4, conv k5
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.pad(x, ((0, 0), (4, 0), (0, 0)))
    x = conv.conv1d(x, params["up_w"], params["up_b"])
    x = x @ params["up_embed_lin_w"].T + params["up_embed_lin_b"]
    x = norms.layer_norm(x, params["up_embed_ln_w"], params["up_embed_ln_b"], 1e-5)
    x = x * math.sqrt(cfg.enc_hidden)
    pos2 = espnet_rel_pos_emb(2 * t, cfg.enc_hidden)
    for lw in params["up_blk"]:
        x = _conformer_block(x, lw, pos2, cfg)
    x = norms.layer_norm(x, params["after_norm_w"], params["after_norm_b"], 1e-5)
    return x @ params["proj_w"].T + params["proj_b"]     # [B, 2T, mel]


# ---------------- CFM estimator ----------------

def _causal_block1d(x, blk):
    """Causal conv k3 → LN → Mish (reference codec_op_causal_block1d_tc)."""
    y = conv.conv1d_causal(x, blk["cv_w"], blk["cv_b"])
    y = norms.layer_norm(y, blk["ln_w"], blk["ln_b"], 1e-5)
    return mish(y)


def _cfm_resnet(x, t_emb, blk):
    h = _causal_block1d(x, blk["b1"])
    tm = mish(t_emb) @ blk["mlp_w"].T + blk["mlp_b"]     # [B, out]
    h = h + tm[:, None, :]
    h = _causal_block1d(h, blk["b2"])
    return h + conv.conv1d(x, blk["res_w"], blk["res_b"])


def _basic_transformer(x, lw, cfg: S3GConfig):
    b, t, c = x.shape
    nh, hd = cfg.attn_heads, cfg.attn_head_dim
    h = norms.layer_norm(x, lw["n1_w"], lw["n1_b"], 1e-5)
    q = (h @ lw["q_w"].T).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (h @ lw["k_w"].T).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = (h @ lw["v_w"].T).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    a = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    x = x + (a @ lw["o_w"].T + lw["o_b"])
    f = norms.layer_norm(x, lw["n3_w"], lw["n3_b"], 1e-5)
    from ..ops.act import gelu_erf
    f = gelu_erf(f @ lw["ff1_w"].T + lw["ff1_b"])
    return x + (f @ lw["ff2_w"].T + lw["ff2_b"])


def _cfm_stage(x, t_emb, stage, cfg):
    x = _cfm_resnet(x, t_emb, stage["r"])
    for lw in stage["t"]:
        x = _basic_transformer(x, lw, cfg)
    return x


def _sinusoidal_time_emb(t_v, dim: int, scale: float) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(10000.0) / (half - 1)))
    e = freqs * t_v * scale
    return jnp.concatenate([jnp.sin(e), jnp.cos(e)])


def _cfm_time_emb(params, t_v, in_channels: int, scale: float) -> jax.Array:
    te = _sinusoidal_time_emb(t_v, in_channels, scale)
    te = te @ params["t_l1_w"].T + params["t_l1_b"]
    te = jax.nn.silu(te)
    return te @ params["t_l2_w"].T + params["t_l2_b"]    # [time_embed_dim]


def s3g_cfm_estimator_fn(params, x, mu, spks, cond, t_emb, cfg: S3GConfig):
    """x/mu/cond [B, T, mel], spks [B, mel], t_emb [time_embed] → dxdt."""
    b, t, _ = x.shape
    spks_rep = jnp.broadcast_to(spks[:, None, :], x.shape)
    h = jnp.concatenate([x, mu, spks_rep, cond], axis=-1)
    te = jnp.broadcast_to(t_emb[None], (b, t_emb.shape[0]))
    h = _cfm_stage(h, te, params["dn"], cfg)
    skip = h
    h = conv.conv1d_causal(h, params["dn_x_w"], params["dn_x_b"])
    for stage in params["md"]:
        h = _cfm_stage(h, te, stage, cfg)
    h = jnp.concatenate([h, skip], axis=-1)
    h = _cfm_stage(h, te, params["up"], cfg)
    h = conv.conv1d_causal(h, params["up_x_w"], params["up_x_b"])
    h = _causal_block1d(h, params["final"])
    return conv.conv1d(h, params["cfm_proj_w"], params["cfm_proj_b"])


# ---------------- HiFT ----------------

def _hift_f0(params, mel):
    """mel [B, T, mel_dim] → f0 [B, T] (reference codec_s3g_hift_f0_forward)."""
    x = mel
    for lw in params["f0_cn"]:
        x = conv.conv1d(x, lw["w"], lw["b"], padding=1)
        x = jax.nn.elu(x)
    f0 = x @ params["f0_cls_w"].T + params["f0_cls_b"]
    return jnp.abs(f0[..., 0])


def _snake_resblock(x, branches, kernel: int):
    """HiFT snake resblock: 3 dilation branches chained (reference:
    codec_op_hifigan_resblock_branch_ct; snake alphas pre-exponentiated)."""
    for br, d in zip(branches, HIFT_RB_DILATIONS):
        h = x + jnp.sin(br["a1"] * x) ** 2 / (br["a1"] + 1e-9)
        h = conv.conv1d(h, br["c1_w"], br["c1_b"], dilation=d,
                        padding=(kernel * d - d) // 2)
        h = h + jnp.sin(br["a2"] * h) ** 2 / (br["a2"] + 1e-9)
        h = conv.conv1d(h, br["c2_w"], br["c2_b"], padding=(kernel - 1) // 2)
        x = x + h
    return x


def _nsf_source(f0, phase, nsf_noise, sample_rate: int):
    """f0 [B, T_mel] → NSF excitation [B, T_pcm] (reference NSF block,
    chatterbox_s3g.cpp:729-788). phase [H+1], nsf_noise [B, T_pcm, H+1]."""
    n_harm = HIFT_NB_HARMONICS + 1
    f0_pcm = jnp.repeat(f0, HIFT_SOURCE_UPSAMPLE, axis=-1)[..., None]  # [B,Tp,1]
    scales = jnp.arange(1, n_harm + 1, dtype=jnp.float32) / sample_rate
    f_harm = f0_pcm * scales[None, None, :]
    theta = 2.0 * jnp.pi * jnp.cumsum(f_harm, axis=1)
    sine = HIFT_NSF_ALPHA * jnp.sin(theta + phase[None, None, :])
    uv = (f0_pcm > HIFT_NSF_VOICED_THRESHOLD).astype(jnp.float32)
    noise_amp = uv * (HIFT_NSF_SIGMA - HIFT_NSF_ALPHA / 3.0) + HIFT_NSF_ALPHA / 3.0
    waves = sine * uv + noise_amp * nsf_noise
    return waves


def _source_stft(s, window):
    """s [B, T_pcm] → [B, T_pcm/hop + 1, n_fft+2] windowed STFT (re ‖ im),
    zero pad n_fft/2 each side (reference source-STFT conv kernels;
    rfft imag == the reference's −w·sin basis)."""
    pad = HIFT_N_FFT // 2
    sp = jnp.pad(s, ((0, 0), (pad, pad)))
    t_frames = s.shape[1] // HIFT_HOP + 1
    idx = jnp.arange(HIFT_N_FFT)[None, :] + HIFT_HOP * jnp.arange(t_frames)[:, None]
    frames = sp[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.concatenate([spec.real.astype(s.dtype),
                            spec.imag.astype(s.dtype)], axis=-1)


def _ola(frames, hop: int):
    """Overlap-add [B, T, K] → [B, (T-1)*hop + K] (identity-kernel
    transposed conv, same pattern as ops/istft.py)."""
    b, t, k = frames.shape
    eye = jnp.flip(jnp.eye(k, dtype=frames.dtype), 0)[:, :, None]
    y = jax.lax.conv_general_dilated(
        frames, eye, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(hop,), dimension_numbers=("NWC", "WIO", "NWC"))[..., 0]
    return y[:, : (t - 1) * hop + k]


def _hift_istft(head, window):
    """head [B, T, n_fft+2] → pcm [B, (T-1)*hop] with the reference's
    double-window OLA (the synthesis basis AND the explicit multiply both
    carry hann → win² in the numerator; envelope is OLA(win²);
    chatterbox_s3g.cpp:800-846). Includes the CosyVoice sin-phase quirk."""
    log_mag = head[..., :HIFT_N_BINS]
    phase = jnp.sin(head[..., HIFT_N_BINS:])
    mag = jnp.exp(jnp.clip(log_mag, max=1e2))
    spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    frames = jnp.fft.irfft(spec, HIFT_N_FFT, axis=-1).astype(head.dtype)
    frames = frames * (window * window)[None, None, :]
    y = _ola(frames, HIFT_HOP)
    env = _ola(jnp.broadcast_to((window * window)[None, None, :], frames.shape),
               HIFT_HOP)
    sig = y / jnp.clip(env, min=1e-11)
    pad = HIFT_N_FFT // 2
    return sig[:, pad:-pad]


def s3g_hift_fn(params, mel, phase, nsf_noise, cfg: S3GConfig):
    """mel [B, T, mel_dim] → pcm [B, T*480] (reference HiFT main path)."""
    f0 = _hift_f0(params, mel)
    waves = _nsf_source(f0, phase, nsf_noise, cfg.sample_rate)
    merge = jnp.tanh(waves @ params["src_lin_w"].T + params["src_lin_b"])[..., 0]
    window = jnp.asarray(0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(HIFT_N_FFT) / HIFT_N_FFT), mel.dtype)
    s_stft = _source_stft(merge, window)                 # [B, T_stft, 18]

    x = conv.conv1d(mel, params["conv_pre_w"], params["conv_pre_b"], padding=3)
    for i, (u, k) in enumerate(zip(HIFT_UPS, HIFT_UP_KERNELS)):
        x = jax.nn.leaky_relu(x, HIFT_LRELU)
        x = conv.convtr1d(x, params["ups"][i]["w"], params["ups"][i]["b"],
                          stride=u, padding=(k - u) // 2)
        if i == len(HIFT_UPS) - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1,0))
        si = conv.conv1d(s_stft, params["src_dn"][i]["w"], params["src_dn"][i]["b"],
                         stride=HIFT_SRC_STRIDES[i], padding=HIFT_SRC_PADS[i])
        si = _snake_resblock(si, params["src_rb"][i], HIFT_SRC_RB_KERNELS[i])
        common = min(si.shape[1], x.shape[1])
        x = x[:, :common] + si[:, :common]
        acc = None
        for j in range(3):
            br = _snake_resblock(x, params["rb"][i * 3 + j], HIFT_RB_KERNELS[j])
            acc = br if acc is None else acc + br
        x = acc / 3.0
    x = jax.nn.leaky_relu(x, HIFT_LRELU_DEFAULT)
    head = conv.conv1d(x, params["conv_post_w"], params["conv_post_b"], padding=3)
    pcm = _hift_istft(head, window)
    return jnp.clip(pcm, -HIFT_AUDIO_LIMIT, HIFT_AUDIO_LIMIT)


# ---------------- full decode ----------------

def s3g_decode_fn(params, tokens, noise_z, phase, nsf_noise, mel_len1: int,
                  cfg: S3GConfig):
    """tokens [B, T_tok] (prompt+speech) → pcm [B, T_speech*480]."""
    mu = s3g_flow_encode_fn(params, tokens, cfg)         # [B, 2T, mel]
    b, t_total, _ = mu.shape
    spk = params["cond_embedding"]
    spk = spk / jnp.sqrt(jnp.sum(spk * spk) + 1e-12)     # F.normalize
    spks = (spk @ params["spk_aff_w"].T + params["spk_aff_b"])[None]
    spks = jnp.broadcast_to(spks, (b, cfg.mel_dim))
    pf = params["cond_prompt_feat"][:mel_len1]
    cond = jnp.concatenate(
        [jnp.broadcast_to(pf[None], (b,) + pf.shape),
         jnp.zeros((b, t_total - mel_len1, cfg.mel_dim), mu.dtype)], axis=1)

    in_ch = 4 * cfg.mel_dim
    mu0, spks0, cond0 = mu * 0.0, spks * 0.0, cond * 0.0
    # Euler/CFG loop as ONE scanned step with the CFG pair batched:
    # unrolling traced 10 timesteps x 2 CFG estimator copies = 20 full
    # UNets in one graph — at production dims (12 mid blocks x 4
    # transformers) that compiled for ~10 minutes. The scan compiles the
    # estimator once, and [cond; uncond] as batch rows turns the pair
    # into one call (per-sample math unchanged: batch rows are
    # independent through convs/attention).
    mu_p = jnp.concatenate([mu, mu0], axis=0)
    spks_p = jnp.concatenate([spks, spks0], axis=0)
    cond_p = jnp.concatenate([cond, cond0], axis=0)
    sched = np.asarray([1.0 - math.cos(i / CFM_N_TIMESTEPS * 0.5 * math.pi)
                        for i in range(CFM_N_TIMESTEPS + 1)], np.float32)

    def euler_step(x, tv_dt):
        t_v, dt = tv_dt
        t_emb = _cfm_time_emb(params, t_v, in_ch, cfg.time_embed_scale)
        dx = s3g_cfm_estimator_fn(params, jnp.concatenate([x, x], axis=0),
                                  mu_p, spks_p, cond_p, t_emb, cfg)
        dxdt = (1.0 + CFM_CFG_RATE) * dx[:b] - CFM_CFG_RATE * dx[b:]
        return x + dt * dxdt, None

    x, _ = jax.lax.scan(
        euler_step, noise_z,
        (jnp.asarray(sched[:-1]), jnp.asarray(sched[1:] - sched[:-1])))
    mel = x[:, mel_len1:]
    return s3g_hift_fn(params, mel, phase, nsf_noise, cfg)


class ChatterboxS3G(CodecModel):
    arch = "chatterbox_s3g"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = S3GConfig.from_gguf(reader)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = -1
        self.has_encoder = reader.get_bool("codec.has_encoder", False)
        self.has_decoder = reader.get_bool("codec.has_decoder", True)
        if reader.get_bool("chatterbox_s3g.meanflow", False):
            raise CodecError("Chatterbox-S3G meanflow path not implemented")
        if not reader.get_bool("chatterbox_s3g.has_builtin_conditioning", False):
            raise CodecError("Chatterbox-S3G decode requires builtin conditioning")
        self.prompt_token = np.asarray(
            reader.get_arr("chatterbox_s3g.cond.prompt_token"), np.int32)
        self.prompt_token_len = reader.get_i32(
            "chatterbox_s3g.cond.prompt_token_len", len(self.prompt_token))
        self.prompt_feat_frames = reader.get_i32(
            "chatterbox_s3g.cond.prompt_feat_frames", 0)
        self.params = load_s3g_params(reader, self.cfg, dtype=self.compute_dtype)

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        """Prompt tokens + speech tokens → 24 kHz PCM (reference:
        codec_chatterbox_s3g_decode). CFM noise / NSF phase+noise are
        host-sampled with a fixed seed, like the reference's mt19937(0)."""
        codes = np.asarray(codes).reshape(-1)
        codes = codes[(codes >= 0) & (codes < self.codebook_size)]
        tok = np.concatenate([self.prompt_token[:self.prompt_token_len],
                              codes.astype(np.int32)])
        t_tok = len(tok)
        if t_tok <= 0:
            raise CodecError("empty token sequence")
        mel_len1 = self.prompt_feat_frames
        t_total = 2 * t_tok
        if mel_len1 > t_total:
            raise CodecError("prompt_feat_frames exceeds encoder output length")
        t_speech = t_total - mel_len1
        t_pcm = t_speech * HIFT_SOURCE_UPSAMPLE

        rng = np.random.default_rng(0)
        noise_z = rng.standard_normal((1, t_total, self.cfg.mel_dim)).astype(np.float32)
        phase = np.concatenate([[0.0], rng.uniform(-np.pi, np.pi,
                                                   HIFT_NB_HARMONICS)]).astype(np.float32)
        nsf_noise = rng.standard_normal(
            (1, t_pcm, HIFT_NB_HARMONICS + 1)).astype(np.float32)

        fn = self._jitted(
            ("dec", t_tok, mel_len1),
            lambda: lambda t, z, ph, nn: s3g_decode_fn(
                self.params, t, z, ph, nn, mel_len1, self.cfg))
        pcm = np.array(jax.block_until_ready(fn(
            jnp.asarray(tok)[None], jnp.asarray(noise_z),
            jnp.asarray(phase), jnp.asarray(nsf_noise))))[0]

        # trim-fade: zero the first 20 ms, cosine fade-in the next 20 ms
        n_trim = self.sample_rate // 50
        pcm[:n_trim] = 0.0
        i = np.arange(min(n_trim, max(0, len(pcm) - n_trim)))
        ang = np.pi * (1.0 - i / n_trim)
        pcm[n_trim:n_trim + len(i)] *= 0.5 * (np.cos(ang) + 1.0)
        return self._fmt_out_host(pcm, pcm_format)

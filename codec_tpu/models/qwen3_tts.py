"""Qwen3-TTS-Tokenizer codec, TPU-native.

Reference behavior: src/models/qwen3_tts_tokenizer.cpp — encode reuses the
Mimi encoder graph (weights under the mimi schema with `.cb.embed` codebook
aliases; q3t encode entry at qwen3_tts_tokenizer.cpp:690-701 delegates to
codec_mimi_encode_with). Decode (codec_q3t_build_decode:242):
  per-q codebook gather → sem/acoustic sums → output projections →
  causal pre-conv → Qwen3-style pre-transformer (RMSNorm, GQA with optional
  qkv biases, RoPE-NEOX, sliding window, SwiGLU, LayerScale) → out proj →
  upsample stages (causal convtr + causal ConvNeXt) → BigVGAN-ish decoder
  (snake-beta with pre-baked exp/inv params, causal convs/convtrs,
  dilations 1/3/9) → clamp(-1, 1).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, attn, conv, norms, rope
from ..runtime.model import CodecModel
from .mimi import MimiConfig, load_mimi_params, mimi_encode_fn

RES_DILATIONS = (1, 3, 9)


@dataclass(frozen=True)
class Q3TConfig:
    sample_rate: int = 24000
    hop_size: int = 1920
    n_q: int = 16
    n_sem: int = 1
    codebook_size: int = 2048
    codebook_dim: int = 1024
    latent_dim: int = 1024
    hidden: int = 1024
    n_layers: int = 8
    n_heads: int = 16
    n_kv_heads: int = 16
    head_dim: int = 64
    intermediate: int = 3072
    rope_theta: float = 10000.0
    window: Optional[int] = None
    decoder_dim: int = 1536
    upsampling_ratios: Tuple[int, ...] = ()
    upsample_rates: Tuple[int, ...] = ()

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "Q3TConfig":
        win = r.get_i32("qwen3.decoder.sliding_window", 0)
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=r.get_i32("codec.hop_size", 1920),
            n_q=r.get_i32("codec.n_q", 16),
            codebook_size=r.get_i32("codec.codebook_size", 2048),
            codebook_dim=r.get_i32("codec.codebook_dim", 1024),
            latent_dim=r.get_i32("codec.latent_dim", 1024),
            hidden=r.get_i32("qwen3.decoder.hidden_size", 1024),
            n_layers=r.get_i32("qwen3.decoder.num_hidden_layers", 8),
            n_heads=r.get_i32("qwen3.decoder.num_attention_heads", 16),
            n_kv_heads=r.get_i32("qwen3.decoder.num_key_value_heads",
                                 r.get_i32("qwen3.decoder.num_attention_heads", 16)),
            head_dim=r.get_i32("qwen3.decoder.head_dim", 64),
            intermediate=r.get_i32("qwen3.decoder.intermediate_size", 3072),
            rope_theta=r.get_f32("qwen3.decoder.rope_theta", 10000.0),
            window=win if win > 0 else None,
            decoder_dim=r.get_i32("qwen3.decoder.decoder_dim", 1536),
            upsampling_ratios=tuple(r.get_arr("qwen3.decoder.upsampling_ratios", [])),
            upsample_rates=tuple(r.get_arr("qwen3.decoder.upsample_rates", [])),
        )


def _mimi_encoder_config(r: GGUFReader, q3: Q3TConfig) -> MimiConfig:
    """Mimi-compatible encoder config from qwen3.encoder.* KVs
    (reference: qwen3_tts_tokenizer.cpp:89-103)."""
    scaling = r.get_f32("qwen3.encoder.rope_scaling_factor", 1.0)
    return MimiConfig(
        sample_rate=q3.sample_rate,
        hop_size=q3.hop_size,
        n_q=r.get_i32("qwen3.encoder.n_q", q3.n_q),
        n_sem=r.get_i32("codec.num_semantic_quantizers", 1),
        codebook_size=r.get_i32("qwen3.encoder.codebook_size", q3.codebook_size),
        codebook_dim=r.get_i32("qwen3.encoder.codebook_dim", q3.codebook_dim),
        hidden=r.get_i32("qwen3.encoder.hidden_size", 512),
        n_layers=r.get_i32("qwen3.encoder.num_hidden_layers", 8),
        n_heads=r.get_i32("qwen3.encoder.num_attention_heads", 8),
        head_dim=r.get_i32("qwen3.encoder.head_dim", 64),
        intermediate=r.get_i32("qwen3.encoder.intermediate_size", 2048),
        rope_theta=r.get_f32("qwen3.encoder.rope_theta", 10000.0),
        freq_scale=1.0 / scaling if scaling > 0 else 1.0,
        has_encoder=True,
        has_decoder=False,
    )


def _cw(r, base, dtype):
    w = r.get(base + ".w")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(r.get(base + ".b")).astype(dtype), "k": w.shape[2]}


def _ctw(r, base, dtype):
    w = r.get(base + ".w")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(r.get(base + ".b")).astype(dtype), "k": w.shape[2]}


def load_q3t_params(r: GGUFReader, cfg: Q3TConfig, dtype=jnp.float32):
    def g(name):
        return jnp.asarray(r.get(name)).astype(dtype)

    def gopt(name):
        a = r.get_or_none(name)
        return jnp.asarray(a).astype(dtype) if a is not None else None

    p: Dict[str, Any] = {}
    p["cb"] = [g(f"q3t.dec.q.l{qi}.codebook") for qi in range(cfg.n_q)]
    p["sem_op"] = g("q3t.dec.q.s.op.w")
    p["acu_op"] = gopt("q3t.dec.q.a.op.w")
    p["pre"] = _cw(r, "q3t.dec.pre.conv", dtype)
    p["pt_in_w"], p["pt_in_b"] = g("q3t.dec.pt.in.w"), g("q3t.dec.pt.in.b")
    p["pt_out_w"], p["pt_out_b"] = g("q3t.dec.pt.out.w"), g("q3t.dec.pt.out.b")
    p["pt_norm"] = g("q3t.dec.pt.norm.w")
    layers = []
    for li in range(cfg.n_layers):
        pre = f"q3t.dec.pt.l{li}"
        layers.append({
            "inln": g(pre + ".inln.w"), "paln": g(pre + ".paln.w"),
            "q_w": g(pre + ".attn.q.w"), "k_w": g(pre + ".attn.k.w"),
            "v_w": g(pre + ".attn.v.w"), "o_w": g(pre + ".attn.o.w"),
            "q_b": gopt(pre + ".attn.q.b"), "k_b": gopt(pre + ".attn.k.b"),
            "v_b": gopt(pre + ".attn.v.b"), "o_b": gopt(pre + ".attn.o.b"),
            "gate": g(pre + ".mlp.gate.w"), "up": g(pre + ".mlp.up.w"),
            "down": g(pre + ".mlp.down.w"),
            "sa_scale": g(pre + ".sa.scale"), "mlp_scale": g(pre + ".mlp.scale"),
        })
    p["pt_layers"] = layers
    ups = []
    for ui in range(len(cfg.upsampling_ratios)):
        base = f"q3t.dec.up{ui}"
        ups.append({
            "tr": _ctw(r, base + ".tr", dtype),
            "dw": _cw(r, base + ".cnx.dw", dtype),
            "ln_w": g(base + ".cnx.norm.w"), "ln_b": g(base + ".cnx.norm.b"),
            "pw1_w": g(base + ".cnx.pw1.w"), "pw1_b": g(base + ".cnx.pw1.b"),
            "pw2_w": g(base + ".cnx.pw2.w"), "pw2_b": g(base + ".cnx.pw2.b"),
            "gamma": g(base + ".cnx.gamma"),
        })
    p["ups"] = ups
    p["d0"] = _cw(r, "q3t.dec.d0", dtype)
    blocks = []
    for bi in range(len(cfg.upsample_rates)):
        base = f"q3t.dec.b{bi}"
        blk = {"s0_a": g(base + ".s0.a"), "s0_binv": g(base + ".s0.binv"),
               "tr": _ctw(r, base + ".tr", dtype), "units": []}
        for ri in range(3):
            rb = f"{base}.r{ri}"
            blk["units"].append({
                "s1_a": g(rb + ".s1.a"), "s1_binv": g(rb + ".s1.binv"),
                "c1": _cw(r, rb + ".c1", dtype),
                "s2_a": g(rb + ".s2.a"), "s2_binv": g(rb + ".s2.binv"),
                "c2": _cw(r, rb + ".c2", dtype),
            })
        blocks.append(blk)
    p["blocks"] = blocks
    p["final_s_a"] = g("q3t.dec.final.s.a")
    p["final_s_binv"] = g("q3t.dec.final.s.binv")
    p["final"] = _cw(r, "q3t.dec.final", dtype)
    return p


def _snake_beta_inv(x, alpha, inv_beta, eps=1e-9):
    """x + sin^2(alpha*x) * inv_beta; alpha pre-exp'd, inv_beta pre-inverted
    (reference: codec_op_snake_beta, ggml_ops.cpp:171)."""
    a = jnp.maximum(alpha, eps)
    return x + jnp.sin(a * x) ** 2 * inv_beta


def q3t_decode_fn(params, codes: jax.Array, cfg: Q3TConfig,
                  n_q: Optional[int] = None) -> jax.Array:
    if n_q is None:
        n_q = codes.shape[-1]
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    sem = None
    acu = None
    for qi in range(n_q):
        e = jnp.take(params["cb"][qi], codes[..., qi], axis=0)
        if qi < cfg.n_sem:
            sem = e if sem is None else sem + e
        else:
            acu = e if acu is None else acu + e
    x = sem @ params["sem_op"].T
    if acu is not None:
        x = x + acu @ params["acu_op"].T

    x = conv.conv1d_causal(x, params["pre"]["w"], params["pre"]["b"])

    # pre-transformer
    h = x @ params["pt_in_w"].T + params["pt_in_b"]
    rope_fn = partial(rope.apply_rope, theta=cfg.rope_theta, neox=True)
    for lw in params["pt_layers"]:
        a_in = norms.rms_norm(h, lw["inln"], 1e-5)
        a = attn.mha(a_in, lw["q_w"], lw["k_w"], lw["v_w"], lw["o_w"],
                     n_heads=cfg.n_heads, n_kv_heads=cfg.n_kv_heads,
                     rope_fn=rope_fn, causal=True, window=cfg.window,
                     bq=lw["q_b"], bk=lw["k_b"], bv=lw["v_b"], bo=lw["o_b"])
        h = h + a * lw["sa_scale"]
        m = norms.rms_norm(h, lw["paln"], 1e-5)
        m = (act.silu(m @ lw["gate"].T) * (m @ lw["up"].T)) @ lw["down"].T
        h = h + m * lw["mlp_scale"]
    h = norms.rms_norm(h, params["pt_norm"], 1e-5)
    x = h @ params["pt_out_w"].T + params["pt_out_b"]

    # upsample stages: causal convtr + causal ConvNeXt
    for up, ratio in zip(params["ups"], cfg.upsampling_ratios):
        x = conv.convtr1d_causal(x, up["tr"]["w"], up["tr"]["b"], stride=ratio)
        res = x
        hh = conv.conv1d_causal(x, up["dw"]["w"], up["dw"]["b"], groups=x.shape[-1])
        hh = norms.layer_norm(hh, up["ln_w"], up["ln_b"], 1e-6)
        hh = act.gelu_erf(hh @ up["pw1_w"].T + up["pw1_b"])
        hh = hh @ up["pw2_w"].T + up["pw2_b"]
        x = res + hh * up["gamma"]

    x = conv.conv1d_causal(x, params["d0"]["w"], params["d0"]["b"])
    for blk, rate in zip(params["blocks"], cfg.upsample_rates):
        x = _snake_beta_inv(x, blk["s0_a"], blk["s0_binv"])
        x = conv.convtr1d_causal(x, blk["tr"]["w"], blk["tr"]["b"], stride=rate)
        for u, d in zip(blk["units"], RES_DILATIONS):
            res = x
            h2 = _snake_beta_inv(x, u["s1_a"], u["s1_binv"])
            h2 = conv.conv1d_causal(h2, u["c1"]["w"], u["c1"]["b"], dilation=d)
            h2 = _snake_beta_inv(h2, u["s2_a"], u["s2_binv"])
            h2 = conv.conv1d_causal(h2, u["c2"]["w"], u["c2"]["b"])
            x = res + h2
    x = _snake_beta_inv(x, params["final_s_a"], params["final_s_binv"])
    x = conv.conv1d_causal(x, params["final"]["w"], params["final"]["b"])
    return jnp.clip(x[..., 0], -1.0, 1.0)


class Qwen3TTSTokenizerCodec(CodecModel):
    arch = "qwen3_tts_tokenizer"

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = Q3TConfig.from_gguf(reader)
        self.params = load_q3t_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.has_encoder = reader.get_bool("codec.has_encoder", True) and \
            reader.has_tensor("enc.l0.conv.w")
        self.has_decoder = reader.get_bool("codec.has_decoder", True)
        if self.has_encoder:
            self.enc_cfg = _mimi_encoder_config(reader, self.cfg)
            self.enc_params = load_mimi_params(reader, self.enc_cfg,
                                               dtype=self.compute_dtype)

    def _decode_impl(self, codes, n_q):
        return q3t_decode_fn(self.params, codes, self.cfg, n_q=n_q)

    encode_per_layer_pad = True        # mimi encoder: per-strided-conv pad

    def _encode_impl(self, pcm, n_q, n_valid=None):
        return mimi_encode_fn(self.enc_params, pcm, self.enc_cfg, n_q=n_q,
                              n_valid=n_valid)

"""XY-Tokenizer (OpenMOSS XY_Tokenizer_TTSD_V0, MOSS-TTSD v0.5 codec), TPU-native.

Reference behavior: src/models/xy_tokenizer.cpp —
encode: 16 kHz PCM → Whisper-style log-mel (dsp.whisper_mel_padded) →
  parallel semantic+acoustic Whisper encoders (12 layers, n_valid masks) →
  semantic adapter → channel concat → pre-RVQ adapter (1536→768) →
  ResidualDownConv (gate/up k4s4 convs + fold + down linear + LN) →
  input_proj 3072→512 → 8-level euclidean RVQ → codes [T, 8].
decode: codebook sum → output_proj 512→3072 → post-RVQ adapter →
  ConvTranspose k4s4 3072→768 → 12-layer Whisper decoder → deconv k3s2 +
  deconv k1 (GELU) → 80-mel → Vocos (embed conv + 30 ConvNeXt + LN) →
  iSTFT head (n_fft 960, hop 240) → 24 kHz PCM. Decode runs in ≤pos-emb-rows
  chunks (reference: codec_xy_decode_chunk).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.audio import whisper_mel_padded
from ..io.gguf import GGUFReader
from ..ops import act, attn, blocks, conv, norms
from ..ops.istft import istft_from_head
from ..runtime.model import CodecModel, CodecError


@dataclass(frozen=True)
class XyConfig:
    encode_sample_rate: int = 16000
    sample_rate: int = 24000
    encoder_downsample_rate: int = 1280
    decoder_upsample_rate: int = 1920
    latent_dim: int = 3072
    codebook_dim: int = 512
    codebook_size: int = 1024
    n_q: int = 8
    mel_n_mels: int = 80
    mel_n_fft: int = 400
    mel_hop: int = 160
    n_layers: int = 12
    adapter_layers: int = 4
    d_model: int = 768
    n_heads: int = 12
    avg_pooler: int = 4
    upsample_stride: int = 4
    vocos_blocks: int = 30
    vocos_n_fft: int = 960
    vocos_hop: int = 240

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "XyConfig":
        d_model = 768
        if r.has_tensor("xy.sem_enc.l0.attn.q.w"):
            d_model = int(r.tensors["xy.sem_enc.l0.attn.q.w"].shape[0])
        return cls(
            encode_sample_rate=r.get_i32("codec.encode_sample_rate", 16000),
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            encoder_downsample_rate=r.get_i32("xy.encoder_downsample_rate", 1280),
            decoder_upsample_rate=r.get_i32("xy.decoder_upsample_rate", 1920),
            latent_dim=r.get_i32("codec.latent_dim", 3072),
            codebook_dim=r.get_i32("codec.codebook_dim", 512),
            codebook_size=r.get_i32("codec.codebook_size", 1024),
            n_q=r.get_i32("codec.n_q", 8),
            mel_n_mels=r.get_i32("xy.mel.n_mels", 80),
            mel_n_fft=r.get_i32("xy.mel.n_fft", 400),
            mel_hop=r.get_i32("xy.mel.hop_length", 160),
            n_layers=r.get_i32("xy.sem_enc.n_layers", 12),
            adapter_layers=r.get_i32("xy.sem_enc_adapter.n_layers", 4),
            d_model=d_model,
            n_heads=r.get_i32("xy.sem_enc.n_heads", 12),
            avg_pooler=r.get_i32("xy.downsample.avg_pooler", 4),
            upsample_stride=r.get_i32("xy.upsample.stride", 4),
            vocos_blocks=r.get_i32("xy.vocos.n_blocks", 30),
            vocos_n_fft=r.get_i32("xy.vocos.head.n_fft", 960),
            vocos_hop=r.get_i32("xy.vocos.head.hop_size", 240),
        )


def _whisper_module(r: GGUFReader, base: str, n_layers: int, dtype):
    def g(n):
        return jnp.asarray(r.get(n)).astype(dtype)

    def gopt(n):
        a = r.get_or_none(n)
        return jnp.asarray(a).astype(dtype) if a is not None else None

    m: Dict[str, Any] = {
        "pos": g(base + ".pos_emb"),
        "ln_w": g(base + ".layer_norm.w"), "ln_b": g(base + ".layer_norm.b"),
        "proj_w": gopt(base + ".proj.w"), "proj_b": gopt(base + ".proj.b"),
        "out_w": gopt(base + ".out_proj.w"), "out_b": gopt(base + ".out_proj.b"),
        "layers": [],
    }
    for li in range(n_layers):
        lp = f"{base}.l{li}"
        m["layers"].append({k: g(f"{lp}.{n}") for k, n in (
            ("n1w", "norm1.w"), ("n1b", "norm1.b"),
            ("qw", "attn.q.w"), ("qb", "attn.q.b"),
            ("kw", "attn.k.w"),
            ("vw", "attn.v.w"), ("vb", "attn.v.b"),
            ("ow", "attn.out.w"), ("ob", "attn.out.b"),
            ("n2w", "norm2.w"), ("n2b", "norm2.b"),
            ("f1w", "mlp.fc1.w"), ("f1b", "mlp.fc1.b"),
            ("f2w", "mlp.fc2.w"), ("f2b", "mlp.fc2.b"))})
    return m


def load_xy_params(r: GGUFReader, cfg: XyConfig, dtype=jnp.float32):
    def g(n):
        return jnp.asarray(r.get(n)).astype(dtype)

    p: Dict[str, Any] = {}
    # RVQ (shared by encode/decode)
    p["cb"] = jnp.stack([g(f"xy.q.{qi}.codebook") for qi in range(cfg.n_q)])
    p["out_proj_w"] = g("xy.q.out_proj.w")    # conv1x1 (out, in, 1)
    p["out_proj_b"] = g("xy.q.out_proj.b")

    if r.has_tensor("xy.sem_enc.l0.attn.q.w"):
        p["in_proj_w"] = g("xy.q.in_proj.w")
        p["in_proj_b"] = g("xy.q.in_proj.b")
        for name, base, nl in (("sem_enc", "xy.sem_enc", cfg.n_layers),
                               ("acoust_enc", "xy.acoust_enc", cfg.n_layers),
                               ("sem_adapter", "xy.sem_enc_adapter", cfg.adapter_layers),
                               ("pre_rvq", "xy.pre_rvq_adapter", cfg.adapter_layers)):
            p[name] = _whisper_module(r, base, nl, dtype)
        for name in ("sem_enc", "acoust_enc"):
            p[name]["conv1_w"] = conv.prepare_conv_weight(r.get(f"xy.{'sem_enc' if name == 'sem_enc' else 'acoust_enc'}.conv1.w")).astype(dtype)
            p[name]["conv1_b"] = g(f"xy.{'sem_enc' if name == 'sem_enc' else 'acoust_enc'}.conv1.b")
            p[name]["conv2_w"] = conv.prepare_conv_weight(r.get(f"xy.{'sem_enc' if name == 'sem_enc' else 'acoust_enc'}.conv2.w")).astype(dtype)
            p[name]["conv2_b"] = g(f"xy.{'sem_enc' if name == 'sem_enc' else 'acoust_enc'}.conv2.b")
        p["dn_gate_w"] = conv.prepare_conv_weight(r.get("xy.downsample.gate.w")).astype(dtype)
        p["dn_up_w"] = conv.prepare_conv_weight(r.get("xy.downsample.up.w")).astype(dtype)
        p["dn_down_w"] = g("xy.downsample.down.w")
        p["dn_ln_w"] = g("xy.downsample.layer_norm.w")
        p["dn_ln_b"] = g("xy.downsample.layer_norm.b")

    # decode side
    p["post_rvq"] = _whisper_module(r, "xy.post_rvq_adapter", cfg.adapter_layers, dtype)
    p["acoust_dec"] = _whisper_module(r, "xy.acoust_dec", cfg.n_layers, dtype)
    p["up_conv_w"] = conv.prepare_convtr_weight(r.get("xy.upsample.up_conv.w")).astype(dtype)
    p["deconv1_w"] = conv.prepare_convtr_weight(r.get("xy.acoust_dec.deconv1.w")).astype(dtype)
    p["deconv1_b"] = g("xy.acoust_dec.deconv1.b")
    p["deconv2_w"] = conv.prepare_convtr_weight(r.get("xy.acoust_dec.deconv2.w")).astype(dtype)
    p["deconv2_b"] = g("xy.acoust_dec.deconv2.b")
    p["vocos_embed_w"] = conv.prepare_conv_weight(r.get("xy.vocos.embed.w")).astype(dtype)
    p["vocos_embed_b"] = g("xy.vocos.embed.b")
    p["vocos_norm_w"] = g("xy.vocos.norm.w")
    p["vocos_norm_b"] = g("xy.vocos.norm.b")
    vb = []
    for bi in range(cfg.vocos_blocks):
        bp = f"xy.vocos.b{bi}"
        vb.append({
            "dw_w": conv.prepare_conv_weight(r.get(bp + ".dwconv.w")).astype(dtype),
            "dw_b": g(bp + ".dwconv.b"),
            "ln_w": g(bp + ".norm.w"), "ln_b": g(bp + ".norm.b"),
            "pw1_w": g(bp + ".pwconv1.w"), "pw1_b": g(bp + ".pwconv1.b"),
            "pw2_w": g(bp + ".pwconv2.w"), "pw2_b": g(bp + ".pwconv2.b"),
            "gamma": g(bp + ".gamma"),
        })
    p["vocos_blocks"] = vb
    p["vocos_fln_w"] = g("xy.vocos.final_layer_norm.w")
    p["vocos_fln_b"] = g("xy.vocos.final_layer_norm.b")
    p["head_w"] = g("xy.vocos.head.out.w")
    p["head_b"] = g("xy.vocos.head.out.b")
    return p


def _whisper_layer(x, lw, n_heads, n_valid=None):
    """Pre-LN Whisper encoder layer; q/v/out biased, k unbiased; scale applied
    to q (HF convention); non-causal SDPA with n_valid key masking + query
    row zeroing (reference: codec_op_whisper_encoder_layer_tc)."""
    b, t, c = x.shape
    d = c // n_heads
    h = norms.layer_norm(x, lw["n1w"], lw["n1b"], 1e-5)
    q = (h @ lw["qw"].T + lw["qb"]) * (d ** -0.5)
    k = h @ lw["kw"].T
    v = h @ lw["vw"].T + lw["vb"]
    q = q.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if n_valid is not None:
        kj = jnp.arange(t)[None, :]
        logits = logits + jnp.where(kj < n_valid, 0.0, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c)
    a = ctx @ lw["ow"].T + lw["ob"]
    if n_valid is not None:
        qi = jnp.arange(t)[None, :, None]
        a = jnp.where(qi < n_valid, a, 0.0)
    x = x + a
    m = norms.layer_norm(x, lw["n2w"], lw["n2b"], 1e-5)
    m = act.gelu_erf(m @ lw["f1w"].T + lw["f1b"]) @ lw["f2w"].T + lw["f2b"]
    if n_valid is not None:
        qi = jnp.arange(t)[None, :, None]
        m = jnp.where(qi < n_valid, m, 0.0)
    return x + m


def _whisper_module_fwd(x, m, n_heads, n_valid=None):
    if m["proj_w"] is not None:
        x = x @ m["proj_w"].T + m["proj_b"]
    x = x + m["pos"][: x.shape[1]]
    for lw in m["layers"]:
        x = _whisper_layer(x, lw, n_heads, n_valid)
    x = norms.layer_norm(x, m["ln_w"], m["ln_b"], 1e-5)
    if m["out_w"] is not None:
        x = x @ m["out_w"].T + m["out_b"]
    return x


def xy_encode_fn(params, mel: jax.Array, cfg: XyConfig, n_valid_mel: int) -> jax.Array:
    """mel [B, T_mel, n_mels] → codes [B, T_mel/2/avg, n_q]."""
    n_valid_conv = n_valid_mel // 2

    def omni(m):
        x = conv.conv1d(mel, m["conv1_w"], m["conv1_b"], padding=1)
        x = act.gelu_erf(x)
        x = conv.conv1d(x, m["conv2_w"], m["conv2_b"], stride=2, padding=1)
        x = act.gelu_erf(x)
        return _whisper_module_fwd(x, m, cfg.n_heads, n_valid_conv)

    sem = omni(params["sem_enc"])
    aco = omni(params["acoust_enc"])
    sem = _whisper_module_fwd(sem, params["sem_adapter"], cfg.n_heads, n_valid_conv)
    cat = jnp.concatenate([sem, aco], axis=-1)
    cat = _whisper_module_fwd(cat, params["pre_rvq"], cfg.n_heads, n_valid_conv)

    # ResidualDownConv
    avg = cfg.avg_pooler
    gate = conv.conv1d(cat, params["dn_gate_w"], None, stride=avg)     # [B,T/4,I]
    up = conv.conv1d(cat, params["dn_up_w"], None, stride=avg)
    b, t, d = cat.shape
    fold = cat.reshape(b, t // avg, avg * d)
    y = (act.silu(gate) * up) @ params["dn_down_w"].T + fold
    y = norms.layer_norm(y, params["dn_ln_w"], params["dn_ln_b"], 1e-5)

    z = y @ params["in_proj_w"][:, :, 0].T + params["in_proj_b"]

    from ..ops import rvq as rvq_ops

    return rvq_ops.rvq_encode(z, params["cb"])


def xy_decode_head_fn(params, codes: jax.Array, cfg: XyConfig) -> jax.Array:
    """codes [B, T, n_q] → iSTFT-head input [B, T_audio, n_fft+2]."""
    from ..ops import rvq as rvq_ops

    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    z = rvq_ops.rvq_decode_sum(codes, params["cb"])                  # [B,T,512]
    x = z @ params["out_proj_w"][:, :, 0].T + params["out_proj_b"]   # [B,T,3072]
    x = _whisper_module_fwd(x, params["post_rvq"], cfg.n_heads)
    x = conv.convtr1d(x, params["up_conv_w"], None, stride=cfg.upsample_stride)
    x = _whisper_module_fwd(x, params["acoust_dec"], cfg.n_heads)
    x = conv.convtr1d(x, params["deconv1_w"], params["deconv1_b"], stride=2)
    x = act.gelu_erf(x)
    x = conv.convtr1d(x, params["deconv2_w"], params["deconv2_b"], stride=1)
    x = act.gelu_erf(x)                                              # [B,T_audio,80]
    x = conv.conv1d(x, params["vocos_embed_w"], params["vocos_embed_b"], padding=3)
    x = norms.layer_norm(x, params["vocos_norm_w"], params["vocos_norm_b"], 1e-6)
    for blk in params["vocos_blocks"]:
        x = blocks.convnext_block(x, blk)
    x = norms.layer_norm(x, params["vocos_fln_w"], params["vocos_fln_b"], 1e-6)
    return x @ params["head_w"].T + params["head_b"]


def xy_decode_fn(params, codes: jax.Array, cfg: XyConfig) -> jax.Array:
    head = xy_decode_head_fn(params, codes, cfg)
    return istft_from_head(head, cfg.vocos_hop)


class XyTokenizerCodec(CodecModel):
    arch = "xy_tokenizer"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = XyConfig.from_gguf(reader)
        self.params = load_xy_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.encode_sample_rate = self.cfg.encode_sample_rate
        self.hop_size = self.cfg.decoder_upsample_rate
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.has_encoder = "in_proj_w" in self.params
        self.has_decoder = True
        # chunk decode windows are bounded by the post-RVQ pos-emb rows
        self.chunk_codes = int(self.params["post_rvq"]["pos"].shape[0])

    def encode(self, pcm, n_q: int = 0):
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        outs = []
        for row in pcm:
            mel, n_frames = whisper_mel_padded(
                row, self.cfg.encode_sample_rate, self.cfg.mel_n_fft,
                self.cfg.mel_hop, self.cfg.mel_n_mels,
                self.cfg.encoder_downsample_rate)
            n_valid = min(n_frames, len(row) // self.cfg.mel_hop)
            fn = self._jitted(("enc", n_frames, n_valid),
                              lambda: lambda m: xy_encode_fn(self.params, m,
                                                             self.cfg, n_valid))
            codes = np.asarray(jax.block_until_ready(
                fn(self._place_f(mel.T[None]))))[0]
            n_codes_valid = (n_valid // 2) // self.cfg.avg_pooler
            outs.append(codes[:n_codes_valid])
        out = outs[0] if squeeze else np.stack(outs)
        return out

    def _decode_impl(self, codes, n_q):
        return xy_decode_fn(self.params, codes, self.cfg)

    def decode(self, codes, n_q: int = 0, pcm_format: str = "f32"):
        """Chunked decode (reference: codec_xy_decode splits at
        chunk_code_length = post-RVQ pos-emb rows)."""
        codes = np.asarray(codes)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        t = codes.shape[1]
        pieces = []
        for start in range(0, t, self.chunk_codes):
            chunk = codes[:, start:start + self.chunk_codes]
            fn = self._jitted(("dec", chunk.shape),
                              lambda: lambda c: xy_decode_fn(self.params, c, self.cfg))
            pieces.append(np.asarray(jax.block_until_ready(fn(jnp.asarray(chunk.astype(np.int32))))))
        pcm = self._fmt_out_host(np.concatenate(pieces, axis=1), pcm_format)
        return pcm[0] if squeeze else pcm

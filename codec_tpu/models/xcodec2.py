"""XCodec2 (HKUSTAudio/xcodec2), TPU-native.

Decode (reference: codec_x2_build_decode, src/models/xcodec2.cpp:59) shares
the NeuCodec Vocos+RoFormer backbone — single FSQ codebook lookup →
project_out → fc_post_a → embed conv k7 → 2 prior resnets → 12 RoFormer
blocks (RoPE-NORMAL) → 2 post resnets → final LN → iSTFT head → 16 kHz PCM.

Encode (reference: codec_x2_build_encode, src/models/xcodec2.cpp:584):
  acoustic: PCM → BigCodec encoder (conv k7 → 5 blocks of 3 alias-free
            snake-beta residual units (dil 1/3/9) + downsample, strides
            2·2·4·4·5 = hop 320 → final act + conv k3 → 1024)
  semantic: SeamlessM4T mel features (host-side, dsp.w2v_bert_features) →
            W2V-BERT feature-projection + 16 conformer layers (Shaw rel-key
            attention, GLU conv module with causal depthwise k31) →
            SemanticEncoder conv stack → 1024
  concat([sem, ac]) → fc_prior (2048→2048) → FSQ project_in (2048→8) →
  double-bound tanh quantize → mixed-radix code in [0, 4^8).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.audio import w2v_bert_features
from ..io.gguf import GGUFReader
from ..ops import conv, norms
from ..ops.alias_act import alias_free_snake_beta
from ..ops.attn import sdpa_rel_key
from ..runtime.model import CodecModel
from .neucodec import NeuConfig, load_neu_params, neu_decode_fn

UP_RATIOS = (2, 2, 4, 4, 5)          # reference xcodec2.h enc_up_ratios
DILATIONS = (1, 3, 9)
FSQ_LEVEL = 4                        # levels = [4]^codebook_dim


@dataclass(frozen=True)
class X2EncConfig:
    w2v_layers: int = 16
    w2v_hidden: int = 1024
    w2v_heads: int = 16
    w2v_head_dim: int = 64
    w2v_left_max: int = 64
    w2v_right_max: int = 8
    w2v_dw_kernel: int = 31
    w2v_input_dim: int = 160
    w2v_eps: float = 1e-5
    mel_n_fft: int = 512
    mel_win: int = 400
    mel_hop: int = 160
    mel_n_mels: int = 80
    mel_stride: int = 2
    mel_preemphasis: float = 0.97
    mel_floor: float = 1.192092955078125e-7

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "X2EncConfig":
        d = cls()
        return cls(
            w2v_layers=r.get_i32("xcodec2.w2v.layers", d.w2v_layers),
            w2v_hidden=r.get_i32("xcodec2.w2v.hidden", d.w2v_hidden),
            w2v_heads=r.get_i32("xcodec2.w2v.heads", d.w2v_heads),
            w2v_head_dim=r.get_i32("xcodec2.w2v.head_dim", d.w2v_head_dim),
            w2v_left_max=r.get_i32("xcodec2.w2v.left_max_pos", d.w2v_left_max),
            w2v_right_max=r.get_i32("xcodec2.w2v.right_max_pos", d.w2v_right_max),
            w2v_dw_kernel=r.get_i32("xcodec2.w2v.dw_kernel", d.w2v_dw_kernel),
            w2v_input_dim=r.get_i32("xcodec2.w2v.input_dim", d.w2v_input_dim),
            w2v_eps=r.get_f32("xcodec2.w2v.layer_norm_eps", d.w2v_eps),
            mel_n_fft=r.get_i32("codec.mel.n_fft", d.mel_n_fft),
            mel_win=r.get_i32("codec.mel.win_length", d.mel_win),
            mel_hop=r.get_i32("codec.mel.hop_length", d.mel_hop),
            mel_n_mels=r.get_i32("codec.mel.n_mels", d.mel_n_mels),
            mel_stride=r.get_i32("codec.mel.stride", d.mel_stride),
            mel_preemphasis=r.get_f32("codec.mel.preemphasis", d.mel_preemphasis),
            mel_floor=r.get_f32("codec.mel.mel_floor", d.mel_floor),
        )


def load_x2_encode_params(r: GGUFReader, cfg: X2EncConfig, dtype=jnp.float32):
    g = lambda n: jnp.asarray(r.get(n)).astype(dtype)
    gc = lambda n: conv.prepare_conv_weight(r.get(n)).astype(dtype)
    gb = lambda n: g(n) if r.has_tensor(n) else None

    p: Dict[str, Any] = {
        "alias": g("xcodec2.enc.alias.filter").reshape(-1),
        "conv0_w": gc("xcodec2.enc.codec.conv0.w"),
        "conv0_b": gb("xcodec2.enc.codec.conv0.b"),
        "final_act_a": g("xcodec2.enc.codec.final.act.alpha"),
        "final_act_ib": g("xcodec2.enc.codec.final.act.inv_beta"),
        "final_w": gc("xcodec2.enc.codec.final.conv.w"),
        "final_b": gb("xcodec2.enc.codec.final.conv.b"),
        "fc_prior_w": g("xcodec2.enc.fc_prior.w"),
        "fc_prior_b": g("xcodec2.enc.fc_prior.b"),
        "proj_in_w": g("xcodec2.enc.quant.project_in.w"),
        "proj_in_b": g("xcodec2.enc.quant.project_in.b"),
        "feat_ln_w": g("xcodec2.w2v.feat_ln.w"),
        "feat_ln_b": g("xcodec2.w2v.feat_ln.b"),
        "feat_proj_w": g("xcodec2.w2v.feat_proj.w"),
        "feat_proj_b": g("xcodec2.w2v.feat_proj.b"),
        "sem_initial_w": gc("xcodec2.sem.initial.w"),
        "sem_r1_w": gc("xcodec2.sem.r1.w"), "sem_r1_b": g("xcodec2.sem.r1.b"),
        "sem_r3_w": gc("xcodec2.sem.r3.w"), "sem_r3_b": g("xcodec2.sem.r3.b"),
        "sem_final_w": gc("xcodec2.sem.final.w"),
    }

    blocks = []
    for bi in range(1, len(UP_RATIOS) + 1):
        base = f"xcodec2.enc.codec.b{bi}"
        units = []
        for ri in range(len(DILATIONS)):
            rb = f"{base}.r{ri}"
            units.append({
                "a1_a": g(rb + ".act1.alpha"), "a1_ib": g(rb + ".act1.inv_beta"),
                "c1_w": gc(rb + ".conv1.w"), "c1_b": gb(rb + ".conv1.b"),
                "a2_a": g(rb + ".act2.alpha"), "a2_ib": g(rb + ".act2.inv_beta"),
                "c2_w": gc(rb + ".conv2.w"), "c2_b": gb(rb + ".conv2.b"),
            })
        blocks.append({
            "units": units,
            "act_a": g(base + ".act.alpha"), "act_ib": g(base + ".act.inv_beta"),
            "down_w": gc(base + ".down.w"), "down_b": gb(base + ".down.b"),
        })
    p["enc_blocks"] = blocks

    layers = []
    for li in range(cfg.w2v_layers):
        base = f"xcodec2.w2v.l{li}"
        lw = {"dist": g(base + ".attn.dist.w")}
        for key, name in (("ffn1_ln", "ffn1_ln"), ("attn_ln", "attn_ln"),
                          ("dw_ln", "conv.dw_ln"), ("conv_ln", "conv.ln"),
                          ("ffn2_ln", "ffn2_ln"), ("final_ln", "final_ln")):
            lw[key + "_w"] = g(f"{base}.{name}.w")
            lw[key + "_b"] = g(f"{base}.{name}.b")
        for key, name in (("ffn1_fc1", "ffn1.fc1"), ("ffn1_fc2", "ffn1.fc2"),
                          ("q", "attn.q"), ("k", "attn.k"), ("v", "attn.v"),
                          ("o", "attn.o"),
                          ("ffn2_fc1", "ffn2.fc1"), ("ffn2_fc2", "ffn2.fc2")):
            lw[key + "_w"] = g(f"{base}.{name}.w")
            lw[key + "_b"] = g(f"{base}.{name}.b")
        lw["pw1_w"] = gc(f"{base}.conv.pw1.w")
        lw["dw_w"] = gc(f"{base}.conv.dw.w")
        lw["pw2_w"] = gc(f"{base}.conv.pw2.w")
        layers.append(lw)
    p["w2v_layers"] = layers
    return p


def _conformer_layer(x, lw, cfg: X2EncConfig):
    """W2V-BERT conformer block (reference: codec_x2_w2v_layer,
    src/models/xcodec2.cpp:516). x: [B, T, C]."""
    eps = cfg.w2v_eps
    ln = lambda v, n: norms.layer_norm(v, lw[n + "_w"], lw[n + "_b"], eps)

    h = ln(x, "ffn1_ln")
    h = jax.nn.silu(h @ lw["ffn1_fc1_w"].T + lw["ffn1_fc1_b"])
    h = h @ lw["ffn1_fc2_w"].T + lw["ffn1_fc2_b"]
    x = x + 0.5 * h

    b, t, c = x.shape
    nh, hd = cfg.w2v_heads, cfg.w2v_head_dim
    h = ln(x, "attn_ln")
    q = (h @ lw["q_w"].T + lw["q_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (h @ lw["k_w"].T + lw["k_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = (h @ lw["v_w"].T + lw["v_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    a = sdpa_rel_key(q, k, v, lw["dist"], cfg.w2v_left_max, cfg.w2v_right_max)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + (a @ lw["o_w"].T + lw["o_b"])

    # conv module: LN → pw1 (2C, GLU) → causal dw → LN → SiLU → pw2
    h = ln(x, "conv_ln")
    h = conv.conv1d(h, lw["pw1_w"])                                  # k=1, no bias
    gate_a, gate_b = jnp.split(h, 2, axis=-1)
    h = gate_a * jax.nn.sigmoid(gate_b)
    h = jnp.pad(h, ((0, 0), (cfg.w2v_dw_kernel - 1, 0), (0, 0)))
    h = conv.conv1d(h, lw["dw_w"], groups=h.shape[-1])
    h = ln(h, "dw_ln")
    h = jax.nn.silu(h)
    h = conv.conv1d(h, lw["pw2_w"])
    x = x + h

    h = ln(x, "ffn2_ln")
    h = jax.nn.silu(h @ lw["ffn2_fc1_w"].T + lw["ffn2_fc1_b"])
    h = h @ lw["ffn2_fc2_w"].T + lw["ffn2_fc2_b"]
    x = x + 0.5 * h
    return ln(x, "final_ln")


def _residual_unit(x, u, alias, dilation: int):
    h = alias_free_snake_beta(x, u["a1_a"], u["a1_ib"], alias)
    h = conv.conv1d(h, u["c1_w"], u["c1_b"], dilation=dilation,
                    padding=3 * dilation)
    h = alias_free_snake_beta(h, u["a2_a"], u["a2_ib"], alias)
    h = conv.conv1d(h, u["c2_w"], u["c2_b"])
    return x + h


def x2_acoustic_fn(params, pcm: jax.Array) -> jax.Array:
    """BigCodec acoustic encoder: pcm [B, n] → [B, n//320, hidden]."""
    alias = params["alias"]
    x = conv.conv1d(pcm[..., None], params["conv0_w"], params["conv0_b"],
                    padding=3)
    for blk, stride in zip(params["enc_blocks"], UP_RATIOS):
        for u, d in zip(blk["units"], DILATIONS):
            x = _residual_unit(x, u, alias, d)
        x = alias_free_snake_beta(x, blk["act_a"], blk["act_ib"], alias)
        x = conv.conv1d(x, blk["down_w"], blk["down_b"], stride=stride,
                        padding=stride // 2 + stride % 2)
    x = alias_free_snake_beta(x, params["final_act_a"], params["final_act_ib"],
                              alias)
    return conv.conv1d(x, params["final_w"], params["final_b"], padding=1)


def x2_semantic_fn(params, mel: jax.Array, cfg: X2EncConfig) -> jax.Array:
    """mel [B, T_sem, input_dim] → [B, T_sem, hidden]."""
    h = norms.layer_norm(mel, params["feat_ln_w"], params["feat_ln_b"],
                         cfg.w2v_eps)
    h = h @ params["feat_proj_w"].T + params["feat_proj_b"]
    for lw in params["w2v_layers"]:
        h = _conformer_layer(h, lw, cfg)
    # SemanticEncoder — the residual taps the POST-ReLU value (the upstream
    # inplace ReLU mutates the buffer before the skip-add; xcodec2.cpp:660)
    h = conv.conv1d(h, params["sem_initial_w"], padding=1)
    h = jax.nn.relu(h)
    res = h
    h = jax.nn.relu(conv.conv1d(h, params["sem_r1_w"], params["sem_r1_b"],
                                padding=1))
    h = conv.conv1d(h, params["sem_r3_w"], params["sem_r3_b"], padding=1)
    h = h + res
    return conv.conv1d(h, params["sem_final_w"], padding=1)


def fsq_quantize_x2(z: jax.Array, codebook_dim: int) -> jax.Array:
    """vector_quantize_pytorch FSQ with levels=[4]^d, bound applied twice
    (reference: xcodec2.cpp:703). z [..., d] → int32 code indices [...]."""
    eps = 1e-3
    half_l = (FSQ_LEVEL - 1) * (1.0 + eps) / 2.0
    offset = 0.5
    shift = math.atanh(offset / half_l)
    half_width = FSQ_LEVEL // 2
    bound = lambda x: half_l * jnp.tanh(x + shift) - offset
    zq = jnp.round(bound(bound(z)))                       # levels in [-2, 1]
    basis = jnp.asarray([FSQ_LEVEL ** i for i in range(codebook_dim)],
                        jnp.float32)
    idx = jnp.sum((zq + half_width) * basis, axis=-1)
    return idx.astype(jnp.int32)


def x2_encode_fn(params, pcm: jax.Array, mel: jax.Array, n_codes: int,
                 cfg: X2EncConfig, codebook_dim: int) -> jax.Array:
    """pcm [B, n], mel [B, T_sem, input_dim] → codes [B, n_codes, 1]."""
    ac = x2_acoustic_fn(params, pcm)[:, :n_codes]
    sem = x2_semantic_fn(params, mel, cfg)[:, :n_codes]
    h = jnp.concatenate([sem, ac], axis=-1)               # semantic first
    h = h @ params["fc_prior_w"].T + params["fc_prior_b"]
    z = h @ params["proj_in_w"].T + params["proj_in_b"]
    return fsq_quantize_x2(z, codebook_dim)[..., None]


class XCodec2(CodecModel):
    arch = "xcodec2"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = NeuConfig.from_gguf(
            reader, prefix="xcodec2",
            sample_rate=16000, hop_size=320, codebook_size=65536,
            codebook_dim=8, vq_dim=2048, hidden_dim=1024, num_layers=12,
            num_heads=16, head_dim=64)
        self.sample_rate = self.cfg.sample_rate
        self.encode_sample_rate = reader.get_i32("codec.encode_sample_rate",
                                                 self.cfg.sample_rate)
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = reader.get_i32("codec.latent_dim", 1024)
        self.has_encoder = reader.get_bool("codec.has_encoder", False)
        self.has_decoder = reader.get_bool("codec.has_decoder", True)
        if self.has_decoder:
            self.params = load_neu_params(reader, self.cfg,
                                          dtype=self.compute_dtype,
                                          prefix="xcodec2")
        if self.has_encoder:
            self.enc_cfg = X2EncConfig.from_gguf(reader)
            self.enc_params = load_x2_encode_params(reader, self.enc_cfg,
                                                    dtype=self.compute_dtype)
            self._mel_filters = np.asarray(
                reader.get("xcodec2.enc.mel.filters"), np.float64)
            self._mel_window = np.asarray(
                reader.get("xcodec2.enc.mel.window"), np.float64)

    def _decode_impl(self, codes, n_q):
        return neu_decode_fn(self.params, codes, self.cfg)

    def encode(self, pcm, n_q: int = 0):
        """Host-side mel features + jitted encode graph (reference:
        codec_x2_encode_graph, xcodec2.cpp:741)."""
        from ..runtime.model import CodecError

        if not self.has_encoder:
            raise CodecError(f"{self.arch}: model has no encoder")
        if n_q not in (0, 1):
            raise CodecError("xcodec2 encode n_q must be 0 or 1")
        pcm = self._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        ec = self.enc_cfg
        outs = []
        for row in pcm:
            mel = w2v_bert_features(
                row, n_mels=ec.mel_n_mels, n_fft=ec.mel_n_fft,
                win=ec.mel_win, hop=ec.mel_hop, sr=self.encode_sample_rate,
                preemphasis=ec.mel_preemphasis, mel_floor=ec.mel_floor,
                stride=ec.mel_stride, mel_filters=self._mel_filters,
                window=self._mel_window)                   # [T_sem, input_dim]
            n_codes = min(len(row) // self.hop_size, mel.shape[0])
            if n_codes <= 0:
                raise CodecError("xcodec2 encode produced no frames")
            fn = self._jitted(
                ("enc", len(row), mel.shape[0], n_codes),
                lambda: lambda p, m: x2_encode_fn(
                    self.enc_params, p, m, n_codes, ec, self.cfg.codebook_dim))
            codes = np.asarray(jax.block_until_ready(
                fn(self._place_f(row[None]), self._place_f(mel[None]))))
            outs.append(np.clip(codes[0], 0, self.codebook_size - 1))
        out = outs[0] if squeeze else np.stack(outs)
        return out

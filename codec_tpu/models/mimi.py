"""Mimi neural audio codec (kyutai/mimi), TPU-native.

Reference behavior: src/models/mimi.cpp (graph builders at
codec_mimi_build_encode:358 / codec_mimi_build_decode:654); weight schema from
scripts/converters/mimi.py. Architecture:

encode: 14-layer causal SEANet frontend (strides 1,1,1,4,1,1,5,1,1,6,1,1,8,1)
        → N-layer causal transformer (RoPE-NEOX + LayerScale, GELU-erf MLP)
        → stride-2 causal-replicate downsample
        → split semantic/acoustic RVQ with input projections (in-graph argmin)
decode: per-group codebook gather-sum + output projections → causal
        ConvTranspose ×2 upsample → decode transformer → mirrored SEANet
        decoder (ELU + causal convs / convtrs) → PCM

TPU design notes:
  - channels-last [B, T, C]; convs via lax.conv_general_dilated (MXU).
  - transformer layers stacked on a leading dim and scanned (one compiled
    body for all layers).
  - whole encode/decode is a single jitted function; shape bucketing makes
    the jit cache play the reference graph-cache role (bucketing.py).
  - the RVQ argmin search runs in-graph (ops/rvq.py), like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, attn, conv, norms, rope, rvq

ENC_STRIDES = (1, 1, 1, 4, 1, 1, 5, 1, 1, 6, 1, 1, 8, 1)
# encoder conv layer indices in the HF/SEANet module list (ELUs interleave)
ENC_CONV_IDS = (0, (1,), 3, (4,), 6, (7,), 9, (10,), 12, 14)
DEC_UP_STRIDES = (8, 6, 5, 4)


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    hop_size: int = 1920
    n_q: int = 32
    n_sem: int = 1
    codebook_size: int = 2048
    codebook_dim: int = 256
    hidden: int = 512
    n_layers: int = 8
    n_heads: int = 8
    head_dim: int = 64
    intermediate: int = 2048
    rope_theta: float = 10000.0
    freq_scale: float = 1.0
    norm_eps: float = 1e-5
    window: Optional[int] = 250   # HF Mimi sliding window (no-op for T<250)
    has_encoder: bool = True
    has_decoder: bool = True

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "MimiConfig":
        scaling = r.get_f32("codec.rope_scaling_factor", 1.0)
        # The reference converter hardcodes codec.n_q=32 regardless of the
        # checkpoint's quantizer count; the reference runtime copes by
        # inferring the effective depth from the tensors present
        # (codec_internal.h:143-152, mimi.cpp:338 clamp). Mirror that:
        # clamp n_q to the codebook layers actually in the file.
        n_q = r.get_i32("codec.n_q", 32)
        layers = {name.rsplit(".", 2)[0]
                  for name in r.tensors
                  if (name.startswith(("q.s.layers.", "q.a.layers."))
                      and name.endswith((".codebook.embed", ".cb.embed")))}
        if 0 < len(layers) < n_q:
            n_q = len(layers)
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=r.get_i32("codec.hop_size", 1920),
            n_q=n_q,
            n_sem=r.get_i32("codec.num_semantic_quantizers", 1),
            codebook_size=r.get_i32("codec.codebook_size", 2048),
            codebook_dim=r.get_i32("codec.codebook_dim", 256),
            hidden=r.get_i32("codec.latent_dim", 512),
            n_layers=r.get_i32("codec.num_hidden_layers", 8),
            n_heads=r.get_i32("codec.num_attention_heads", 8),
            head_dim=r.get_i32("codec.head_dim", 64),
            intermediate=r.get_i32("codec.intermediate_size", 2048),
            rope_theta=r.get_f32("codec.rope_theta", 10000.0),
            freq_scale=1.0 / scaling if scaling > 0 else 1.0,
            window=r.get_i32("codec.attn_window", 250) or None,
            has_encoder=r.get_bool("codec.has_encoder", False),
            has_decoder=r.get_bool("codec.has_decoder", True),
        )


# ---------------------------------------------------------------------------
# Parameter loading
# ---------------------------------------------------------------------------

def _conv_wb(r: GGUFReader, name: str, dtype) -> Dict[str, jax.Array]:
    w = conv.prepare_conv_weight(r.get(f"{name}.w")).astype(dtype)
    b = r.get_or_none(f"{name}.b")
    return {"w": w, "b": jnp.asarray(b).astype(dtype) if b is not None else None}


def _convtr_wb(r: GGUFReader, name: str, dtype) -> Dict[str, jax.Array]:
    w = conv.prepare_convtr_weight(r.get(f"{name}.w")).astype(dtype)
    b = r.get_or_none(f"{name}.b")
    return {"w": w, "b": jnp.asarray(b).astype(dtype) if b is not None else None}


def _stack_transformer(r: GGUFReader, prefix: str, n_layers: int, dtype) -> Dict[str, jax.Array]:
    """Stack per-layer transformer weights on a leading layer dim for lax.scan."""
    names = {
        "inln_w": "inln.w", "inln_b": "inln.b",
        "paln_w": "paln.w", "paln_b": "paln.b",
        "q_w": "attn.q_proj.w", "k_w": "attn.k_proj.w",
        "v_w": "attn.v_proj.w", "o_w": "attn.o_proj.w",
        "fc1_w": "mlp.fc1.w", "fc2_w": "mlp.fc2.w",
        "sa_scale": "sa_ls.scale", "mlp_scale": "mlp_ls.scale",
    }
    out: Dict[str, jax.Array] = {}
    for key, suffix in names.items():
        stacked = np.stack([r.get(f"{prefix}.l{li}.{suffix}") for li in range(n_layers)])
        out[key] = jnp.asarray(stacked).astype(dtype)
    return out


def _load_codebooks(r: GGUFReader, group: str, n: int, dtype) -> jax.Array:
    cbs = []
    for i in range(n):
        cb = r.get_or_none(f"q.{group}.layers.{i}.codebook.embed")
        if cb is None:
            cb = r.get(f"q.{group}.layers.{i}.cb.embed")
        cbs.append(cb)
    return jnp.asarray(np.stack(cbs)).astype(dtype)        # [n, V, d]


def load_mimi_params(r: GGUFReader, cfg: MimiConfig, dtype=jnp.float32) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    n_acu = cfg.n_q - cfg.n_sem
    p["cb_sem"] = _load_codebooks(r, "s", cfg.n_sem, dtype)
    sem_op = r.get_or_none("q.s.op.w")        # decode-only; absent in
    if sem_op is not None:                    # encoder-only GGUFs (qwen3_tts)
        p["sem_op"] = jnp.asarray(sem_op).astype(dtype)
    if n_acu > 0:
        p["cb_acu"] = _load_codebooks(r, "a", n_acu, dtype)
        acu_op = r.get_or_none("q.a.op.w")
        if acu_op is not None:
            p["acu_op"] = jnp.asarray(acu_op).astype(dtype)
    if cfg.has_decoder:
        p["up"] = _convtr_wb(r, "up.cv", dtype)
        p["dtr"] = _stack_transformer(r, "dtr", cfg.n_layers, dtype)
        p["dec_l0"] = _conv_wb(r, "dec.l0.conv", dtype)
        stages = []
        for si, li in enumerate((2, 5, 8, 11)):
            stages.append({
                "tr": _convtr_wb(r, f"dec.l{li}.conv", dtype),
                "r1": _conv_wb(r, f"dec.l{li + 1}.block.1.conv", dtype),
                "r2": _conv_wb(r, f"dec.l{li + 1}.block.3.conv", dtype),
            })
        p["dec_stages"] = stages
        p["dec_l14"] = _conv_wb(r, "dec.l14.conv", dtype)
    if cfg.has_encoder:
        p["enc_l0"] = _conv_wb(r, "enc.l0.conv", dtype)
        stages = []
        for li in (1, 4, 7, 10):
            stages.append({
                "r1": _conv_wb(r, f"enc.l{li}.block.1.conv", dtype),
                "r2": _conv_wb(r, f"enc.l{li}.block.3.conv", dtype),
                "dn": _conv_wb(r, f"enc.l{li + 2}.conv", dtype),
            })
        p["enc_stages"] = stages
        p["enc_l14"] = _conv_wb(r, "enc.l14.conv", dtype)
        p["etr"] = _stack_transformer(r, "etr", cfg.n_layers, dtype)
        p["dn"] = {"w": conv.prepare_conv_weight(r.get("dn.cv.w")).astype(dtype), "b": None}
        p["sem_ip"] = jnp.asarray(r.get("q.s.ip.w")).astype(dtype)
        if n_acu > 0:
            p["acu_ip"] = jnp.asarray(r.get("q.a.ip.w")).astype(dtype)
    return p


# ---------------------------------------------------------------------------
# Forward blocks
# ---------------------------------------------------------------------------

def _ccv1(x: jax.Array, w: jax.Array, b, matmul: Optional[bool] = None
          ) -> jax.Array:
    """Stride-1 causal conv; K shifted MXU matmuls on TPU (XLA's
    convolution runs far off-roofline at SEANet's C/T shapes — see
    models/dac.py numbers)."""
    use_matmul = conv.use_conv_matmul() if matmul is None else matmul
    if use_matmul:
        return conv.conv1d_matmul(x, w, b, padding=(w.shape[0] - 1, 0))
    return conv.conv1d_causal(x, w, b)


def _dec_plan(batch: int) -> Dict[str, bool]:
    """Conv formulation per batch size, measured on v5e (bf16/f32 decode
    stack, T=500 latent frames, round 3):

      b=1  f32 : matmul+subpix, no lane pad   8.05 ms   (lane pad 10.81)
      b=8 bf16 : plain XLA convs everywhere  16.37 ms   (matmul forms 39.0)

    The matmul/sub-pixel forms win when the chip is latency-bound (b=1
    leaves the MXU mostly idle; K dense matmuls beat XLA's conv
    schedule). At b>1 the machine is throughput-bound and the shifted
    activation copies + phase reshapes turn into pure extra HBM traffic —
    XLA's native convolution wins. Trace-time static, keyed on batch.

    Under the "fast" compile plan (tiered jit first tier) the b=1 graph
    uses subpix only: combining matmul+subpix in one graph compiles ~276 s
    on the relay vs ~33 s for either alone (see ops/conv.py compile_plan);
    subpix-only runs 11.6 ms vs the combined plan's 5.7."""
    if not conv.use_conv_matmul():          # CPU / CODEC_NO_CONV_OPT=1
        return {"matmul": False, "subpix": False}
    if batch == 1:
        if conv.plan_mode() == "fast":
            return {"matmul": False, "subpix": True}
        return {"matmul": True, "subpix": True}
    return {"matmul": False, "subpix": False}


def _resblock(x: jax.Array, r1: Dict, r2: Dict) -> jax.Array:
    """SEANet residual block: x + conv1(elu(x)) → elu → conv2
    (reference: codec_mimi_resblock_ggml, mimi.cpp:191-214)."""
    h = act.elu(x)
    h = _ccv1(h, r1["w"], r1["b"])
    h = act.elu(h)
    h = _ccv1(h, r2["w"], r2["b"])
    return x + h


def _transformer(x: jax.Array, tp: Dict[str, jax.Array], cfg: MimiConfig) -> jax.Array:
    """Scan over stacked layers. x: [B, T, C]."""
    rope_fn = partial(rope.apply_rope, theta=cfg.rope_theta,
                      freq_scale=cfg.freq_scale, neox=True)

    def layer(x, lw):
        h = norms.layer_norm(x, lw["inln_w"], lw["inln_b"], cfg.norm_eps)
        a = attn.mha(h, lw["q_w"], lw["k_w"], lw["v_w"], lw["o_w"],
                     n_heads=cfg.n_heads, rope_fn=rope_fn, causal=True,
                     window=cfg.window)
        x = x + a * lw["sa_scale"]
        m = norms.layer_norm(x, lw["paln_w"], lw["paln_b"], cfg.norm_eps)
        m = act.gelu_erf(m @ lw["fc1_w"].T) @ lw["fc2_w"].T
        return x + m * lw["mlp_scale"], None

    x, _ = jax.lax.scan(layer, x, tp)
    return x


def mimi_decode_fn(params: Dict[str, Any], codes: jax.Array, cfg: MimiConfig,
                   n_q: Optional[int] = None) -> jax.Array:
    """codes: [B, T, Q] int32 → pcm [B, T*hop] (reference: codec_mimi_build_decode)."""
    if n_q is None:
        n_q = codes.shape[-1]
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    n_sem = min(cfg.n_sem, n_q)
    x = rvq.rvq_decode_sum(codes[..., :n_sem], params["cb_sem"], n_q=n_sem)
    x = x @ params["sem_op"].T
    if n_q > n_sem:
        a = rvq.rvq_decode_sum(codes[..., n_sem:n_q], params["cb_acu"], n_q=n_q - n_sem)
        x = x + a @ params["acu_op"].T

    plan = _dec_plan(codes.shape[0])
    if plan["subpix"]:
        x = conv.convtr1d_causal_subpixel(x, params["up"]["w"], None, stride=2)
    else:
        x = conv.convtr1d_causal(x, params["up"]["w"], None, stride=2)
    x = _transformer(x, params["dtr"], cfg)

    cv = partial(_ccv1, matmul=plan["matmul"])
    tr = (conv.convtr1d_causal_subpixel if plan["subpix"]
          else conv.convtr1d_causal)
    x = cv(x, params["dec_l0"]["w"], params["dec_l0"]["b"])
    for stage, stride in zip(params["dec_stages"], DEC_UP_STRIDES):
        x = act.elu(x)
        x = tr(x, stage["tr"]["w"], stage["tr"]["b"], stride=stride)
        h = act.elu(x)
        h = cv(h, stage["r1"]["w"], stage["r1"]["b"])
        h = act.elu(h)
        h = cv(h, stage["r2"]["w"], stage["r2"]["b"])
        x = x + h
    x = act.elu(x)
    x = cv(x, params["dec_l14"]["w"], params["dec_l14"]["b"])
    return x[..., 0]                                      # [B, T*hop]


def mimi_encode_fn(params: Dict[str, Any], pcm: jax.Array, cfg: MimiConfig,
                   n_q: Optional[int] = None, n_valid=None) -> jax.Array:
    """pcm: [B, n] float32 → codes [B, ceil(n/hop), n_q]
    (reference: codec_mimi_build_encode, mimi.cpp:358-613).

    `n_valid` (traced scalar, defaults to the full static length) is the
    true sample count before the bucket zero-pad. The reference pads
    PER LAYER — each strided conv right-pads its own input to a stride
    multiple with zeros (src/ops/conv1d.cpp:179), and the final stride-2
    downsample replicate-pads — so activations beyond the valid length
    must be re-zeroed before each strided conv (upfront zero-padding
    alone leaks bias-propagated garbage into the last partial frame's
    window; caught by tests/test_mimi_fullsize.py). Frame-aligned inputs
    keep every valid window short of the mask, so this is behavior-
    neutral for them."""
    if n_q is None:
        n_q = cfg.n_q
    if n_valid is None:
        n_valid = pcm.shape[-1]
    # same lane-pad + matmul-form treatment as decode (the C=64/32 early
    # stages at full audio rate are the bandwidth-heavy part); strided
    # downsample convs stay on XLA's convolution, with their cin rows
    # padded to consume the padded activations
    to = conv.lane_pad()
    P = lambda a, ax: conv.pad_channels(a, ax, to)

    def mask_invalid(a, v):
        t = jnp.arange(a.shape[1])[None, :, None]
        return jnp.where(t < v, a, jnp.zeros((), a.dtype))

    v = n_valid
    x = pcm[..., None]                                     # [B, n, 1]
    x = _ccv1(x, P(params["enc_l0"]["w"], 2), P(params["enc_l0"]["b"], 0))
    for stage, stride in zip(params["enc_stages"], (4, 5, 6, 8)):
        h = act.elu(x)
        h = _ccv1(h, P(P(stage["r1"]["w"], 1), 2), P(stage["r1"]["b"], 0))
        h = act.elu(h)
        h = _ccv1(h, P(P(stage["r2"]["w"], 1), 2), P(stage["r2"]["b"], 0))
        x = x + h
        x = act.elu(x)
        x = mask_invalid(x, v)             # per-layer ceil zero pad
        x = conv.conv1d_causal(x, P(P(stage["dn"]["w"], 1), 2),
                               P(stage["dn"]["b"], 0), stride=stride)
        v = (v + stride - 1) // stride
    x = act.elu(x)
    x = _ccv1(x, P(params["enc_l14"]["w"], 1), params["enc_l14"]["b"])

    x = _transformer(x, params["etr"], cfg)
    # the downsample's extra pad REPLICATES the last valid frame
    # (HF MimiConv1d pad_mode="replicate"); clamp-gather implements it
    idx = jnp.minimum(jnp.arange(x.shape[1]), v - 1)
    x = jnp.take(x, idx, axis=1)
    x = conv.conv1d_causal(x, params["dn"]["w"], None, stride=2, pad_mode="replicate")

    n_sem = min(cfg.n_sem, n_q)
    sem = x @ params["sem_ip"].T
    sem_codes = rvq.rvq_encode(sem, params["cb_sem"][:n_sem])
    parts = [sem_codes]
    if n_q > n_sem:
        acu = x @ params["acu_ip"].T
        parts.append(rvq.rvq_encode(acu, params["cb_acu"][: n_q - n_sem]))
    return jnp.concatenate(parts, axis=-1)                 # [B, T, n_q]


# ---------------------------------------------------------------------------
# Streaming (chunked) decode
# ---------------------------------------------------------------------------
# The reference decodes whole sequences per call; frame-level streaming is
# the TPU-native upgrade (SURVEY §7 "hard parts"): carried causal-conv
# tails + a sliding-window KV cache make chunked decode bit-identical to a
# full-sequence call, with one compiled step graph per chunk size.
# (On TPU, matmuls outside the HIGHEST-pinned RVQ scores run at DEFAULT
# precision, so chunked-vs-full latents can differ by float-reorder noise;
# with random bench weights that flips a few near-tie encode codes, while
# CPU parity-fixture tests are bit-exact and trained checkpoints have wide
# argmin margins. Measured v5e steady state: decode 2.8 ms and encode
# 1.35 ms per 80 ms frame.)

def _transformer_stream(x: jax.Array, tp: Dict[str, jax.Array],
                        cfg: MimiConfig, kv: jax.Array, pos0: jax.Array):
    """x: [B, Tc, C]; kv: [L, 2, B, H, W-1, Dh] (post-rope keys / values for
    the last window-1 absolute positions; slots for negative positions are
    masked). Returns (y, new_kv)."""
    b, tc, c = x.shape
    w1 = kv.shape[4]
    d = cfg.head_dim
    qpos = pos0 + jnp.arange(tc)
    kpos = pos0 - w1 + jnp.arange(w1 + tc)
    ok = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] >= 0)
    if cfg.window:
        ok &= kpos[None, :] > qpos[:, None] - cfg.window
    mask = jnp.where(ok, 0.0, -1e30)

    def layer(xb, inp):
        lw, kv_l = inp
        h = norms.layer_norm(xb, lw["inln_w"], lw["inln_b"], cfg.norm_eps)
        q = (h @ lw["q_w"].T).reshape(b, tc, cfg.n_heads, d).transpose(0, 2, 1, 3)
        k = (h @ lw["k_w"].T).reshape(b, tc, cfg.n_heads, d).transpose(0, 2, 1, 3)
        v = (h @ lw["v_w"].T).reshape(b, tc, cfg.n_heads, d).transpose(0, 2, 1, 3)
        q = rope.apply_rope(q, positions=qpos, theta=cfg.rope_theta,
                            freq_scale=cfg.freq_scale, neox=True)
        k = rope.apply_rope(k, positions=qpos, theta=cfg.rope_theta,
                            freq_scale=cfg.freq_scale, neox=True)
        k_ctx = jnp.concatenate([kv_l[0], k], axis=2)
        v_ctx = jnp.concatenate([kv_l[1], v], axis=2)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_ctx,
                            preferred_element_type=jnp.float32)
        logits = logits * (d ** -0.5) + mask[None, None]
        wts = jax.nn.softmax(logits.astype(jnp.float32),
                             axis=-1).astype(v_ctx.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", wts, v_ctx)
        a = ctx.transpose(0, 2, 1, 3).reshape(b, tc, cfg.n_heads * d) @ lw["o_w"].T
        xb = xb + a * lw["sa_scale"]
        m = norms.layer_norm(xb, lw["paln_w"], lw["paln_b"], cfg.norm_eps)
        m = act.gelu_erf(m @ lw["fc1_w"].T) @ lw["fc2_w"].T
        xb = xb + m * lw["mlp_scale"]
        kv_new = jnp.stack([k_ctx[:, :, -w1:], v_ctx[:, :, -w1:]])
        return xb, kv_new

    x, kv = jax.lax.scan(layer, x, (tp, kv))
    return x, kv


def mimi_decode_stream_init(params: Dict[str, Any], cfg: MimiConfig,
                            batch: int = 1, dtype=jnp.float32) -> Dict[str, Any]:
    """Zero state for chunked decode (reference has no streaming analog)."""
    def cst(layer, stride=1):
        k, cin = layer["w"].shape[0], layer["w"].shape[1]
        return conv.conv1d_causal_stream_init(batch, cin, k, stride, dtype=dtype)

    def tst(layer, stride):
        k, cout = layer["w"].shape[0], layer["w"].shape[2]
        return conv.convtr1d_causal_stream_init(batch, cout, k, stride, dtype=dtype)

    w1 = (cfg.window or 1) - 1
    return {
        "pos": jnp.zeros((), jnp.int32),
        "up": tst(params["up"], 2),
        "kv": jnp.zeros((cfg.n_layers, 2, batch, cfg.n_heads, w1,
                         cfg.head_dim), dtype),
        "l0": cst(params["dec_l0"]),
        "stages": [{"tr": tst(s["tr"], st),
                    "r1": cst(s["r1"]), "r2": cst(s["r2"])}
                   for s, st in zip(params["dec_stages"], DEC_UP_STRIDES)],
        "l14": cst(params["dec_l14"]),
    }


def mimi_decode_stream_step(params: Dict[str, Any], state: Dict[str, Any],
                            codes: jax.Array, cfg: MimiConfig,
                            n_q: Optional[int] = None):
    """codes [B, Tc, Q] → (pcm [B, Tc*hop], new state). Chunk-exact vs
    mimi_decode_fn on the concatenated stream."""
    if n_q is None:
        n_q = codes.shape[-1]
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    n_sem = min(cfg.n_sem, n_q)
    x = rvq.rvq_decode_sum(codes[..., :n_sem], params["cb_sem"], n_q=n_sem)
    x = x @ params["sem_op"].T
    if n_q > n_sem:
        a = rvq.rvq_decode_sum(codes[..., n_sem:n_q], params["cb_acu"],
                               n_q=n_q - n_sem)
        x = x + a @ params["acu_op"].T

    ns = {"stages": []}
    x, ns["up"] = conv.convtr1d_causal_stream(x, params["up"]["w"], None,
                                              state["up"], stride=2)
    x, ns["kv"] = _transformer_stream(x, params["dtr"], cfg, state["kv"],
                                      state["pos"])
    ns["pos"] = state["pos"] + x.shape[1]
    x, ns["l0"] = conv.conv1d_causal_stream(x, params["dec_l0"]["w"],
                                            params["dec_l0"]["b"], state["l0"])
    for st, (stage, stride) in zip(state["stages"],
                                   zip(params["dec_stages"], DEC_UP_STRIDES)):
        nst = {}
        x = act.elu(x)
        x, nst["tr"] = conv.convtr1d_causal_stream(
            x, stage["tr"]["w"], stage["tr"]["b"], st["tr"], stride=stride)
        h = act.elu(x)
        h, nst["r1"] = conv.conv1d_causal_stream(h, stage["r1"]["w"],
                                                 stage["r1"]["b"], st["r1"])
        h = act.elu(h)
        h, nst["r2"] = conv.conv1d_causal_stream(h, stage["r2"]["w"],
                                                 stage["r2"]["b"], st["r2"])
        x = x + h
        ns["stages"].append(nst)
    x = act.elu(x)
    x, ns["l14"] = conv.conv1d_causal_stream(x, params["dec_l14"]["w"],
                                             params["dec_l14"]["b"], state["l14"])
    return x[..., 0], ns


def mimi_encode_stream_init(params: Dict[str, Any], cfg: MimiConfig,
                            batch: int = 1, dtype=jnp.float32) -> Dict[str, Any]:
    """Zero state for chunked encode (chunks of a multiple of hop_size)."""
    def cst(layer, stride=1):
        k, cin = layer["w"].shape[0], layer["w"].shape[1]
        return conv.conv1d_causal_stream_init(batch, cin, k, stride, dtype=dtype)

    w1 = (cfg.window or 1) - 1
    return {
        "pos": jnp.zeros((), jnp.int32),
        "l0": cst(params["enc_l0"]),
        "stages": [{"r1": cst(s["r1"]), "r2": cst(s["r2"]),
                    "dn": cst(s["dn"], st)}
                   for s, st in zip(params["enc_stages"], (4, 5, 6, 8))],
        "l14": cst(params["enc_l14"]),
        "kv": jnp.zeros((cfg.n_layers, 2, batch, cfg.n_heads, w1,
                         cfg.head_dim), dtype),
        "dn": cst(params["dn"], 2),
    }


def mimi_encode_stream_step(params: Dict[str, Any], state: Dict[str, Any],
                            pcm: jax.Array, cfg: MimiConfig,
                            n_q: Optional[int] = None):
    """pcm [B, Tc] (Tc a multiple of hop_size) → (codes [B, Tc/hop, n_q],
    new state). Chunk-exact vs mimi_encode_fn."""
    if n_q is None:
        n_q = cfg.n_q
    x = pcm[..., None]
    ns: Dict[str, Any] = {"stages": []}
    x, ns["l0"] = conv.conv1d_causal_stream(x, params["enc_l0"]["w"],
                                            params["enc_l0"]["b"], state["l0"])
    for st, (stage, stride) in zip(state["stages"],
                                   zip(params["enc_stages"], (4, 5, 6, 8))):
        nst = {}
        h = act.elu(x)
        h, nst["r1"] = conv.conv1d_causal_stream(h, stage["r1"]["w"],
                                                 stage["r1"]["b"], st["r1"])
        h = act.elu(h)
        h, nst["r2"] = conv.conv1d_causal_stream(h, stage["r2"]["w"],
                                                 stage["r2"]["b"], st["r2"])
        x = x + h
        x = act.elu(x)
        x, nst["dn"] = conv.conv1d_causal_stream(x, stage["dn"]["w"],
                                                 stage["dn"]["b"], st["dn"],
                                                 stride=stride)
        ns["stages"].append(nst)
    x = act.elu(x)
    x, ns["l14"] = conv.conv1d_causal_stream(x, params["enc_l14"]["w"],
                                             params["enc_l14"]["b"], state["l14"])

    x, ns["kv"] = _transformer_stream(x, params["etr"], cfg, state["kv"],
                                      state["pos"])
    ns["pos"] = state["pos"] + x.shape[1]
    x, ns["dn"] = conv.conv1d_causal_stream_replicate(
        x, params["dn"]["w"], None, state["dn"], state["pos"] == 0, stride=2)

    n_sem = min(cfg.n_sem, n_q)
    sem = x @ params["sem_ip"].T
    parts = [rvq.rvq_encode(sem, params["cb_sem"][:n_sem])]
    if n_q > n_sem:
        acu = x @ params["acu_ip"].T
        parts.append(rvq.rvq_encode(acu, params["cb_acu"][: n_q - n_sem]))
    return jnp.concatenate(parts, axis=-1), ns

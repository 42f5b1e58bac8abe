"""DAC (Descript Audio Codec), TPU-native.

Reference behavior: src/models/dac.cpp (decode graph at
codec_dac_build_decode:~474, encode at ~788); weight schema from
scripts/converters/dac.py. Architecture:

encode: conv k7 (symmetric pad) → 4 blocks [3 residual units (snake,
        dilated conv k7 d∈{1,3,9}, snake, conv k1) → snake → strided conv
        k=2s pad=ceil(s/2)] → snake → conv k3 → latent
        → residual VQ: per layer in_proj 1x1 → cosine (L2-normalized)
        nearest-code search → residual -= out_proj(codebook[idx])
decode: latent = Σ_q out_proj_q(codebook_q[codes_q]) (+biases) → conv k7 →
        4 blocks [snake → convtr k=2s pad=ceil(s/2) → 3 res units] →
        snake → conv k7 → tanh

DAC is NON-causal (symmetric padding), so CodecModel runs it without shape
bucketing (exact-length jit cache entries; `causal_time = False`).
All VQ layers share shapes → stacked codebooks/projections + lax.scan.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, conv, norms, seanet_pallas
from ..runtime.model import CodecModel

RES_DILATIONS = (1, 3, 9)


@dataclass(frozen=True)
class DacConfig:
    sample_rate: int = 24000
    hop_size: int = 320
    n_q: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    latent_dim: int = 1024
    n_blocks: int = 4

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "DacConfig":
        return cls(
            sample_rate=r.get_i32("codec.sample_rate", 24000),
            hop_size=r.get_i32("codec.hop_size", 320),
            n_q=r.get_i32("codec.n_q", 9),
            codebook_size=r.get_i32("codec.codebook_size", 1024),
            codebook_dim=r.get_i32("codec.codebook_dim", 8),
            latent_dim=r.get_i32("codec.latent_dim", 1024),
        )


def _conv_wb(r: GGUFReader, wname: str, dtype) -> Dict[str, Any]:
    w = r.get(wname + ".weight")
    b = r.get_or_none(wname + ".bias")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _convtr_wb(r: GGUFReader, wname: str, dtype) -> Dict[str, Any]:
    w = r.get(wname + ".weight")                      # torch (in, out, k)
    b = r.get_or_none(wname + ".bias")
    return {"w": conv.prepare_convtr_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def _alpha(r: GGUFReader, name: str, dtype) -> jax.Array:
    a = np.asarray(r.get(name)).reshape(-1)           # (1, C, 1) → [C]
    return jnp.asarray(a).astype(dtype)


def load_dac_params(r: GGUFReader, cfg: DacConfig, dtype=jnp.float32) -> Dict[str, Any]:
    p: Dict[str, Any] = {}

    # --- quantizer stacks [n_q, ...] --------------------------------------
    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(np.stack([transform(np.asarray(r.get(fmt.format(qi))))
                                     for qi in range(cfg.n_q)])).astype(dtype)

    def squeeze_k1(a):
        return a[:, :, 0] if a.ndim == 3 else a       # 1x1 conv → linear (out, in)

    p["vq"] = {
        "cb": stack("vq.q{}.codebook.weight"),                      # [n_q, V, d]
        "in_w": stack("vq.q{}.in_proj.weight", squeeze_k1),         # [n_q, d, hidden]
        "in_b": stack("vq.q{}.in_proj.bias"),
        "out_w": stack("vq.q{}.out_proj.weight", squeeze_k1),       # [n_q, hidden, d]
        "out_b": stack("vq.q{}.out_proj.bias"),
    }

    # --- decoder ----------------------------------------------------------
    p["dec_c1"] = _conv_wb(r, "dec.model.0", dtype)
    blocks = []
    for bi in range(1, cfg.n_blocks + 1):
        pre = f"dec.model.{bi}.block"
        blk = {
            "snake": _alpha(r, f"{pre}.snake1.alpha", dtype),
            "tr": _convtr_wb(r, f"{pre}.conv_t1", dtype),
            "units": [],
        }
        for ri in (1, 2, 3):
            blk["units"].append({
                "s1": _alpha(r, f"{pre}.res_unit{ri}.snake1.alpha", dtype),
                "c1": _conv_wb(r, f"{pre}.res_unit{ri}.conv1", dtype),
                "s2": _alpha(r, f"{pre}.res_unit{ri}.snake2.alpha", dtype),
                "c2": _conv_wb(r, f"{pre}.res_unit{ri}.conv2", dtype),
            })
        blocks.append(blk)
    p["dec_blocks"] = blocks
    p["dec_snake"] = _alpha(r, f"dec.model.{cfg.n_blocks + 1}.alpha", dtype)
    p["dec_c2"] = _conv_wb(r, f"dec.model.{cfg.n_blocks + 2}", dtype)

    # --- encoder ----------------------------------------------------------
    if r.has_tensor("enc.block.0.weight"):
        p["enc_c1"] = _conv_wb(r, "enc.block.0", dtype)
        eblocks = []
        for bi in range(1, cfg.n_blocks + 1):
            pre = f"enc.block.{bi}.block"
            blk = {"units": []}
            for ri in (1, 2, 3):
                blk["units"].append({
                    "s1": _alpha(r, f"{pre}.res_unit{ri}.snake1.alpha", dtype),
                    "c1": _conv_wb(r, f"{pre}.res_unit{ri}.conv1", dtype),
                    "s2": _alpha(r, f"{pre}.res_unit{ri}.snake2.alpha", dtype),
                    "c2": _conv_wb(r, f"{pre}.res_unit{ri}.conv2", dtype),
                })
            blk["snake"] = _alpha(r, f"{pre}.snake1.alpha", dtype)
            blk["dn"] = _conv_wb(r, f"{pre}.conv1", dtype)
            eblocks.append(blk)
        p["enc_blocks"] = eblocks
        p["enc_snake"] = _alpha(r, f"enc.block.{cfg.n_blocks + 1}.alpha", dtype)
        p["enc_c2"] = _conv_wb(r, f"enc.block.{cfg.n_blocks + 2}", dtype)
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _sym_conv(x, layer, stride=1, dilation=1):
    """Symmetric-pad conv: pad (k_eff//2, matching torch Conv1d padding)."""
    k = layer["k"]
    pad = ((k - 1) * dilation) // 2 if dilation > 1 else None
    # torch uses explicit padding value; reference passes kernel//2 for k odd,
    # (stride+1)//2 for strided downsample convs.
    if pad is None:
        pad = (stride + 1) // 2 if stride > 1 else k // 2
    if stride == 1 and conv.use_conv_matmul():
        # K shifted MXU matmuls instead of XLA's convolution (which runs
        # ~20x off-roofline at DAC's C/T shapes, tools/conv_micro.py)
        return conv.conv1d_matmul(x, layer["w"], layer["b"],
                                  dilation=dilation, padding=pad)
    return conv.conv1d(x, layer["w"], layer["b"], stride=stride, dilation=dilation,
                       padding=pad)


def _res_unit(x, u, dilation, lane_pad: int = 1):
    k = u["c1"]["k"]
    c = x.shape[-1]                                   # already lane-padded
    w1 = _pad_ch(_pad_ch(u["c1"]["w"], 1, lane_pad), 2, lane_pad)
    w2 = _pad_ch(_pad_ch(u["c2"]["w"], 1, lane_pad), 2, lane_pad)
    s1 = _pad_ch(u["s1"], 0, lane_pad, 1.0)
    s2 = _pad_ch(u["s2"], 0, lane_pad, 1.0)
    b1 = _pad_ch(u["c1"]["b"], 0, lane_pad)
    b2 = _pad_ch(u["c2"]["b"], 0, lane_pad)
    if (u["c2"]["k"] == 1 and b1 is not None and b2 is not None
            and seanet_pallas.use_fused_unit(x.shape[1], c, k)):
        # fused Pallas unit: one HBM read + write for the whole
        # snake→conv_k7→snake→conv_k1→+x chain (numbers: seanet_pallas.py)
        return seanet_pallas.seanet_res_unit(
            x, s1, w1, b1, s2, w2[0], b2, dilation=dilation,
            t_blk=seanet_pallas.pick_t_blk(c))
    cv = (conv.conv1d_matmul if conv.use_conv_matmul()
          else functools.partial(conv.conv1d, stride=1))
    h = act.snake(x, s1)
    h = cv(h, w1, b1, dilation=dilation, padding=((k - 1) * dilation) // 2)
    h = act.snake(h, s2)
    h = cv(h, w2, b2)
    return x + h


def _res_units(x, units, lane_pad: int):
    """A block's residual units: one chained Pallas kernel (single HBM
    read+write for all of them) when the stacked weights fit VMEM, else
    per-unit dispatch."""
    c = x.shape[-1]
    k = units[0]["c1"]["k"]
    chainable = (
        len(units) == len(RES_DILATIONS)
        and all(u["c1"]["k"] == k and u["c2"]["k"] == 1
                and u["c1"]["b"] is not None and u["c2"]["b"] is not None
                for u in units)
        and seanet_pallas.use_fused_chain(x.shape[1], c, k, len(units)))
    if not chainable:
        for u, d in zip(units, RES_DILATIONS):
            x = _res_unit(x, u, d, lane_pad)
        return x
    pc = functools.partial(_pad_ch, to=lane_pad)
    return seanet_pallas.seanet_res_chain(
        x,
        jnp.stack([pc(pc(u["c1"]["w"], 1), 2) for u in units]),
        jnp.stack([pc(u["c1"]["b"], 0) for u in units]),
        jnp.stack([pc(u["s1"], 0, value=1.0) for u in units]),
        jnp.stack([pc(u["s2"], 0, value=1.0) for u in units]),
        jnp.stack([pc(pc(u["c2"]["w"], 1), 2)[0] for u in units]),
        jnp.stack([pc(u["c2"]["b"], 0) for u in units]),
        dilations=RES_DILATIONS, t_blk=seanet_pallas.pick_t_blk(c))


def dac_latent_from_codes(vq: Dict[str, jax.Array], codes: jax.Array,
                          n_q: int) -> jax.Array:
    """codes [B, T, Q] → latent [B, T, hidden]: Σ_q out_proj_q(cb_q[idx]) + b."""
    # gather rows per level then one [B,T,q·d] @ [q·d, hidden] matmul
    # (a one-hot einsum materialized [B,T,q,V] and ran ~10x slower on TPU)
    emb = jax.vmap(lambda cb, idx: jnp.take(cb, idx, axis=0),
                   in_axes=(0, 2))(vq["cb"][:n_q], codes[..., :n_q])
    b, t = codes.shape[:2]
    d = vq["cb"].shape[-1]
    emb = jnp.moveaxis(emb, 0, -2).reshape(b, t, n_q * d)          # [B,T,q·d]
    w = jnp.swapaxes(vq["out_w"][:n_q], 1, 2).reshape(n_q * d, -1)  # [q·d, h]
    return emb @ w + jnp.sum(vq["out_b"][:n_q], axis=0)


def _pad_ch(a: Optional[jax.Array], axis: int, to: int,
            value: float = 0.0) -> Optional[jax.Array]:
    """Zero/const-pad one axis of a weight tensor up to a multiple of `to`."""
    if a is None:
        return None
    p = (-a.shape[axis]) % to
    if p == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, p)
    return jnp.pad(a, widths, constant_values=value)


def _lane_pad() -> int:
    """Channel padding multiple for the decode stack.

    TPU DMA and vector registers tile the trailing (lane) dim by 128; a
    pure Pallas copy at C=96 lanes measured 15% of HBM peak vs aligned
    lanes (tools/resunit_dissect.py). Padding WEIGHTS to 128-multiples at
    trace time makes every activation born aligned — zero-lane channels
    carry exact zeros through snake (alpha pad 1.0), convs (zero rows/
    cols), and residuals, so outputs are bit-identical."""
    return 128 if jax.default_backend() == "tpu" else 1


def dac_decode_from_latent(params: Dict[str, Any], latent: jax.Array,
                           cfg: DacConfig) -> jax.Array:
    """latent [B, T, hidden] → pcm [B, T*hop] (reference: codec_dac_build_decode)."""
    to = _lane_pad()
    x = _sym_conv(latent, params["dec_c1"])          # C 1536 (aligned)
    for blk in params["dec_blocks"]:
        x = act.snake(x, _pad_ch(blk["snake"], 0, to, 1.0))
        k = blk["tr"]["k"]
        s = k // 2
        # sub-pixel (phase-matmul) transposed conv: 1.0-2.5x over XLA's
        # lhs_dilation conv at these shapes on v5e (tools/convtr_micro.py);
        # cin rows match x's padded lanes, cout cols pad the next stage
        w_tr = _pad_ch(_pad_ch(blk["tr"]["w"], 1, to), 2, to)
        x = conv.convtr1d_subpixel(x, w_tr, _pad_ch(blk["tr"]["b"], 0, to),
                                   stride=s, padding=(s + 1) // 2)
        x = _res_units(x, blk["units"], to)
    x = act.snake(x, _pad_ch(params["dec_snake"], 0, to, 1.0))
    c2 = dict(params["dec_c2"], w=_pad_ch(params["dec_c2"]["w"], 1, to))
    x = _sym_conv(x, c2)
    return jnp.tanh(x[..., 0])


def dac_decode_fn(params: Dict[str, Any], codes: jax.Array, cfg: DacConfig,
                  n_q: Optional[int] = None) -> jax.Array:
    if n_q is None:
        n_q = codes.shape[-1]
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    latent = dac_latent_from_codes(params["vq"], codes, n_q)
    return dac_decode_from_latent(params, latent, cfg)


def dac_encode_latent_fn(params: Dict[str, Any], pcm: jax.Array,
                         cfg: DacConfig) -> jax.Array:
    """pcm [B, n] → pre-VQ latent [B, n/hop, latent_dim]."""
    x = pcm[..., None]
    x = _sym_conv(x, params["enc_c1"])
    for blk in params["enc_blocks"]:
        for u, d in zip(blk["units"], RES_DILATIONS):
            x = _res_unit(x, u, d)
        x = act.snake(x, blk["snake"])
        k = blk["dn"]["k"]
        x = _sym_conv(x, blk["dn"], stride=k // 2)
    x = act.snake(x, params["enc_snake"])
    x = _sym_conv(x, params["enc_c2"])
    return x


def dac_encode_fn(params: Dict[str, Any], pcm: jax.Array, cfg: DacConfig,
                  n_q: Optional[int] = None) -> jax.Array:
    """Full encode: latent → cosine-RVQ codes [B, T, n_q]
    (reference: dac.cpp:866-925 — normalized search, raw-codebook residual)."""
    if n_q is None:
        n_q = cfg.n_q
    x = dac_encode_latent_fn(params, pcm, cfg)
    vq = params["vq"]

    def body(residual, q):
        z = residual @ jnp.swapaxes(q["in_w"], -1, -2) + q["in_b"]   # [B,T,d]
        zn = norms.l2_normalize(z)
        cbn = norms.l2_normalize(q["cb"])
        scores = 2.0 * jnp.einsum("btd,vd->btv", zn, cbn,
                                  preferred_element_type=jnp.float32)
        scores = scores - jnp.sum(jnp.square(cbn.astype(jnp.float32)), axis=-1)
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        zq = jnp.take(q["cb"], idx, axis=0)                           # [B,T,d]
        proj = zq @ jnp.swapaxes(q["out_w"], -1, -2) + q["out_b"]     # [B,T,h]
        return residual - proj, idx

    _, codes = jax.lax.scan(body, x, jax.tree_util.tree_map(lambda a: a[:n_q], vq))
    return jnp.moveaxis(codes, 0, -1)


class DacCodec(CodecModel):
    arch = "dac"
    causal_time = False

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = DacConfig.from_gguf(reader)
        self.params = load_dac_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.latent_dim
        self.has_encoder = "enc_c1" in self.params
        self.has_decoder = True

    def _decode_impl(self, codes: jax.Array, n_q: int) -> jax.Array:
        return dac_decode_fn(self.params, codes, self.cfg, n_q=n_q)

    def _encode_impl(self, pcm: jax.Array, n_q: int) -> jax.Array:
        return dac_encode_fn(self.params, pcm, self.cfg, n_q=n_q)

    def decode_latent(self, latent, pcm_format: str = "f32") -> np.ndarray:
        """Continuous-latent decode (reference vtable decode_latent,
        dac.cpp:1138-1150). latent: [T, latent_dim] or [B, T, latent_dim]."""
        latent = np.asarray(latent, dtype=np.float32)
        squeeze = latent.ndim == 2
        if squeeze:
            latent = latent[None]
        pcm = self._run_batched(
            ("dec_lat",),
            lambda: lambda z: dac_decode_from_latent(self.params, z, self.cfg),
            latent, pcm_format=pcm_format)
        return pcm[0] if squeeze else pcm

"""WavTokenizer (novateur/WavTokenizer-large), TPU-native.

Reference behavior: src/models/wavtokenizer.cpp — decode graph at
codec_wt_build_decode:241 (codebook sum → embed conv → diffusion pos_net →
[ada]LayerNorm → ConvNeXt backbone → final LN → ISTFT head), encode at
codec_wt_build_encode:684 (EnCodec encoder: reflect-pad convs, resblocks
with conv shortcuts, 2-layer skip LSTM, final conv → single-codebook
euclidean VQ). Weight schema from scripts/converters/wavtokenizer.py
(compressed names: dec.bb.cnx.*, dec.bb.fln.*, vq.vq.layers.*).

TPU notes: the reference computes the iSTFT on CPU outside the graph; here
it is in-graph (ops/istft.py) so decode is one jitted program. The LSTM is
a lax.scan. Reflect padding is non-causal → exact-length jit cache.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, blocks, conv, norms, rvq
from ..ops.istft import istft_from_head
from ..runtime.model import CodecModel

ENC_STRIDES = (2, 4, 5, 8)
ENC_KERNELS = (4, 8, 10, 16)


@dataclass(frozen=True)
class WtConfig:
    sample_rate: int = 24000
    hop_size: int = 320
    n_q: int = 1
    codebook_size: int = 4096
    codebook_dim: int = 512
    backbone_dim: int = 768
    n_convnext: int = 12
    use_adanorm: bool = True
    use_pos_net: bool = True
    head_out_dim: int = 1282


def _cw(r: GGUFReader, name: str, dtype) -> Dict[str, Any]:
    w = r.get(name + ".weight")
    b = r.get_or_none(name + ".bias")
    return {"w": conv.prepare_conv_weight(w).astype(dtype),
            "b": jnp.asarray(b).astype(dtype) if b is not None else None,
            "k": w.shape[2]}


def load_wt_params(r: GGUFReader, dtype=jnp.float32):
    cbs = []
    qi = 0
    while True:
        cb = r.get_or_none(f"vq.vq.layers.{qi}._codebook.embed")
        if cb is None:
            cb = r.get_or_none(f"vq.vq.layers.{qi}.codebook.embed")
        if cb is None:
            break
        cbs.append(cb)
        qi += 1
    if not cbs:
        raise ValueError("no WavTokenizer codebooks found")
    codebooks = jnp.asarray(np.stack(cbs)).astype(dtype)   # [n_q, V, d]

    use_adanorm = r.has_tensor("dec.bb.norm.scale.weight")
    use_pos_net = r.has_tensor("dec.bb.pos_net.0.norm1.weight")
    head_w = r.get("dec.head.out.weight")

    def norm_row0(scale_name, shift_name, plain_w, plain_b):
        if use_adanorm:
            return (jnp.asarray(r.get(scale_name)[0]).astype(dtype),
                    jnp.asarray(r.get(shift_name)[0]).astype(dtype))
        return (jnp.asarray(r.get(plain_w)).astype(dtype),
                jnp.asarray(r.get(plain_b)).astype(dtype))

    p: Dict[str, Any] = {"cb": codebooks}
    p["embed"] = _cw(r, "dec.bb.embed", dtype)

    if use_pos_net:
        pn: Dict[str, Any] = {"res": []}
        for li in (0, 1, 3, 4):
            pre = f"dec.bb.pos_net.{li}"
            pn["res"].append({
                "n1_w": jnp.asarray(r.get(f"{pre}.norm1.weight")).astype(dtype),
                "n1_b": jnp.asarray(r.get(f"{pre}.norm1.bias")).astype(dtype),
                "c1_w": conv.prepare_conv_weight(r.get(f"{pre}.conv1.weight")).astype(dtype),
                "c1_b": jnp.asarray(r.get(f"{pre}.conv1.bias")).astype(dtype),
                "n2_w": jnp.asarray(r.get(f"{pre}.norm2.weight")).astype(dtype),
                "n2_b": jnp.asarray(r.get(f"{pre}.norm2.bias")).astype(dtype),
                "c2_w": conv.prepare_conv_weight(r.get(f"{pre}.conv2.weight")).astype(dtype),
                "c2_b": jnp.asarray(r.get(f"{pre}.conv2.bias")).astype(dtype),
            })
        pa = "dec.bb.pos_net.2"
        pn["attn"] = {
            "n_w": jnp.asarray(r.get(f"{pa}.norm.weight")).astype(dtype),
            "n_b": jnp.asarray(r.get(f"{pa}.norm.bias")).astype(dtype),
            **{f"{k}_w": jnp.asarray(r.get(f"{pa}.{n}.weight")).astype(dtype)
               for k, n in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "proj_out"))},
            **{f"{k}_b": jnp.asarray(r.get(f"{pa}.{n}.bias")).astype(dtype)
               for k, n in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "proj_out"))},
        }
        pn["gn_w"] = jnp.asarray(r.get("dec.bb.pos_net.5.weight")).astype(dtype)
        pn["gn_b"] = jnp.asarray(r.get("dec.bb.pos_net.5.bias")).astype(dtype)
        p["pos_net"] = pn

    p["inln"] = norm_row0("dec.bb.norm.scale.weight", "dec.bb.norm.shift.weight",
                          "dec.bb.norm.weight", "dec.bb.norm.bias")

    cnx = []
    li = 0
    while r.has_tensor(f"dec.bb.cnx.{li}.dwconv.weight"):
        pre = f"dec.bb.cnx.{li}"
        lnw, lnb = norm_row0(f"{pre}.norm.scale.weight", f"{pre}.norm.shift.weight",
                             f"{pre}.norm.weight", f"{pre}.norm.bias")
        cnx.append({
            "dw_w": conv.prepare_conv_weight(r.get(f"{pre}.dwconv.weight")).astype(dtype),
            "dw_b": jnp.asarray(r.get(f"{pre}.dwconv.bias")).astype(dtype),
            "ln_w": lnw, "ln_b": lnb,
            "pw1_w": jnp.asarray(r.get(f"{pre}.pwconv1.weight")).astype(dtype),
            "pw1_b": jnp.asarray(r.get(f"{pre}.pwconv1.bias")).astype(dtype),
            "pw2_w": jnp.asarray(r.get(f"{pre}.pwconv2.weight")).astype(dtype),
            "pw2_b": jnp.asarray(r.get(f"{pre}.pwconv2.bias")).astype(dtype),
            "gamma": (jnp.asarray(r.get(f"{pre}.gamma")).astype(dtype)
                      if r.has_tensor(f"{pre}.gamma") else None),
        })
        li += 1
    p["cnx"] = cnx
    p["fln_w"] = jnp.asarray(r.get("dec.bb.fln.weight")).astype(dtype)
    p["fln_b"] = jnp.asarray(r.get("dec.bb.fln.bias")).astype(dtype)
    p["head_w"] = jnp.asarray(head_w).astype(dtype)
    p["head_b"] = jnp.asarray(r.get("dec.head.out.bias")).astype(dtype)

    # ---- encoder (EnCodec) -------------------------------------------------
    has_encoder = r.has_tensor("enc.model.0.conv.conv.weight")
    if has_encoder:
        enc: Dict[str, Any] = {"c0": _cw(r, "enc.model.0.conv.conv", dtype)}
        stages = []
        for si, mi in enumerate((1, 4, 7, 10)):
            stages.append({
                "b1": _cw(r, f"enc.model.{mi}.block.1.conv.conv", dtype),
                "b3": _cw(r, f"enc.model.{mi}.block.3.conv.conv", dtype),
                "sc": _cw(r, f"enc.model.{mi}.shortcut.conv.conv", dtype),
                "dn": _cw(r, f"enc.model.{mi + 2}.conv.conv", dtype),
            })
        enc["stages"] = stages

        def _lstm_w(name):
            # torch layout is [4h, in]; the reference converter stores the
            # transpose [in, 4h] (scripts/converters/wavtokenizer.py
            # maybe_transpose_lstm_weight) — accept both.
            w = np.asarray(r.get(name))
            if w.shape[0] * 4 == w.shape[1]:
                w = w.T
            return jnp.asarray(w).astype(dtype)

        lstm = []
        for li in range(2):
            lstm.append({
                "w_ih": _lstm_w(f"enc.model.13.lstm.weight_ih_l{li}"),
                "w_hh": _lstm_w(f"enc.model.13.lstm.weight_hh_l{li}"),
                "b_ih": jnp.asarray(r.get(f"enc.model.13.lstm.bias_ih_l{li}")).astype(dtype),
                "b_hh": jnp.asarray(r.get(f"enc.model.13.lstm.bias_hh_l{li}")).astype(dtype),
            })
        enc["lstm"] = lstm
        enc["c_out"] = _cw(r, "enc.model.15.conv.conv", dtype)
        p["enc"] = enc

    cfg = WtConfig(
        sample_rate=r.get_i32("codec.sample_rate", 24000),
        hop_size=r.get_i32("codec.hop_size", 320),
        n_q=len(cbs),
        codebook_size=int(codebooks.shape[1]),
        codebook_dim=int(codebooks.shape[2]),
        backbone_dim=int(p["embed"]["w"].shape[2]),
        n_convnext=len(cnx),
        use_adanorm=use_adanorm,
        use_pos_net=use_pos_net,
        head_out_dim=int(head_w.shape[0]),
    )
    return cfg, p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def wt_decode_fn(params, codes: jax.Array, cfg: WtConfig,
                 n_q: Optional[int] = None) -> jax.Array:
    """codes [B, T, Q] → pcm [B, T*hop]."""
    if n_q is None:
        n_q = codes.shape[-1]
    codes = jnp.clip(codes, 0, cfg.codebook_size - 1)
    x = rvq.rvq_decode_sum(codes, params["cb"], n_q=n_q)       # [B, T, d]
    x = conv.conv1d(x, params["embed"]["w"], params["embed"]["b"],
                    padding=(params["embed"]["k"] - 1) // 2)
    if cfg.use_pos_net:
        pn = params["pos_net"]
        x = blocks.diffusion_resblock(x, pn["res"][0])
        x = blocks.diffusion_resblock(x, pn["res"][1])
        x = blocks.diffusion_attn_block(x, pn["attn"])
        x = blocks.diffusion_resblock(x, pn["res"][2])
        x = blocks.diffusion_resblock(x, pn["res"][3])
        x = norms.group_norm(x, pn["gn_w"], pn["gn_b"], 32, 1e-6)
    x = norms.layer_norm(x, params["inln"][0], params["inln"][1], 1e-6)
    for blk in params["cnx"]:
        x = blocks.convnext_block(x, blk)
    x = norms.layer_norm(x, params["fln_w"], params["fln_b"], 1e-6)
    head = x @ params["head_w"].T + params["head_b"]           # [B, T, n_fft+2]
    return istft_from_head(head, cfg.hop_size)


def _reflect_sconv(x: jax.Array, layer, stride: int = 1) -> jax.Array:
    """EnCodec 'streaming' conv: asymmetric reflect pad + conv
    (reference: codec_wt_sconv1d, wavtokenizer.cpp:502-535).
    pad_total = k - s; left = pt - pt//2 (reflect); right = pt//2 + extra
    where extra makes frame count ceil(t/s)."""
    k = layer["k"]
    t = x.shape[1]
    pt = k - stride
    extra = -(-t // stride) * stride - t      # frames = ceil(t/stride)
    pad_right = pt // 2
    pad_left = pt - pad_right
    x = jnp.pad(x, ((0, 0), (pad_left, 0), (0, 0)), mode="reflect")
    if pad_right + extra > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_right + extra), (0, 0)), mode="reflect")
    return conv.conv1d(x, layer["w"], layer["b"], stride=stride)


def wt_encode_fn(params, pcm: jax.Array, cfg: WtConfig,
                 n_q: Optional[int] = None) -> jax.Array:
    """pcm [B, n] → codes [B, ceil(n/hop), n_q]
    (reference: codec_wt_build_encode, wavtokenizer.cpp:684-766)."""
    if n_q is None:
        n_q = cfg.n_q
    enc = params["enc"]
    x = _reflect_sconv(pcm[..., None], enc["c0"])
    for st, stride in zip(enc["stages"], ENC_STRIDES):
        h = act.elu(x)
        h = _reflect_sconv(h, st["b1"])
        h = act.elu(h)
        h = _reflect_sconv(h, st["b3"])
        x = _reflect_sconv(x, st["sc"]) + h
        x = act.elu(x)
        x = _reflect_sconv(x, st["dn"], stride=stride)
    x = blocks.lstm_stack(x, enc["lstm"], skip=True)
    x = act.elu(x)
    x = _reflect_sconv(x, enc["c_out"])
    return rvq.rvq_encode(x, params["cb"][:n_q])


class WavTokenizerCodec(CodecModel):
    arch = "wavtokenizer"
    causal_time = False          # reflect padding is non-causal

    def _load(self, reader: GGUFReader) -> None:
        self.cfg, self.params = load_wt_params(reader, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.codebook_dim
        self.has_encoder = "enc" in self.params
        self.has_decoder = True

    def _decode_impl(self, codes, n_q):
        return wt_decode_fn(self.params, codes, self.cfg, n_q=n_q)

    def _encode_impl(self, pcm, n_q):
        return wt_encode_fn(self.params, pcm, self.cfg, n_q=n_q)

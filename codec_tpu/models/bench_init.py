"""Random full-architecture DAC / WavTokenizer decode params (benchmark
use, like models/mimi_init.py). Shapes mirror the real checkpoints —
descript/dac_24khz (latent 1024, decoder_dim 1536, up rates 8/5/4/2, 9 RVQ,
reference weight shapes read at src/models/dac.cpp init) and
novateur/WavTokenizer-large (ConvNeXt dim 768 ×12, pos_net, n_fft 1280
iSTFT head, V=4096; src/models/wavtokenizer.cpp init) — so perf
characteristics match real weights.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .dac import DacConfig
from .wavtokenizer import WtConfig


def _mk(rng, *shape, scale=0.05, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale,
                       dtype=dtype)


def random_dac_decode_params(seed: int = 0, dtype=jnp.float32
                             ) -> Tuple[DacConfig, Dict[str, Any]]:
    """24 kHz DAC decoder + quantizer stack (hop 320 = 2*4*5*8)."""
    rng = np.random.default_rng(seed)
    cfg = DacConfig(sample_rate=24000, hop_size=320, n_q=9,
                    codebook_size=1024, codebook_dim=8, latent_dim=1024)
    h, d, v = cfg.latent_dim, cfg.codebook_dim, cfg.codebook_size

    def cwb(cin, cout, k):
        return {"w": _mk(rng, k, cin, cout, dtype=dtype),
                "b": _mk(rng, cout, dtype=dtype), "k": k}

    p: Dict[str, Any] = {
        "vq": {"cb": _mk(rng, cfg.n_q, v, d, scale=1.0, dtype=dtype),
               "in_w": _mk(rng, cfg.n_q, d, h, dtype=dtype),
               "in_b": _mk(rng, cfg.n_q, d, dtype=dtype),
               "out_w": _mk(rng, cfg.n_q, h, d, dtype=dtype),
               "out_b": _mk(rng, cfg.n_q, h, dtype=dtype)},
        "dec_c1": cwb(h, 1536, 7),
    }
    blocks = []
    c = 1536
    for s in (8, 5, 4, 2):                      # decoder up rates (24 kHz)
        out = c // 2
        blk = {"snake": jnp.ones((c,), dtype),
               "tr": {"w": _mk(rng, 2 * s, c, out, dtype=dtype),
                      "b": _mk(rng, out, dtype=dtype), "k": 2 * s},
               "units": [{"s1": jnp.ones((out,), dtype),
                          "c1": cwb(out, out, 7),
                          "s2": jnp.ones((out,), dtype),
                          "c2": cwb(out, out, 1)} for _ in range(3)]}
        blocks.append(blk)
        c = out
    p["dec_blocks"] = blocks
    p["dec_snake"] = jnp.ones((c,), dtype)
    p["dec_c2"] = cwb(c, 1, 7)
    return cfg, p


def random_wt_decode_params(seed: int = 0, dtype=jnp.float32
                            ) -> Tuple[WtConfig, Dict[str, Any]]:
    """WavTokenizer-large decoder: embed k7 → pos_net (2 res + attn +
    2 res + GN) → 12 ConvNeXt(768, inner 2304) → iSTFT head (1282)."""
    rng = np.random.default_rng(seed)
    cfg = WtConfig(sample_rate=24000, hop_size=320, n_q=1,
                   codebook_size=4096, codebook_dim=512, backbone_dim=768,
                   n_convnext=12, use_adanorm=True, use_pos_net=True,
                   head_out_dim=1282)
    c, inner = cfg.backbone_dim, 2304

    def res():
        return {"n1_w": jnp.ones((c,), dtype), "n1_b": jnp.zeros((c,), dtype),
                "c1_w": _mk(rng, 3, c, c, dtype=dtype),
                "c1_b": _mk(rng, c, dtype=dtype),
                "n2_w": jnp.ones((c,), dtype), "n2_b": jnp.zeros((c,), dtype),
                "c2_w": _mk(rng, 3, c, c, dtype=dtype),
                "c2_b": _mk(rng, c, dtype=dtype)}

    p: Dict[str, Any] = {
        "cb": _mk(rng, 1, cfg.codebook_size, cfg.codebook_dim, scale=1.0,
                  dtype=dtype),
        "embed": {"w": _mk(rng, 7, cfg.codebook_dim, c, dtype=dtype),
                  "b": _mk(rng, c, dtype=dtype), "k": 7},
        "pos_net": {
            "res": [res(), res(), res(), res()],
            "attn": {"n_w": jnp.ones((c,), dtype),
                     "n_b": jnp.zeros((c,), dtype),
                     **{f"{k}_w": _mk(rng, c, c, 1, dtype=dtype)
                        for k in ("q", "k", "v", "o")},
                     **{f"{k}_b": _mk(rng, c, dtype=dtype)
                        for k in ("q", "k", "v", "o")}},
            "gn_w": jnp.ones((c,), dtype), "gn_b": jnp.zeros((c,), dtype),
        },
        "inln": (jnp.ones((c,), dtype), jnp.zeros((c,), dtype)),
        "cnx": [{"dw_w": _mk(rng, 7, 1, c, dtype=dtype),
                 "dw_b": _mk(rng, c, dtype=dtype),
                 "ln_w": jnp.ones((c,), dtype), "ln_b": jnp.zeros((c,), dtype),
                 "pw1_w": _mk(rng, inner, c, dtype=dtype),
                 "pw1_b": _mk(rng, inner, dtype=dtype),
                 "pw2_w": _mk(rng, c, inner, dtype=dtype),
                 "pw2_b": _mk(rng, c, dtype=dtype),
                 "gamma": jnp.full((c,), 1e-2, dtype)}
                for _ in range(cfg.n_convnext)],
        "fln_w": jnp.ones((c,), dtype), "fln_b": jnp.zeros((c,), dtype),
        "head_w": _mk(rng, cfg.head_out_dim, c, dtype=dtype),
        "head_b": _mk(rng, cfg.head_out_dim, dtype=dtype),
    }
    return cfg, p


def random_snac_params(seed: int = 0, dtype=jnp.float32, encoder: bool = True
                       ) -> Tuple["SnacConfig", Dict[str, Any]]:
    """hubertsiuzdak/snac_24khz at production dims (encoder_dim 48,
    decoder_dim 1024, rates enc 2/4/8/8 dec 8/8/4/2, 3-level multi-scale
    RVQ strides 4/2/1, depthwise res units; reference src/models/snac.cpp
    init). Tree layout matches models/snac.py::load_snac_params."""
    from .snac import SnacConfig

    rng = np.random.default_rng(seed)
    cfg = SnacConfig()                       # defaults = snac_24khz
    lat, v, d = cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim
    enc_dim, dec_dim = 48, 1024

    def cwb(cin, cout, k):
        return {"w": _mk(rng, k, cin, cout, dtype=dtype),
                "b": _mk(rng, cout, dtype=dtype), "k": k}

    def units(c):                            # depthwise k7 + pointwise k1
        return [{"a1": jnp.ones((c,), dtype), "c1": cwb(1, c, 7),
                 "a2": jnp.ones((c,), dtype), "c2": cwb(c, c, 1)}
                for _ in range(3)]

    p: Dict[str, Any] = {"q": []}
    for _ in range(cfg.n_q):
        cb = _mk(rng, v, d, scale=1.0, dtype=dtype)
        nrm = jnp.linalg.norm(cb.astype(jnp.float32), axis=1, keepdims=True)
        p["q"].append({"in": cwb(lat, d, 1), "out": cwb(d, lat, 1),
                       "cb": cb,
                       "cb_norm": (cb / jnp.maximum(nrm, 1e-12)).astype(dtype)})

    p["dec_in_dw"] = cwb(1, lat, 7)          # depthwise k7 @ latent
    p["dec_in_pw"] = cwb(lat, dec_dim, 1)
    blocks = []
    c = dec_dim
    for s in cfg.decoder_rates:              # 8, 8, 4, 2
        out = c // 2
        blocks.append({
            "act": jnp.ones((c,), dtype),
            "tr": {"w": _mk(rng, 2 * s, c, out, dtype=dtype),
                   "b": _mk(rng, out, dtype=dtype), "k": 2 * s},
            "units": units(out)})
        c = out
    p["dec_blocks"] = blocks
    p["dec_act_final"] = jnp.ones((c,), dtype)
    p["dec_final"] = cwb(c, 1, 7)

    if encoder:
        p["enc0"] = cwb(1, enc_dim, 7)
        enc_blocks = []
        ch = enc_dim
        for s in cfg.encoder_rates:          # 2, 4, 8, 8
            enc_blocks.append({"units": units(ch),
                               "act": jnp.ones((ch,), dtype),
                               "down": cwb(ch, ch * 2, 2 * s)})
            ch *= 2
        p["enc_blocks"] = enc_blocks
        p["enc_final"] = cwb(1, ch, 7)       # depthwise k7 @ latent
    return cfg, p

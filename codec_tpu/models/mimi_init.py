"""Random full-architecture Mimi parameter init (benchmark / dry-run use).

Shapes mirror kyutai/mimi (num_filters=64 doubling per stride; reference
weight shapes are read from GGUF at src/models/mimi.cpp:codec_mimi_init_*,
this reproduces them without a checkpoint). Perf characteristics are
identical to real weights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .mimi import MimiConfig

ENC_STRIDES = (4, 5, 6, 8)


def _w(rng, *shape, scale=0.05, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype=dtype)


def random_mimi_params(cfg: MimiConfig, num_filters: int = 64, seed: int = 0,
                       dtype=jnp.float32) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    nf = num_filters
    h = cfg.hidden
    d = cfg.codebook_dim
    v = cfg.codebook_size
    n_acu = cfg.n_q - cfg.n_sem

    def conv_wb(cin, cout, k):
        return {"w": _w(rng, k, cin, cout, dtype=dtype), "b": _w(rng, cout, dtype=dtype)}

    def convtr_wb(cin, cout, k, bias=True):
        return {"w": _w(rng, k, cin, cout, dtype=dtype),
                "b": _w(rng, cout, dtype=dtype) if bias else None}

    def tr_stack():
        L = cfg.n_layers
        i = cfg.intermediate
        return {
            "inln_w": jnp.ones((L, h), dtype), "inln_b": jnp.zeros((L, h), dtype),
            "paln_w": jnp.ones((L, h), dtype), "paln_b": jnp.zeros((L, h), dtype),
            "q_w": _w(rng, L, cfg.n_heads * cfg.head_dim, h, dtype=dtype),
            "k_w": _w(rng, L, cfg.n_heads * cfg.head_dim, h, dtype=dtype),
            "v_w": _w(rng, L, cfg.n_heads * cfg.head_dim, h, dtype=dtype),
            "o_w": _w(rng, L, h, cfg.n_heads * cfg.head_dim, dtype=dtype),
            "fc1_w": _w(rng, L, i, h, dtype=dtype),
            "fc2_w": _w(rng, L, h, i, dtype=dtype),
            "sa_scale": jnp.full((L, h), 0.01, dtype),
            "mlp_scale": jnp.full((L, h), 0.01, dtype),
        }

    p: Dict[str, Any] = {
        "cb_sem": _w(rng, cfg.n_sem, v, d, scale=1.0, dtype=dtype),
        "sem_op": _w(rng, h, d, dtype=dtype),
        "cb_acu": _w(rng, n_acu, v, d, scale=1.0, dtype=dtype),
        "acu_op": _w(rng, h, d, dtype=dtype),
        "up": convtr_wb(h, h, 4, bias=False),
        "dtr": tr_stack(),
        "etr": tr_stack(),
    }

    # encoder: 1 → nf →(res)→ strided doublings → l14: 16nf → hidden
    p["enc_l0"] = conv_wb(1, nf, 7)
    c = nf
    enc_stages = []
    for s in ENC_STRIDES:
        enc_stages.append({
            "r1": conv_wb(c, c // 2, 3),
            "r2": conv_wb(c // 2, c, 1),
            "dn": conv_wb(c, c * 2, 2 * s),
        })
        c *= 2
    p["enc_stages"] = enc_stages
    p["enc_l14"] = conv_wb(c, h, 3)
    p["dn"] = {"w": _w(rng, 4, h, h, dtype=dtype), "b": None}
    p["sem_ip"] = _w(rng, d, h, dtype=dtype)
    p["acu_ip"] = _w(rng, d, h, dtype=dtype)

    # decoder mirrors: l0 hidden → 16nf, upsamples halve channels
    p["dec_l0"] = conv_wb(h, c, 7)
    dec_stages = []
    for s in reversed(ENC_STRIDES):          # 8, 6, 5, 4
        dec_stages.append({
            "tr": convtr_wb(c, c // 2, 2 * s),
            "r1": conv_wb(c // 2, c // 4, 3),
            "r2": conv_wb(c // 4, c // 2, 1),
        })
        c //= 2
    p["dec_stages"] = dec_stages
    p["dec_l14"] = conv_wb(c, 1, 3)
    return p

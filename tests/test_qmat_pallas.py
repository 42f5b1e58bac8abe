"""Fused dequant-matmul kernels vs the bit-exact NumPy dequantizer
(interpret mode on CPU; v5e numbers in tools/qmat_micro.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_tpu.io.gguf import (dequantize_q4_k, dequantize_q8_0,
                               quantize_q4_k, quantize_q8_0)
from codec_tpu.ops.qmat_pallas import (dequant_ref, pack_q4_k, pack_q8_0,
                                       q4_k_matmul, q8_0_matmul, qmatmul)


def _mk(out_d, in_d, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((out_d, in_d)) * 0.1).astype(np.float32)


def test_pack_q8_0_dequant_exact():
    w = _mk(128, 256)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    want = dequantize_q8_0(raw.tobytes(), w.size).reshape(w.shape)
    qt = pack_q8_0(raw, w.shape)
    got = np.asarray(dequant_ref(qt))
    np.testing.assert_array_equal(got, want)


def test_pack_q4_k_dequant_exact():
    w = _mk(128, 512)
    raw = np.frombuffer(quantize_q4_k(w), dtype=np.uint8)
    want = dequantize_q4_k(raw.tobytes(), w.size).reshape(w.shape)
    qt = pack_q4_k(raw, w.shape)
    got = np.asarray(dequant_ref(qt))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("m,out_d,in_d", [(1, 128, 256), (4, 256, 512)])
def test_q8_0_matmul_interpret(m, out_d, in_d):
    rng = np.random.default_rng(1)
    w = _mk(out_d, in_d, 1)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    qt = pack_q8_0(raw, w.shape)
    x = rng.standard_normal((m, in_d)).astype(np.float32)
    want = x @ dequantize_q8_0(raw.tobytes(), w.size).reshape(w.shape).T
    got = np.asarray(q8_0_matmul(jnp.asarray(x), jnp.asarray(qt["qs"]),
                                 jnp.asarray(qt["scale"]), interpret=True))
    # bf16 MXU inputs bound the agreement
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("m,out_d,in_d", [(1, 128, 512), (4, 256, 512)])
def test_q4_k_matmul_interpret(m, out_d, in_d):
    rng = np.random.default_rng(2)
    w = _mk(out_d, in_d, 2)
    raw = np.frombuffer(quantize_q4_k(w), dtype=np.uint8)
    qt = pack_q4_k(raw, w.shape)
    x = rng.standard_normal((m, in_d)).astype(np.float32)
    want = x @ dequantize_q4_k(raw.tobytes(), w.size).reshape(w.shape).T
    got = np.asarray(q4_k_matmul(jnp.asarray(x), jnp.asarray(qt["qs"]),
                                 jnp.asarray(qt["scale"]),
                                 jnp.asarray(qt["minv"]), interpret=True))
    # bf16 inputs + f32 accum: abs error grows ~sqrt(in) * bf16 ulp
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=8e-2)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.999


def test_qmatmul_dispatch_cpu_path():
    w = _mk(128, 256, 3)
    raw = np.frombuffer(quantize_q8_0(w), dtype=np.uint8)
    qt = {k: (jnp.asarray(v) if not isinstance(v, str) else v)
          for k, v in pack_q8_0(raw, w.shape).items()}
    x = np.random.default_rng(4).standard_normal((3, 5, 256)).astype(np.float32)
    got = np.asarray(qmatmul(jnp.asarray(x), qt))
    want = x.reshape(-1, 256) @ dequantize_q8_0(
        raw.tobytes(), w.size).reshape(w.shape).T
    np.testing.assert_allclose(got.reshape(-1, 128), want, rtol=1e-4,
                               atol=1e-4)


def test_backbone_quantized_exec_matches_dequant_on_load(tmp_path):
    """Q8_0 backbone with quantized=True (CPU fallback = dequant_ref @ dot)
    must match quantized=False (dequant-on-load) exactly — same dequantized
    values either way; only WHERE dequant happens differs."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter
    from codec_tpu.lm.backbone import LlamaBackbone

    torch.manual_seed(0)
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=96, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="Q8_0")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path / "bb_q8.gguf"
    conv.convert_and_save(path)

    dense = LlamaBackbone(str(path), quantized=False)
    quant = LlamaBackbone(str(path), quantized=True)
    # the packed path actually engaged
    assert isinstance(quant.params["layers"]["q"], dict)

    rng = np.random.default_rng(0)
    emb = (rng.standard_normal((5, 64)) * 0.3).astype(np.float32)
    dense.reset()
    quant.reset()
    a = dense.prefill(emb)
    b = quant.prefill(emb)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    for i in range(3):
        x = (rng.standard_normal(64) * 0.3).astype(np.float32)
        np.testing.assert_allclose(dense.step(x), quant.step(x),
                                   rtol=1e-5, atol=1e-5)


def test_gen_chunk_with_packed_quant_backbone(tmp_path):
    """The fused K-frame generation chunk (lm/fused_gen.build_gen_chunk)
    composes with a packed-quantized backbone: greedy codes match a dense
    backbone carrying the SAME dequantized values (on CPU qmatmul falls
    back to x @ dequant_ref(qt).T, so the math is identical — this pins
    the pytree plumbing: stacked packed dicts through while_loop/scan,
    donated KV, jit_weighted weight splitting)."""
    import jax
    import jax.random as jr

    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.backbone import BackboneConfig
    from codec_tpu.lm.fused_gen import build_gen_chunk
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.ops.qmat_pallas import pack_dense_stacked

    p = tmp_path / "rda_smoke.gguf"
    write_rda_gguf(p, h=64, dh=32, n_cb=4, vocab=64, layers=2,
                   heads=2, kv=1, hdim=16, inter=64)
    lm = create_lm(GGUFReader(p))
    cfg = BackboneConfig(hidden=64, n_layers=2, n_heads=2, n_kv_heads=1,
                         head_dim=16, ffn_dim=64, vocab_size=8, max_ctx=32)

    rng = np.random.default_rng(7)
    L, nh, nkv, hd, ffn, hid = (cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
                                cfg.head_dim, cfg.ffn_dim, cfg.hidden)

    def W(*s, off=0.0):
        return (rng.standard_normal(s) * 0.05 + off).astype(np.float32)

    mats = {"q": W(L, nh * hd, hid), "k": W(L, nkv * hd, hid),
            "v": W(L, nkv * hd, hid), "o": W(L, hid, nh * hd),
            "gate": W(L, ffn, hid), "up": W(L, ffn, hid),
            "down": W(L, hid, ffn)}
    norms = {"attn_norm": W(L, hid, off=1.0), "ffn_norm": W(L, hid, off=1.0)}

    packed_layers = {k: pack_dense_stacked(v, "q8_0") for k, v in mats.items()}
    # dense twin carries the dequantized values the packed path executes
    from codec_tpu.ops.qmat_pallas import dequant_ref
    dense_layers = {
        k: jnp.stack([dequant_ref(jax.tree_util.tree_map(
            lambda a, i=i: a[i], packed_layers[k])) for i in range(L)])
        for k in mats}

    out_norm = jnp.asarray(W(hid, off=1.0))

    def params(layers):
        return {"freq_factors": None, "out_norm": out_norm,
                "layers": {**layers, **{k: jnp.asarray(v)
                                        for k, v in norms.items()}}}

    # (a) one backbone step, packed vs dense twin: same math to float
    # noise (argmax chains over many frames can flip near-ties — the
    # cross-compile nondeterminism note in CLAUDE.md — so frame-code
    # equality over a long chunk is NOT a stable assertion)
    from codec_tpu.lm.backbone import backbone_forward
    emb = jnp.asarray(rng.standard_normal((1, hid)) * 0.3, jnp.float32)
    kv0 = jnp.zeros((L, 2, nkv, cfg.max_ctx, hd), jnp.float32)
    hq, kvq = backbone_forward(params(packed_layers), kv0, jnp.int32(0),
                               emb, cfg)
    hd_, kvd = backbone_forward(params(dense_layers), kv0, jnp.int32(0),
                                emb, cfg)
    np.testing.assert_allclose(np.asarray(hq), np.asarray(hd_),
                               rtol=2e-5, atol=2e-5)

    # (b) the full chunk executes with packed weights (stacked packed
    # dicts through while_loop + donated KV + jit_weighted splitting),
    # emits in-range codes, and is deterministic within one compile
    k_frames = 6
    chunk = build_gen_chunk(lm, cfg, (0.0, 0, 1.0, 0.0), k_frames)
    h0 = jnp.asarray(rng.standard_normal(hid) * 0.3, jnp.float32)

    def run(layers):
        kv = jnp.zeros((L, 2, nkv, cfg.max_ctx, hd), jnp.float32)
        packed, h, _kv, _key = chunk(params(layers), kv, np.int32(0),
                                     np.int32(0), h0, jr.PRNGKey(3),
                                     np.int32(0))
        return np.asarray(packed), np.asarray(h)

    codes_q, h_q = run(packed_layers)
    codes_q2, h_q2 = run(packed_layers)
    np.testing.assert_array_equal(codes_q, codes_q2)
    np.testing.assert_array_equal(h_q, h_q2)
    n_cb = int(lm.info.n_codebook)
    n_emitted = codes_q[k_frames * n_cb]
    assert n_emitted >= 1
    emitted = codes_q[: n_emitted * n_cb]
    assert (emitted >= 0).all() and (emitted < 64).all()
    # first frame's codes don't involve the backbone at all -> exact
    codes_d, _h_d = run(dense_layers)
    np.testing.assert_array_equal(codes_q[:n_cb], codes_d[:n_cb])

"""Backbone parity: JAX llama backbone vs HF transformers models fed the
same input embeddings (reference analogs: csm_backbone_smoke /
qwen3_tts_backbone_smoke — hidden-state parity at the libttsbackbone
boundary)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _convert(model, cfg_dict, tmp_path, name):
    from codec_tpu.convert import get_converter

    conv = get_converter("llama_backbone")(quantization="F32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    conv.load_from_state_dict(sd, cfg_dict)
    path = tmp_path / f"{name}.gguf"
    conv.convert_and_save(path)
    from codec_tpu.lm.backbone import create_backbone

    return create_backbone(path, max_ctx=64)


def _hf_hiddens(model, embeds):
    with torch.no_grad():
        out = model(inputs_embeds=torch.from_numpy(embeds)[None],
                    output_hidden_states=True)
    return out.hidden_states[-1].numpy()[0]   # pre-norm stack output


def _hf_normed(model, embeds):
    with torch.no_grad():
        h = model(inputs_embeds=torch.from_numpy(embeds)[None]).last_hidden_state
    return h.numpy()[0]


@pytest.fixture(scope="module")
def llama3(tmp_path_factory):
    from transformers import LlamaConfig, LlamaModel

    torch.manual_seed(0)
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=96, rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=64,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32})
    hf = LlamaModel(cfg).eval()
    ours = _convert(hf, cfg.to_dict(), tmp_path_factory.mktemp("bb"), "llama3")
    return hf, ours, cfg


def test_prefill_parity(llama3):
    hf, ours, cfg = llama3
    rng = np.random.default_rng(0)
    emb = (rng.standard_normal((7, 64)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    last = ours.prefill(emb)
    np.testing.assert_allclose(last, want[-1], atol=2e-5, rtol=1e-4)


def test_step_matches_prefill(llama3):
    hf, ours, cfg = llama3
    rng = np.random.default_rng(1)
    emb = (rng.standard_normal((6, 64)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    got = [ours.step(emb[i]) for i in range(6)]
    np.testing.assert_allclose(np.stack(got), want, atol=3e-5, rtol=1e-4)


def test_prefill_then_steps(llama3):
    hf, ours, cfg = llama3
    rng = np.random.default_rng(2)
    emb = (rng.standard_normal((9, 64)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    ours.prefill(emb[:5])
    got = [ours.step(emb[i]) for i in range(5, 9)]
    np.testing.assert_allclose(np.stack(got), want[5:], atol=3e-5, rtol=1e-4)


def test_prefill_bucketed(llama3):
    """Bucketed prefill (pad to a length-bucket multiple, one forward):
    the HF oracle still holds for the prompt AND for steps continuing
    after it — the padded tail's junk KV rows are never attendable (the
    mask is strictly position-based) and get overwritten by the next
    writes before the position pointer reaches them."""
    hf, ours, cfg = llama3
    rng = np.random.default_rng(3)
    emb = (rng.standard_normal((11, 64)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    last = ours.prefill(emb[:7], bucket=8)     # pads 7 -> 8
    assert ours.pos == 7                        # true length only
    np.testing.assert_allclose(last, want[6], atol=3e-5, rtol=1e-4)
    got = [ours.step(emb[i]) for i in range(7, 11)]
    np.testing.assert_allclose(np.stack(got), want[7:], atol=3e-5, rtol=1e-4)
    # exact-multiple prompts pad nothing; bucket larger than max_ctx
    # headroom clamps instead of shifting the write window
    ours.reset()
    np.testing.assert_allclose(ours.prefill(emb[:8], bucket=4), want[7],
                               atol=3e-5, rtol=1e-4)
    ours.reset()
    for _ in range(14):                         # pos near max_ctx=64? no -
        ours.step(emb[0])                       # just exercise clamp math
    last = ours.prefill(emb[:3], bucket=64)    # pad clamped to fit ctx
    assert ours.pos == 17


def test_embed_and_text_logits(llama3):
    hf, ours, cfg = llama3
    ids = np.array([3, 17, 95])
    want = hf.embed_tokens(torch.from_numpy(ids)).detach().numpy()
    np.testing.assert_allclose(ours.embed_tokens(ids), want, atol=1e-6)
    h = np.ones(64, np.float32) * 0.1
    logits = ours.text_logits(h)
    assert logits.shape == (96,)


def test_qwen3_qk_norm(tmp_path):
    from transformers import Qwen3Config, Qwen3Model

    torch.manual_seed(1)
    cfg = Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=80, rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = Qwen3Model(cfg).eval()
    ours = _convert(hf, cfg.to_dict(), tmp_path, "qwen3")
    assert ours.cfg.has_qk_norm
    rng = np.random.default_rng(3)
    emb = (rng.standard_normal((5, 64)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    got = [ours.step(emb[i]) for i in range(5)]
    np.testing.assert_allclose(np.stack(got), want, atol=3e-5, rtol=1e-4)


def _make_rda_gguf(tmp_path, hidden=64):
    """Minimal csm-style residual_depth_ar adaptor GGUF at the backbone's
    hidden size (fixture recipe per tests/test_lm_adaptors.py)."""
    from codec_tpu.io.gguf import GGUFWriter

    g = torch.Generator().manual_seed(7)
    W = lambda *s: torch.randn(*s, generator=g) * 0.3
    sizes, dh, dheads, dkv, dhd, dinter = [32, 16], 24, 2, 2, 12, 48
    t = {"lm.c0_head.weight": W(sizes[0], hidden),
         "lm.depth.in_proj.weight": W(dh, hidden),
         "lm.depth.output_norm.weight": W(dh) * 0.2 + 1.0,
         "lm.audio_embd_0.weight": W(sizes[0], hidden),
         "lm.audio_embd_1.weight": W(sizes[1], hidden),
         "lm.depth.heads_0.weight": W(sizes[1], dh)}
    p = "lm.depth.blk_0"
    t.update({f"{p}.attn_norm.weight": W(dh) * 0.2 + 1.0,
              f"{p}.q.weight": W(dheads * dhd, dh),
              f"{p}.k.weight": W(dkv * dhd, dh),
              f"{p}.v.weight": W(dkv * dhd, dh),
              f"{p}.o.weight": W(dh, dheads * dhd),
              f"{p}.ffn_norm.weight": W(dh) * 0.2 + 1.0,
              f"{p}.ffn_gate.weight": W(dinter, dh),
              f"{p}.ffn_up.weight": W(dinter, dh),
              f"{p}.ffn_down.weight": W(dh, dinter)})
    path = tmp_path / "rda.gguf"
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.hop_size", 1920)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", hidden)
    w.add_uint32("codec.lm.audio_embed_dim", hidden)
    w.add_uint32("codec.lm.n_codebook", 2)
    w.add_array("codec.lm.codebook_sizes", sizes)
    w.add_array("codec.lm.delay_pattern", [0, 0])
    w.add_uint32("codec.lm.residual.depth_layers", 1)
    w.add_uint32("codec.lm.residual.depth_hidden", dh)
    w.add_uint32("codec.lm.residual.depth_n_heads", dheads)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", dkv)
    w.add_uint32("codec.lm.residual.depth_head_dim", dhd)
    w.add_uint32("codec.lm.residual.depth_intermediate", dinter)
    w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
    w.add_bool("codec.lm.residual.depth_has_in_proj", True)
    w.add_bool("codec.lm.residual.depth_has_qk_norm", False)
    w.add_bool("codec.lm.residual.depth_has_output_norm", True)
    w.add_bool("codec.lm.residual.depth_use_rope", True)
    w.add_string("codec.lm.residual.c0_input_modality", "audio")
    for name, v in t.items():
        w.add_tensor(name, v.numpy())
    w.write()
    return path


def test_codebook_ar_with_real_backbone(llama3, tmp_path):
    """Full run_codebook_ar loop on the JAX backbone + a csm-style
    residual_depth_ar adaptor (reference analog: csm_lm_gen_smoke)."""
    hf, ours, cfg = llama3
    gguf = _make_rda_gguf(tmp_path, hidden=64)
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar

    audio_lm = AudioLM(GGUFReader(gguf), codec=None)
    lm = audio_lm.lm
    ours.reset()
    prompt = [np.zeros(64, np.float32), np.ones(64, np.float32) * 0.05]
    res = run_codebook_ar(audio_lm, ours, prompt, max_steps=4, decode=False)
    assert res.codes.shape[0] >= 1
    assert res.codes.shape[1] == lm.info.n_codebook


def test_qwen3_moe_parity(tmp_path):
    """MoE backbone (Qwen3-MoE-style sparse FFN): softmax router → top-k
    → renormalized weighted expert SwiGLUs, parity vs the HF oracle."""
    from transformers import Qwen3MoeConfig, Qwen3MoeModel

    torch.manual_seed(2)
    cfg = Qwen3MoeConfig(
        hidden_size=32, intermediate_size=48, moe_intermediate_size=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, vocab_size=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=64, num_experts=8, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[])
    hf = Qwen3MoeModel(cfg).eval()
    ours = _convert(hf, cfg.to_dict(), tmp_path, "moe")
    assert ours.cfg.n_experts == 8 and ours.cfg.n_experts_used == 2
    assert ours.cfg.moe_ffn_dim == 16

    rng = np.random.default_rng(6)
    emb = (rng.standard_normal((6, 32)) * 0.3).astype(np.float32)
    want = _hf_normed(hf, emb)
    ours.reset()
    got = [ours.step(emb[i]) for i in range(6)]
    np.testing.assert_allclose(np.stack(got), want, atol=3e-5, rtol=1e-4)
    # prefill path too (batched-token routing)
    ours.reset()
    last = ours.prefill(emb)
    np.testing.assert_allclose(last, want[-1], atol=3e-5, rtol=1e-4)

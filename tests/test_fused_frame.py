"""Fused on-device frame step: ops/sample.py chain semantics + parity of
CodecLM.fused_frame against the host per-codebook step machine (which is
itself parity-tested against torch mirrors in test_lm_adaptors.py).

Reference contrast: the reference samples on the host per codebook
(common/tts_runner.cpp:242-246, src/lm/residual_depth_ar.cpp step loop);
the fused path is the TPU-native upgrade — one device call per frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm import create_lm
from codec_tpu.ops.sample import OnDeviceSampling, sample_logits

from test_lm_adaptors import (phd_gguf, rda_gguf, _write_base,  # noqa: F401
                              H, N_CB, SIZES, DH, DHEADS, DKV, DHD, DINTER,
                              DLAYERS)


# ---------------------------------------------------------------------------
# sample_logits chain semantics
# ---------------------------------------------------------------------------

def test_sample_greedy_is_argmax():
    rng = np.random.default_rng(0)
    lg = jnp.asarray(rng.standard_normal(64), jnp.float32)
    got = sample_logits(lg, jax.random.PRNGKey(0))
    assert int(got) == int(np.argmax(np.asarray(lg)))


def test_sample_top_k_restricts_support():
    rng = np.random.default_rng(1)
    lg = jnp.asarray(rng.standard_normal(32), jnp.float32)
    top4 = set(np.argsort(np.asarray(lg))[-4:].tolist())
    for s in range(40):
        c = int(sample_logits(lg, jax.random.PRNGKey(s),
                              temperature=1.5, top_k=4))
        assert c in top4


def test_sample_top_p_restricts_support():
    # peaked distribution: two tokens cover > 0.9 of the mass
    lg = jnp.asarray([8.0, 7.9] + [0.0] * 30, jnp.float32)
    for s in range(40):
        c = int(sample_logits(lg, jax.random.PRNGKey(s),
                              temperature=1.0, top_p=0.9))
        assert c in (0, 1)


def test_sample_min_p_restricts_support():
    lg = jnp.asarray([5.0, 4.9, 0.0, -3.0], jnp.float32)
    # min_p=0.5: keep prob >= 0.5 * max_prob -> tokens 0 and 1 only
    for s in range(30):
        c = int(sample_logits(lg, jax.random.PRNGKey(s),
                              temperature=1.0, min_p=0.5))
        assert c in (0, 1)


def test_sample_temperature_distribution():
    """With temperature -> categorical: empirical frequencies roughly match
    softmax over many keys (loose sanity bound)."""
    lg = jnp.asarray([2.0, 1.0, 0.0], jnp.float32)
    want = np.exp([2.0, 1.0, 0.0])
    want = want / want.sum()
    counts = np.zeros(3)
    n = 600
    fn = jax.jit(lambda k: sample_logits(lg, k, temperature=1.0))
    for s in range(n):
        counts[int(fn(jax.random.PRNGKey(s)))] += 1
    np.testing.assert_allclose(counts / n, want, atol=0.07)


# ---------------------------------------------------------------------------
# residual_depth_ar fused frame (CSM-style fixture from test_lm_adaptors)
# ---------------------------------------------------------------------------

def _host_greedy_frame(lm, h, text_ctx=None):
    st = lm.new_state()
    if text_ctx is not None:
        st.set_text_context(text_ctx)
    st.step_begin(h)
    codes = []
    for _ in range(lm.info.n_codebook):
        logits, _cb = st.step_logits()
        code = int(np.argmax(logits))
        st.step_push_code(code)
        codes.append(code)
    assert st.step_finish() == codes
    return codes


def test_rda_fused_greedy_matches_host(rda_gguf):
    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    fn = lm.fused_frame()          # greedy
    rng = np.random.default_rng(5)
    for trial in range(3):
        h = rng.standard_normal(H).astype(np.float32)
        want = _host_greedy_frame(lm, h)
        got = np.asarray(fn(jnp.asarray(h), jax.random.PRNGKey(trial),
                            jnp.int32(0)))
        assert got.tolist() == want


def test_rda_fused_sampled_codes_valid_and_deterministic(rda_gguf):
    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    fn = lm.fused_frame(temperature=0.9, top_k=8)
    h = jnp.asarray(np.random.default_rng(6).standard_normal(H), jnp.float32)
    a = np.asarray(fn(h, jax.random.PRNGKey(11), jnp.int32(0)))
    b = np.asarray(fn(h, jax.random.PRNGKey(11), jnp.int32(0)))
    c = np.asarray(fn(h, jax.random.PRNGKey(12), jnp.int32(0)))
    np.testing.assert_array_equal(a, b)        # same key -> same codes
    for k, code in enumerate(a.tolist()):
        assert 0 <= code < SIZES[k]
    assert a.shape == c.shape == (N_CB,)


def test_phd_fused_greedy_matches_host(phd_gguf):
    path, _, _ = phd_gguf
    lm = create_lm(GGUFReader(path))
    fn = lm.fused_frame()
    rng = np.random.default_rng(7)
    h = rng.standard_normal(H).astype(np.float32)
    want = _host_greedy_frame(lm, h)
    got = np.asarray(fn(jnp.asarray(h), jax.random.PRNGKey(0), jnp.int32(0)))
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# Moshi-style variant: per-pos in_proj, c0 from text context, flex 3D heads,
# interleaved rope — exercises every stacked branch of the fused scan.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rda_moshi_gguf(tmp_path_factory):
    g = torch.Generator().manual_seed(9)
    n_cb, av, tv = 3, 24, 12        # audio vocab per cb, text vocab

    def W(*shape, s=0.3):
        return torch.randn(*shape, generator=g) * s

    tensors = {
        "lm.depth.text_embd.weight": W(tv, DH, s=0.5),
        "lm.depth.in_proj.weight": W(n_cb, DH, H),
        "lm.depth.in_proj.bias": W(n_cb, DH, s=0.1),
        "lm.depth.heads.weight": W(n_cb, av, DH),
        "lm.depth.output_norm.weight": W(DH, s=0.2) + 1.0,
    }
    for i in range(n_cb):
        tensors[f"lm.depth.audio_embd_{i}.weight"] = W(av, DH, s=0.5)
    for l in range(DLAYERS):
        p = f"lm.depth.blk_{l}"
        tensors[f"{p}.attn_norm.weight"] = W(DH, s=0.2) + 1.0
        tensors[f"{p}.q.weight"] = W(DHEADS * DHD, DH)
        tensors[f"{p}.k.weight"] = W(DKV * DHD, DH)
        tensors[f"{p}.v.weight"] = W(DKV * DHD, DH)
        tensors[f"{p}.o.weight"] = W(DH, DHEADS * DHD)
        tensors[f"{p}.ffn_norm.weight"] = W(DH, s=0.2) + 1.0
        tensors[f"{p}.ffn_gate.weight"] = W(DINTER, DH)
        tensors[f"{p}.ffn_up.weight"] = W(DINTER, DH)
        tensors[f"{p}.ffn_down.weight"] = W(DH, DINTER)

    path = tmp_path_factory.mktemp("rda_moshi") / "rda_moshi.gguf"
    w = GGUFWriter(path, "mimi")
    _write_base(w)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", DH)   # per-pos rows live in DH
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [av] * n_cb)
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_uint32("codec.lm.residual.depth_layers", DLAYERS)
    w.add_uint32("codec.lm.residual.depth_hidden", DH)
    w.add_uint32("codec.lm.residual.depth_n_heads", DHEADS)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", DKV)
    w.add_uint32("codec.lm.residual.depth_head_dim", DHD)
    w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
    w.add_bool("codec.lm.residual.depth_has_in_proj", True)
    w.add_bool("codec.lm.residual.depth_in_proj_per_pos", True)
    w.add_bool("codec.lm.residual.depth_has_output_norm", True)
    w.add_bool("codec.lm.residual.depth_use_rope", True)
    w.add_bool("codec.lm.residual.depth_rope_interleaved", True)
    w.add_string("codec.lm.residual.c0_input_modality", "text")
    for name, t in tensors.items():
        w.add_tensor(name, t.numpy())
    w.write()
    return path


def test_rda_moshi_fused_greedy_matches_host(rda_moshi_gguf):
    lm = create_lm(GGUFReader(rda_moshi_gguf))
    assert lm.depth_emits_c0 and lm.in_proj_per_pos and lm.c0_is_text
    fn = lm.fused_frame()
    rng = np.random.default_rng(8)
    for text_tok in (0, 5, 11):
        h = rng.standard_normal(H).astype(np.float32)
        want = _host_greedy_frame(lm, h, text_ctx=text_tok)
        got = np.asarray(fn(jnp.asarray(h), jax.random.PRNGKey(0),
                            jnp.int32(text_tok)))
        assert got.tolist() == want


# ---------------------------------------------------------------------------
# run_codebook_ar on-device path end to end
# ---------------------------------------------------------------------------

def test_run_codebook_ar_on_device_matches_host(rda_gguf):
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from test_audio_lm import StubBackbone

    path, _ = rda_gguf
    alm = AudioLM(GGUFReader(path))
    prompt = [np.random.default_rng(1).standard_normal(H).astype(np.float32)]

    host = run_codebook_ar(alm, StubBackbone(H, seed=2), prompt,
                           max_steps=4, decode=False)
    alm2 = AudioLM(GGUFReader(path))
    dev = run_codebook_ar(alm2, StubBackbone(H, seed=2), prompt,
                          max_steps=4, decode=False,
                          on_device=OnDeviceSampling())   # greedy
    np.testing.assert_array_equal(host.codes, dev.codes)
    assert dev.n_steps == host.n_steps


def test_push_frame_validates(rda_gguf):
    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    st = lm.new_state()
    with pytest.raises(Exception):
        st.push_frame([0] * (N_CB - 1))            # wrong length
    with pytest.raises(Exception):
        st.push_frame([SIZES[0]] + [0] * (N_CB - 1))   # out of range
    got = st.push_frame([1] * N_CB)
    assert got == [1] * N_CB and st.frame_counter == 1


# ---------------------------------------------------------------------------
# chunked on-device generation (lm/fused_gen.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_backbone_gguf(tmp_path_factory):
    """A real (tiny) llama backbone GGUF with hidden == the RDA fixtures' H,
    for the chunked generation loop (which needs functional KV)."""
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter

    torch.manual_seed(3)
    cfg = LlamaConfig(
        hidden_size=H, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        vocab_size=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("bb") / "bb.gguf"
    conv.convert_and_save(path)
    return path


def _fresh_backbone(path):
    from codec_tpu.lm.backbone import create_backbone

    return create_backbone(path, max_ctx=64)


@pytest.mark.parametrize("ods", [
    OnDeviceSampling(chunk_frames=3),                      # greedy
    OnDeviceSampling(temperature=0.8, top_k=5, seed=11, chunk_frames=3),
])
def test_gen_chunk_matches_per_frame(rda_gguf, tiny_backbone_gguf, ods):
    """Chunked loop (chunk not dividing max_steps) emits the exact code
    stream of the per-frame fused path: same frame fn, same PRNG splits,
    same feedback compose."""
    import dataclasses

    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar

    path, _ = rda_gguf
    rng = np.random.default_rng(4)
    prompt = [rng.standard_normal(H).astype(np.float32) * 0.3]

    per_frame = dataclasses.replace(ods, chunk_frames=1)
    ref = run_codebook_ar(AudioLM(GGUFReader(path)),
                          _fresh_backbone(tiny_backbone_gguf), prompt,
                          max_steps=5, decode=False, on_device=per_frame)
    got = run_codebook_ar(AudioLM(GGUFReader(path)),
                          _fresh_backbone(tiny_backbone_gguf), prompt,
                          max_steps=5, decode=False, on_device=ods)
    np.testing.assert_array_equal(ref.codes, got.codes)
    assert got.n_steps == ref.n_steps
    assert got.stopped_by_eos == ref.stopped_by_eos


def _write_rda_eos_gguf(tensors, path, zero_c0=True):
    """The rda_gguf tensors with eos_code_c0=0 and (by default) a zeroed
    c0 head: greedy c0 is always 0, so generation EOSes at eos_min_step=2.
    zero_c0=False keeps the provided c0 head (caller-staged EOS timing)."""
    w = GGUFWriter(path, "mimi")
    _write_base(w)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", N_CB)
    w.add_array("codec.lm.codebook_sizes", SIZES)
    w.add_array("codec.lm.delay_pattern", [0] * N_CB)
    w.add_int32("codec.lm.eos_code_c0", 0)
    w.add_int32("codec.lm.eos_min_step", 2)
    w.add_uint32("codec.lm.residual.depth_layers", DLAYERS)
    w.add_uint32("codec.lm.residual.depth_hidden", DH)
    w.add_uint32("codec.lm.residual.depth_n_heads", DHEADS)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", DKV)
    w.add_uint32("codec.lm.residual.depth_head_dim", DHD)
    w.add_uint32("codec.lm.residual.depth_intermediate", DINTER)
    w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
    w.add_bool("codec.lm.residual.depth_has_in_proj", True)
    w.add_bool("codec.lm.residual.depth_has_qk_norm", False)
    w.add_bool("codec.lm.residual.depth_has_output_norm", True)
    w.add_bool("codec.lm.residual.depth_use_rope", True)
    w.add_string("codec.lm.residual.c0_input_modality", "audio")
    for name, t in tensors.items():
        if zero_c0 and name == "lm.c0_head.weight":
            t = torch.zeros_like(t)
        w.add_tensor(name, t.numpy())
    w.write()
    return path


def test_gen_chunk_eos_mid_chunk(rda_gguf, tiny_backbone_gguf,
                                 tmp_path_factory):
    """EOS landing inside a chunk: the loop exits early, records the EOS
    frame, takes no backbone step for it, and matches the per-frame path."""
    import dataclasses

    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar

    _, tensors = rda_gguf
    path = _write_rda_eos_gguf(
        tensors, tmp_path_factory.mktemp("rda_eos") / "rda_eos.gguf")

    prompt = [np.full(H, 0.1, np.float32)]
    chunked = OnDeviceSampling(chunk_frames=8)
    ref = run_codebook_ar(AudioLM(GGUFReader(path)),
                          _fresh_backbone(tiny_backbone_gguf), prompt,
                          max_steps=16, decode=False,
                          on_device=dataclasses.replace(chunked,
                                                        chunk_frames=1))
    got = run_codebook_ar(AudioLM(GGUFReader(path)),
                          _fresh_backbone(tiny_backbone_gguf), prompt,
                          max_steps=16, decode=False, on_device=chunked)
    assert ref.stopped_by_eos and got.stopped_by_eos
    assert ref.n_steps == got.n_steps == 3        # eos gate at min_step=2
    np.testing.assert_array_equal(ref.codes, got.codes)


def test_gen_chunk_stub_backbone_falls_back(rda_gguf):
    """A host-only backbone (no functional KV) silently uses the per-frame
    fused path — chunk_frames is a fast-path request, not a contract."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from test_audio_lm import StubBackbone

    path, _ = rda_gguf
    prompt = [np.random.default_rng(1).standard_normal(H).astype(np.float32)]
    ref = run_codebook_ar(AudioLM(GGUFReader(path)), StubBackbone(H, seed=2),
                          prompt, max_steps=4, decode=False,
                          on_device=OnDeviceSampling())
    got = run_codebook_ar(AudioLM(GGUFReader(path)), StubBackbone(H, seed=2),
                          prompt, max_steps=4, decode=False,
                          on_device=OnDeviceSampling(chunk_frames=4))
    np.testing.assert_array_equal(ref.codes, got.codes)


def test_compose_embd_fn_matches_host(rda_gguf):
    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    fn = lm.compose_embd_fn()
    rng = np.random.default_rng(7)
    codes = np.asarray([rng.integers(0, s) for s in SIZES], np.int32)
    got = np.asarray(fn(jnp.asarray(codes)))
    want = lm.compose_audio_embd([int(c) for c in codes])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# repetition penalty + chunked realtime streaming (lm/fused_gen.py)
# ---------------------------------------------------------------------------

def test_repetition_penalty_matches_host_chain():
    """apply_repetition_penalty + seen_mask_from_ring reproduce the host
    SamplerChain's penalty arithmetic (lm/tts_runner.py:134-138)."""
    from codec_tpu.ops.sample import (apply_repetition_penalty,
                                      seen_mask_from_ring)

    rng = np.random.default_rng(0)
    logits = (rng.standard_normal(20) * 2).astype(np.float32)
    hist = [3, 3, 5, 19]
    pen = 1.3

    want = logits.astype(np.float64).copy()
    seen = np.unique(hist)
    pos = want[seen] > 0
    want[seen[pos]] /= pen
    want[seen[~pos]] *= pen

    ring = np.full(8, -1, np.int32)
    ring[: len(hist)] = hist
    mask = seen_mask_from_ring(jnp.asarray(ring), 20)
    np.testing.assert_array_equal(
        np.asarray(mask), np.isin(np.arange(20), hist))
    got = apply_repetition_penalty(jnp.asarray(logits), mask, pen)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_frame_rp_greedy_matches_plain_and_updates_history(rda_gguf):
    """The penalized frame variant at temperature 0 emits the plain fused
    frame's codes (penalty inert, host parity) and still advances both
    history representations."""
    from codec_tpu.lm.fused_gen import init_rep_hist

    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    chain = (0.0, 0, 1.0, 0.0)
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.standard_normal(H) * 0.3, jnp.float32)
    key = jax.random.PRNGKey(0)

    plain = jax.jit(lm._build_frame(chain))
    codes0 = np.asarray(plain(h, key, jnp.int32(0)))

    ring_fn = jax.jit(lm._build_frame(chain, rep=(1.3, 6)))
    codes1, (rings, ptr) = ring_fn(h, key, jnp.int32(0),
                                   init_rep_hist(lm, 6))
    np.testing.assert_array_equal(np.asarray(codes1), codes0)
    np.testing.assert_array_equal(np.asarray(rings[:, 0]), codes0)
    assert int(ptr) == 1 and np.all(np.asarray(rings[:, 1:]) == -1)

    mask_fn = jax.jit(lm._build_frame(chain, rep=(1.3, -1)))
    codes2, mask = mask_fn(h, key, jnp.int32(0), init_rep_hist(lm, -1))
    np.testing.assert_array_equal(np.asarray(codes2), codes0)
    mask = np.asarray(mask)
    assert mask.sum() == len(set(
        (cb, c) for cb, c in enumerate(codes0)))
    assert all(mask[cb, c] for cb, c in enumerate(codes0))


def test_frame_rp_penalty_suppresses_repeats(rda_gguf):
    """With a huge penalty and near-greedy temperature, a code already in
    the ring cannot win again when its logit is positive."""
    path, _ = rda_gguf
    lm = create_lm(GGUFReader(path))
    rng = np.random.default_rng(6)
    h = jnp.asarray(rng.standard_normal(H) * 0.3, jnp.float32)
    key = jax.random.PRNGKey(1)

    greedy = np.asarray(jax.jit(lm._build_frame((0.0, 0, 1.0, 0.0)))(
        h, key, jnp.int32(0)))
    fn = jax.jit(lm._build_frame((1e-4, 0, 1.0, 0.0), rep=(1e6, 4)))
    n = lm.info.n_codebook
    rings = jnp.asarray(np.tile(greedy[:, None], (1, 4)), jnp.int32)
    codes, _ = fn(h, key, jnp.int32(0), (rings, jnp.int32(4)))
    codes = np.asarray(codes)
    # c0 logits for this fixture straddle zero; check each cb whose greedy
    # winner had a positive logit got displaced
    st = lm.new_state()
    st.step_begin(np.asarray(h, np.float32))
    for cb in range(n):
        logits, _ = st.step_logits()
        if logits[greedy[cb]] > 0:
            assert codes[cb] != greedy[cb], f"cb {cb} repeated"
        st.step_push_code(int(greedy[cb]))
    st.step_finish()


def test_stream_chunk_sizes_agree(rda_gguf, tiny_backbone_gguf):
    """run_realtime_streaming on-device: chunk sizes 2 and 4 emit the same
    stream (same PRNG split sequence, same penalty history), with the
    text⊕audio compose and repetition state carried across chunks."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.prompt_info import build_prompt_info
    from codec_tpu.lm.tts_runner import run_realtime_streaming

    path, _ = rda_gguf

    def run(chunk):
        reader = GGUFReader(path)
        alm = AudioLM(reader)
        pi = build_prompt_info(reader, alm.lm.info)
        pi.streaming_interleave = True
        pi.prefill_text_len = 2
        pi.text_pad_id = 0
        pi.audio_pad_code = 1
        pi.bos_code_c0 = 2
        bb = _fresh_backbone(tiny_backbone_gguf)
        ods = OnDeviceSampling(temperature=0.8, top_k=5, seed=11,
                               chunk_frames=chunk,
                               repetition_penalty=1.3,
                               repetition_window=3)
        return run_realtime_streaming(
            alm, bb, lambda t: bb.embed_tokens([t])[0],
            ctx_tokens=[1, 2, 3], text_tokens=[4, 5, 6, 7],
            pi=pi, max_frames=5, decode=False, on_device=ods)

    a = run(4)
    b = run(2)
    assert a.codes.shape == (5, N_CB)
    np.testing.assert_array_equal(a.codes, b.codes)
    assert a.n_steps == b.n_steps == 5


def test_stream_chunk_eos_mid_chunk(rda_gguf, tiny_backbone_gguf,
                                    tmp_path_factory):
    """EOS inside a streaming chunk: frames stop at the gate, the EOS frame
    is trimmed from the codes, steps count only non-EOS frames."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.prompt_info import build_prompt_info
    from codec_tpu.lm.tts_runner import run_realtime_streaming

    _, tensors = rda_gguf
    path = _write_rda_eos_gguf(
        tensors, tmp_path_factory.mktemp("rt_eos") / "rt_eos.gguf")
    reader = GGUFReader(path)
    alm = AudioLM(reader)
    pi = build_prompt_info(reader, alm.lm.info)
    pi.streaming_interleave = True
    pi.prefill_text_len = 2
    pi.text_pad_id = 0
    pi.audio_pad_code = 1
    pi.bos_code_c0 = 2
    bb = _fresh_backbone(tiny_backbone_gguf)
    res = run_realtime_streaming(
        alm, bb, lambda t: bb.embed_tokens([t])[0],
        ctx_tokens=[1, 2, 3], text_tokens=[4, 5, 6, 7],
        pi=pi, max_frames=16, decode=False,
        on_device=OnDeviceSampling(chunk_frames=8))
    assert res.stopped_by_eos
    assert res.n_steps == 2                    # eos gate at min_step=2
    assert res.codes.shape == (2, N_CB)        # EOS frame trimmed


def test_lfm2_chunked_matches_host(rda_gguf, tiny_backbone_gguf):
    """run_lfm2_sequential's audio phase chunked on device: at the LFM2
    default greedy settings the device stream equals the host sampler
    stream exactly, so the two paths must emit identical codes."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.prompt_info import build_prompt_info
    from codec_tpu.lm.tts_runner import run_lfm2_sequential

    path, _ = rda_gguf

    def run(ods):
        reader = GGUFReader(path)
        alm = AudioLM(reader)
        pi = build_prompt_info(reader, alm.lm.info)
        pi.sequential_text_audio = True
        pi.audio_start_id = 3
        pi.text_end_id = 4
        pi.max_text_tokens = 4
        bb = _fresh_backbone(tiny_backbone_gguf)
        table = np.asarray(bb.params["tok_embd"], np.float32)
        return run_lfm2_sequential(
            alm, bb, table, [1, 2], pi, max_frames=5,
            sampler=lambda lg: int(np.argmax(lg)),
            decode=False, on_device=ods)

    host = run(None)
    dev = run(OnDeviceSampling(chunk_frames=3))      # greedy chunked
    np.testing.assert_array_equal(host.codes, dev.codes)
    assert host.n_steps == dev.n_steps
    assert host.stopped_by_eos == dev.stopped_by_eos


def test_phd_fused_range_matches_host(phd_gguf):
    """cb0_range on the PHD fused frame == the host RangeConstraint path
    (the MOSS-TTSD merged-vocab constraint, in-graph)."""
    from codec_tpu.lm.tts_runner import RangeConstraint

    path, _, _ = phd_gguf
    lm = create_lm(GGUFReader(path))
    rng = np.random.default_rng(8)
    h = rng.standard_normal(H).astype(np.float32)

    fn = lm.fused_frame(cb0_range=(5, 15, 7))
    got = np.asarray(fn(jnp.asarray(h), jax.random.PRNGKey(0), jnp.int32(0)))

    rc = RangeConstraint(lambda lg: int(np.argmax(lg)), 5, 15, extra=(7,))
    st = lm.new_state()
    st.step_begin(h)
    want = []
    for _k in range(N_CB):
        logits, cb = st.step_logits()
        code = rc(logits) if cb == 0 else int(np.argmax(logits))
        st.step_push_code(code)
        want.append(code)
    st.step_finish()
    assert got.tolist() == want
    assert 5 <= want[0] < 15 or want[0] == 7


def test_ttsd_style_chunked_range_matches_host(phd_gguf, tiny_backbone_gguf):
    """A delay-pattern PHD model with a cb0 speech-range constraint (the
    MOSS-TTSD shape) through run_codebook_ar: the chunked on-device path
    (range mask in-graph) emits the host path's greedy stream, including
    the post-EOS max(delay) flush frames."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.prompt_info import build_prompt_info
    from codec_tpu.lm.tts_runner import run_codebook_ar

    path, _, _ = phd_gguf

    def run(ods):
        reader = GGUFReader(path)
        alm = AudioLM(reader)
        pi = build_prompt_info(reader, alm.lm.info)
        pi.cb0_speech_range_start = 5
        pi.cb0_speech_range_end = 15
        bb = _fresh_backbone(tiny_backbone_gguf)
        prompt = [np.full(H, 0.1, np.float32)]
        return run_codebook_ar(alm, bb, prompt, max_steps=6, decode=False,
                               pi=pi, on_device=ods)

    host = run(None)                               # RangeConstraint sampler
    dev = run(OnDeviceSampling(chunk_frames=4))    # in-graph mask, chunked
    np.testing.assert_array_equal(host.codes, dev.codes)
    assert host.n_steps == dev.n_steps
    assert host.stopped_by_eos == dev.stopped_by_eos
    assert np.all((host.codes[:, 0] >= 5) & (host.codes[:, 0] < 15)
                  | (host.codes[:, 0] == 7))


# ---------------------------------------------------------------------------
# batched multi-stream generation (build_gen_chunk_batched)
# ---------------------------------------------------------------------------

def _shared_alms(path, n, shared):
    from codec_tpu.lm.audio_lm import AudioLM

    return [AudioLM(GGUFReader(path), lm=shared) for _ in range(n)]


def test_batched_gen_matches_single_streams(rda_gguf, tiny_backbone_gguf):
    """3 concurrent streams through run_codebook_ar_batch == 3 independent
    single-stream chunked runs with the matching per-stream seeds (the
    batched chunk's PRNG stream for index s is PRNGKey(seed + s))."""
    import dataclasses

    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import (run_codebook_ar,
                                         run_codebook_ar_batch)

    path, _ = rda_gguf
    shared = create_lm(GGUFReader(path))
    rng = np.random.default_rng(9)
    prompts = [[(rng.standard_normal(H) * 0.3).astype(np.float32)]
               for _ in range(3)]
    ods = OnDeviceSampling(temperature=0.8, top_k=5, seed=21, chunk_frames=3)

    batch = run_codebook_ar_batch(
        _shared_alms(path, 3, shared), _fresh_backbone(tiny_backbone_gguf),
        prompts, ods, max_steps=5, decode=False)

    for s in range(3):
        ref = run_codebook_ar(
            AudioLM(GGUFReader(path), lm=shared),
            _fresh_backbone(tiny_backbone_gguf), prompts[s], max_steps=5,
            decode=False,
            on_device=dataclasses.replace(ods, seed=ods.seed + s,
                                          chunk_frames=3))
        np.testing.assert_array_equal(batch[s].codes, ref.codes)
        assert batch[s].n_steps == ref.n_steps
        assert batch[s].stopped_by_eos == ref.stopped_by_eos


def test_batched_gen_staggered_eos(rda_gguf, tiny_backbone_gguf,
                                   tmp_path_factory):
    """Per-stream EOS gating: with c0 logits = the backbone hidden itself
    (c0_head = scaled identity), greedy cb0 emits eos_code_c0=0 exactly
    when h[0] is the max component — a deterministic, stream-dependent
    stop time. Every stream must match its single-stream chunked run
    (frames, EOS step) while others continue past it."""
    import dataclasses

    import torch

    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import (run_codebook_ar,
                                         run_codebook_ar_batch)

    _, tensors = rda_gguf
    head = torch.zeros(SIZES[0], H)
    head[:H, :H] = torch.eye(H) * 2.0
    path = _write_rda_eos_gguf(
        dict(tensors, **{"lm.c0_head.weight": head}),
        tmp_path_factory.mktemp("b_eos") / "rda_eos.gguf", zero_c0=False)
    shared = create_lm(GGUFReader(path))
    rng = np.random.default_rng(10)
    prompts = [[(rng.standard_normal(H) * 0.3).astype(np.float32)]
               for _ in range(4)]
    ods = OnDeviceSampling(seed=5, chunk_frames=4)          # greedy

    batch = run_codebook_ar_batch(
        _shared_alms(path, 4, shared), _fresh_backbone(tiny_backbone_gguf),
        prompts, ods, max_steps=12, decode=False)

    eos_steps = set()
    for s in range(4):
        ref = run_codebook_ar(
            AudioLM(GGUFReader(path), lm=shared),
            _fresh_backbone(tiny_backbone_gguf), prompts[s], max_steps=12,
            decode=False,
            on_device=dataclasses.replace(ods, seed=ods.seed + s,
                                          chunk_frames=4))
        np.testing.assert_array_equal(batch[s].codes, ref.codes)
        assert batch[s].n_steps == ref.n_steps
        assert batch[s].stopped_by_eos == ref.stopped_by_eos
        eos_steps.add(batch[s].n_steps)
    assert len(eos_steps) > 1, "streams all stopped in lockstep — the " \
        "fixture no longer staggers; adjust prompts/seed"

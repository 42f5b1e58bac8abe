"""audio_lm hooks + tts_runner codebook-AR flow (reference analog:
common/audio_lm.cpp observe dispatch + run_codebook_ar with a stub backbone)."""

import numpy as np
import pytest

from codec_tpu.io.gguf import GGUFReader
from codec_tpu.lm.audio_lm import AudioLM, ObserveAction
from codec_tpu.lm.tts_runner import run_codebook_ar, SynthesisResult

from test_lm_adaptors import rda_gguf, phd_gguf, H, N_CB, SIZES  # noqa: F401


class StubBackbone:
    """Deterministic stub: hidden = tanh(W @ embed)."""

    def __init__(self, hidden_dim, seed=0):
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((hidden_dim, hidden_dim)).astype(np.float32) * 0.3

    def step(self, embed):
        return np.tanh(self.w @ np.asarray(embed, np.float32))


def test_type_a_token_range(rda_gguf):
    path, _ = rda_gguf
    r = GGUFReader(path)
    alm = AudioLM(r)
    alm.set_audio_token_range(offset=100, count=50, eos_id=99)
    assert alm.observe_token(5) is ObserveAction.PASSTHROUGH
    assert alm.observe_token(120) is ObserveAction.CONSUMED
    assert alm.observe_token(99) is ObserveAction.STOP
    assert alm.codes_matrix().tolist() == [[20]]


def test_observe_codes_accumulation_and_eos(phd_gguf):
    path, _, _ = phd_gguf
    alm = AudioLM(GGUFReader(path))
    assert alm.n_codebook == N_CB
    eos_c0, eos_min = alm.lm_eos()
    assert eos_c0 == 7 and eos_min == 2
    # run frames through the state machine so the frame counter advances
    for frame, expect_stop in ((3, False), (7, False), (7, True)):
        st = alm.state
        st.step_begin(np.zeros(H, np.float32))
        for k in range(N_CB):
            st.step_logits()
            st.step_push_code(frame if k == 0 else 1)
        codes = st.step_finish()
        action = alm.observe_codes(codes)
        assert (action is ObserveAction.STOP) is expect_stop
    assert alm.codes_matrix().shape == (3, N_CB)
    assert alm.next_embed is not None and alm.next_embed.shape == (H,)


def test_run_codebook_ar_flow(rda_gguf):
    path, _ = rda_gguf
    alm = AudioLM(GGUFReader(path))
    backbone = StubBackbone(H)
    rng = np.random.default_rng(1)
    prompt = [rng.standard_normal(H).astype(np.float32) for _ in range(3)]
    res = run_codebook_ar(alm, backbone, prompt, max_steps=4)
    assert isinstance(res, SynthesisResult)
    assert res.n_steps == 4                    # no EOS sentinel in rda fixture
    assert res.codes.shape == (4, N_CB)
    assert not res.stopped_by_eos
    # deterministic: rerun gives identical codes
    res2 = run_codebook_ar(alm, backbone, prompt, max_steps=4)
    np.testing.assert_array_equal(res.codes, res2.codes)


def test_run_codebook_ar_eos_stop(phd_gguf):
    path, heads, _ = phd_gguf
    alm = AudioLM(GGUFReader(path))
    backbone = StubBackbone(H, seed=3)

    # force the sampler to hit the EOS code (7) on c0 from frame index 2
    calls = {"frame": 0}

    def sampler(cb_idx, logits):
        if cb_idx == 0:
            calls["frame"] += 1
            return 7 if calls["frame"] >= 3 else 1
        return 0

    prompt = [np.zeros(H, np.float32)]
    res = run_codebook_ar(alm, backbone, prompt, max_steps=10, sampler=sampler)
    assert res.stopped_by_eos
    # phd fixture has delay_pattern [0,1,2,3]: after the cb0 EOS the host
    # flushes max(delay)=3 more frames so the delayed codebooks' in-flight
    # codes land (codec_lm.h:387-401); cb0 is forced to the sentinel there.
    assert res.n_steps == 2 + 1 + 3
    assert res.codes.shape == (6, N_CB)
    assert (res.codes[2:, 0] == 7).all()       # EOS + flush rows
    assert (res.codes[:2, 0] == 1).all()       # speech rows intact


def test_run_continuous_flow():
    """End-to-end continuous flow with the CFM fixture + stub backbone."""
    from test_continuous_cfm import tiny_cfm, HB, P, D  # noqa: F401
    import test_continuous_cfm as tc
    from codec_tpu.lm.tts_runner import run_continuous

    ref = tc.TorchCFM()
    import tempfile, pathlib
    from codec_tpu.io.gguf import GGUFWriter, GGUFReader

    path = pathlib.Path(tempfile.mkdtemp()) / "cfm.gguf"
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "continuous_latent_cfm")
    w.add_uint32("codec.lm.hidden_dim", tc.HB)
    w.add_uint32("codec.lm.h_vox", tc.HV)
    w.add_uint32("codec.lm.h_enc", tc.HE)
    w.add_uint32("codec.lm.h_dit", tc.HD)
    w.add_uint32("codec.lm.latent_dim", tc.D)
    w.add_uint32("codec.lm.patch_size", tc.P)
    w.add_uint32("codec.lm.n_locenc", tc.NL_ENC)
    w.add_uint32("codec.lm.n_locdit", tc.NL_DIT)
    w.add_uint32("codec.lm.n_ralm", tc.NL_RALM)
    w.add_uint32("codec.lm.n_heads", tc.NH)
    w.add_uint32("codec.lm.n_kv", tc.NKV)
    w.add_uint32("codec.lm.head_dim", tc.HDIM)
    w.add_uint32("codec.lm.fsq_scale", tc.FSQ)
    w.add_uint32("codec.lm.min_len", 0)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    alm = AudioLM(GGUFReader(path))
    assert alm.is_continuous
    alm.set_continuous_params(cfg_value=2.0, n_timesteps=4)
    backbone = StubBackbone(tc.HB, seed=5)
    rng = np.random.default_rng(0)
    prefill = rng.standard_normal((2, tc.HB)).astype(np.float32)
    prompt = [rng.standard_normal(tc.HB).astype(np.float32)]
    res = run_continuous(alm, backbone, prompt, max_steps=4,
                         prefill_hiddens=prefill, decode=False)
    assert res.n_steps <= 4
    assert res.codes.shape[1] == tc.D
    assert res.codes.shape[0] == res.n_steps * tc.P


def _cfm_gguf_path():
    """Tiny continuous-CFM adaptor GGUF (shared fixture recipe with
    test_run_continuous_flow)."""
    import pathlib
    import tempfile

    import test_continuous_cfm as tc
    from codec_tpu.io.gguf import GGUFWriter

    ref = tc.TorchCFM()
    path = pathlib.Path(tempfile.mkdtemp()) / "cfm.gguf"
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "continuous_latent_cfm")
    w.add_uint32("codec.lm.hidden_dim", tc.HB)
    w.add_uint32("codec.lm.h_vox", tc.HV)
    w.add_uint32("codec.lm.h_enc", tc.HE)
    w.add_uint32("codec.lm.h_dit", tc.HD)
    w.add_uint32("codec.lm.latent_dim", tc.D)
    w.add_uint32("codec.lm.patch_size", tc.P)
    w.add_uint32("codec.lm.n_locenc", tc.NL_ENC)
    w.add_uint32("codec.lm.n_locdit", tc.NL_DIT)
    w.add_uint32("codec.lm.n_ralm", tc.NL_RALM)
    w.add_uint32("codec.lm.n_heads", tc.NH)
    w.add_uint32("codec.lm.n_kv", tc.NKV)
    w.add_uint32("codec.lm.head_dim", tc.HDIM)
    w.add_uint32("codec.lm.fsq_scale", tc.FSQ)
    w.add_uint32("codec.lm.min_len", 0)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()
    return path


def test_run_continuous_chunked_matches_per_step(tmp_path):
    """chunk_steps > 1 chains K CFM steps + backbone steps in one device
    call (lm/fused_gen.build_continuous_chunk); the emitted latents,
    step count, and stop state equal the per-step loop's (same host-RNG
    noise sequence)."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    import test_continuous_cfm as tc
    from codec_tpu.convert import get_converter
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_continuous

    path = _cfm_gguf_path()

    torch.manual_seed(3)
    bb_cfg = LlamaConfig(
        hidden_size=tc.HB, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=8,
        vocab_size=32, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(bb_cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()},
        bb_cfg.to_dict())
    bb_path = tmp_path / "bb.gguf"
    conv.convert_and_save(bb_path)

    rng = np.random.default_rng(0)
    prefill = rng.standard_normal((2, tc.HB)).astype(np.float32)
    prompt = [rng.standard_normal(tc.HB).astype(np.float32)]

    def run(chunk_steps):
        alm = AudioLM(GGUFReader(path))
        alm.set_continuous_params(cfg_value=2.0, n_timesteps=4)
        bb = create_backbone(bb_path, max_ctx=32)
        return run_continuous(alm, bb, prompt, max_steps=7,
                              prefill_hiddens=prefill, decode=False,
                              chunk_steps=chunk_steps)

    ref = run(1)
    assert ref.n_steps >= 2                     # chunk path must engage
    for k in (2, 3):
        got = run(k)
        assert got.n_steps == ref.n_steps
        assert got.stopped_by_eos == ref.stopped_by_eos
        np.testing.assert_allclose(got.codes, ref.codes, atol=2e-5,
                                   rtol=2e-4)

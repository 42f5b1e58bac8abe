"""PromptInfo templates + run_realtime_streaming / run_lfm2_sequential flows
(reference: audio_lm_get_prompt_info + tts_runner.cpp:490/:609)."""

import numpy as np
import pytest

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm.audio_lm import AudioLM
from codec_tpu.lm.prompt_info import build_prompt_info
from codec_tpu.lm.tts_runner import (SamplerChain, run_lfm2_sequential,
                                     run_realtime_streaming)

from test_lm_adaptors import phd_gguf, rda_gguf, H, N_CB, SIZES  # noqa: F401
from test_audio_lm import StubBackbone  # noqa: F401


def _mk_gguf(tmp_path, name, kvs):
    path = tmp_path / name
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    for k, v in kvs.items():
        if isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, int):
            w.add_uint32(k, v)
        elif isinstance(v, str):
            w.add_string(k, v)
    w.add_tensor("dummy", np.zeros((2, 2), np.float32))
    w.write()
    return GGUFReader(path)


def test_prompt_info_families(tmp_path):
    r = _mk_gguf(tmp_path, "csm.gguf", {"codec.lm.host_arch": "llama",
                                        "codec.lm.kind": "parallel_heads_delay"})
    pi = build_prompt_info(r)
    assert pi.prompt_prefix == "[0]" and pi.add_bos

    r = _mk_gguf(tmp_path, "ttsd.gguf", {"codec.lm.host_arch": "qwen3",
                                         "codec.lm.kind": "parallel_heads_delay"})
    pi = build_prompt_info(r)
    assert pi.cb0_from_backbone and "begin_of_style" in pi.prompt_prefix

    r = _mk_gguf(tmp_path, "rt.gguf", {
        "codec.lm.host_arch": "qwen3", "codec.lm.kind": "residual_depth_ar",
        "codec.lm.residual.c0_input_modality": "none"})
    pi = build_prompt_info(r)
    assert pi.streaming_interleave
    assert pi.audio_pad_code == 1024 and pi.bos_code_c0 == 1025
    assert pi.repetition_window == 50

    r = _mk_gguf(tmp_path, "q3.gguf", {"codec.lm.host_arch": "qwen3",
                                       "codec.lm.kind": "residual_depth_ar"})
    pi = build_prompt_info(r)
    assert not pi.streaming_interleave
    assert pi.prompt_prefix == "<|im_start|>user\n"

    r = _mk_gguf(tmp_path, "lfm2.gguf", {"codec.lm.host_arch": "lfm2",
                                         "codec.lm.kind": "residual_depth_ar"})
    pi = build_prompt_info(r)
    assert pi.sequential_text_audio and pi.audio_start_id == 128
    assert pi.default_temperature == 0.0

    r = _mk_gguf(tmp_path, "bm.gguf", {"codec.lm.host_arch": "barbet",
                                       "codec.lm.kind": "continuous_latent_cfm"})
    pi = build_prompt_info(r)
    assert pi.prompt_prefix == "<|bm_spk|>"


def test_run_realtime_streaming(phd_gguf):
    path, _, _ = phd_gguf
    reader = GGUFReader(path)
    alm = AudioLM(reader)
    pi = build_prompt_info(reader, alm.lm.info)
    pi.streaming_interleave = True
    pi.prefill_text_len = 2
    pi.text_pad_id = 0
    pi.audio_pad_code = 1            # valid for every codebook (sizes >= 20)
    pi.bos_code_c0 = 2

    rng = np.random.default_rng(3)
    tetab = rng.standard_normal((10, H)).astype(np.float32) * 0.3
    backbone = StubBackbone(H, seed=4)

    res = run_realtime_streaming(
        alm, backbone, lambda t: tetab[t],
        ctx_tokens=[1, 2, 3], text_tokens=[4, 5, 6, 7],
        pi=pi, max_frames=5,
        samplers=[lambda lg: int(np.argmax(lg))] * N_CB, decode=False)
    assert res.n_steps == 5                  # no EOS in greedy stub run
    assert res.codes.shape == (5, N_CB)

    # deterministic across reruns
    alm2 = AudioLM(GGUFReader(path))
    res2 = run_realtime_streaming(
        alm2, StubBackbone(H, seed=4), lambda t: tetab[t],
        ctx_tokens=[1, 2, 3], text_tokens=[4, 5, 6, 7],
        pi=pi, max_frames=5,
        samplers=[lambda lg: int(np.argmax(lg))] * N_CB, decode=False)
    np.testing.assert_array_equal(res.codes, res2.codes)


def test_run_lfm2_sequential(rda_gguf):
    path, _ = rda_gguf
    reader = GGUFReader(path)
    alm = AudioLM(reader)
    pi = build_prompt_info(reader, alm.lm.info)
    pi.sequential_text_audio = True
    pi.audio_start_id = 3
    pi.text_end_id = 4
    pi.max_text_tokens = 6

    rng = np.random.default_rng(0)
    table = rng.standard_normal((8, H)).astype(np.float32) * 0.4
    backbone = StubBackbone(H, seed=7)

    # scripted sampler: two text tokens, then audio_start, then audio codes
    script = iter([1, 2, 3] + [0] * 100)
    res = run_lfm2_sequential(alm, backbone, table, prompt_tokens=[5, 6],
                              pi=pi, max_frames=3,
                              sampler=lambda lg: next(script), decode=False)
    assert res.n_steps == 3
    assert res.codes.shape == (3, N_CB)
    assert (res.codes == 0).all()

    # text_end before audio_start → empty result, stopped
    script2 = iter([4])
    res2 = run_lfm2_sequential(AudioLM(GGUFReader(path)),
                               StubBackbone(H, seed=7), table,
                               prompt_tokens=[5], pi=pi, max_frames=3,
                               sampler=lambda lg: next(script2), decode=False)
    assert res2.stopped_by_eos and res2.codes.shape[0] == 0


def test_sampler_chain():
    s = SamplerChain(seed=1, temperature=0.0)
    assert s(np.array([0.1, 5.0, 0.2])) == 1
    s = SamplerChain(seed=1, temperature=1.0, top_k=1)
    assert s(np.array([0.1, 5.0, 0.2])) == 1     # top_k=1 ⇒ argmax
    # repetition penalty pushes a repeated positive-logit token down
    s = SamplerChain(seed=1, temperature=0.0, repetition_penalty=100.0,
                     repetition_window=-1)
    first = s(np.array([1.0, 0.99]))
    assert first == 0
    s.temperature = 1.0
    s.top_k = 1
    assert s(np.array([1.0, 0.99])) == 1         # 0 penalized below 0.99


def test_range_constraint():
    """GBNF analog: cb0 sampling restricted to the speech range + EOS
    (reference: tts_runner.h:64-73)."""
    from codec_tpu.lm.tts_runner import RangeConstraint

    greedy = lambda lg: int(np.argmax(lg))
    logits = np.array([9.0, 8.0, 1.0, 2.0, 3.0, 7.0], np.float32)
    # unconstrained argmax = 0; range [2, 5) forces 4; extra id 5 can win
    assert RangeConstraint(greedy, 2, 5)(logits) == 4
    assert RangeConstraint(greedy, 2, 5, extra=(5,))(logits) == 5
    assert RangeConstraint(greedy, 2, 5, extra=(-1, None))(logits) == 4

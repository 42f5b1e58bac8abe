"""Continuous-batching TTS engine (serve/cont_batch.py).

Equivalence contract: every request's code stream is bit-identical to a
single-stream chunked run (`run_codebook_ar(on_device=...)`) with the
same seed — regardless of which slot it lands in, when it is admitted,
or what the other slots are doing. That is the property that makes
continuous batching a pure throughput upgrade.

Reference contrast: the reference serializes generations entirely
(/root/reference/src/lm/lm_internal.h:63-68, common/tts_runner.cpp:707);
there is no reference counterpart to dynamic admission.
"""

import dataclasses
import threading

import numpy as np
import pytest

from codec_tpu.io.gguf import GGUFReader
from codec_tpu.lm import create_lm
from codec_tpu.lm.audio_lm import AudioLM
from codec_tpu.ops.sample import OnDeviceSampling
from codec_tpu.serve.cont_batch import ContinuousBatcher, EngineThread

from test_lm_adaptors import rda_gguf, _write_base, H, N_CB, SIZES  # noqa: F401
from test_fused_frame import (tiny_backbone_gguf, _fresh_backbone,  # noqa: F401
                              _write_rda_eos_gguf)


ODS = OnDeviceSampling(temperature=0.8, top_k=5, chunk_frames=3)


def _single_stream(path, bb_path, prompt, seed, max_steps,
                   ods=ODS):
    from codec_tpu.lm.tts_runner import run_codebook_ar

    return run_codebook_ar(
        AudioLM(GGUFReader(path)), _fresh_backbone(bb_path), prompt,
        max_steps=max_steps, decode=False,
        on_device=dataclasses.replace(ods, seed=seed))


def _engine(path, bb_path, n_slots=2, ods=ODS):
    shared = create_lm(GGUFReader(path))
    bb = _fresh_backbone(bb_path)
    return ContinuousBatcher(bb, shared, n_slots=n_slots, on_device=ods,
                             decode=False), shared


def _prompts(n, seed=9):
    rng = np.random.default_rng(seed)
    return [[(rng.standard_normal(H) * 0.3).astype(np.float32)]
            for _ in range(n)]


def test_more_requests_than_slots_match_single_streams(rda_gguf,
                                                       tiny_backbone_gguf):
    """4 requests through a 2-slot engine: the first pair drains, the
    second pair is admitted into the freed slots — all four match their
    single-stream runs exactly."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf)
    prompts = _prompts(4)
    handles = [batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                              prompts[i], seed=20 + i, max_steps=5)
               for i in range(4)]
    batcher.drain()
    for i, hd in enumerate(handles):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompts[i],
                             seed=20 + i, max_steps=5)
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps
        assert got.stopped_by_eos == ref.stopped_by_eos


def test_mid_flight_admission_matches(rda_gguf, tiny_backbone_gguf):
    """A request admitted while another stream is mid-generation (slot
    base offsets differ) still matches its single-stream run — the
    per-slot base_frame / PRNG / KV state is fully independent."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf)
    prompts = _prompts(2, seed=11)
    h0 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[0],
                        seed=3, max_steps=7)
    assert batcher.step() == 1          # stream 0 has emitted 3 frames
    h1 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[1],
                        seed=4, max_steps=5)
    batcher.drain()
    for hd, prompt, seed, ms in ((h0, prompts[0], 3, 7),
                                 (h1, prompts[1], 4, 5)):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompt, seed, ms)
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps


def test_staggered_eos_slot_reuse(rda_gguf, tiny_backbone_gguf,
                                  tmp_path_factory):
    """With the deterministic-EOS fixture (c0 head = scaled identity),
    streams stop at different steps; retired slots are refilled and every
    request still matches its single-stream greedy run."""
    import torch

    _, tensors = rda_gguf
    head = torch.zeros(SIZES[0], H)
    head[:H, :H] = torch.eye(H) * 2.0
    path = _write_rda_eos_gguf(
        dict(tensors, **{"lm.c0_head.weight": head}),
        tmp_path_factory.mktemp("cb_eos") / "rda_eos.gguf", zero_c0=False)
    greedy = OnDeviceSampling(chunk_frames=4)
    batcher, shared = _engine(path, tiny_backbone_gguf, n_slots=2,
                              ods=greedy)
    prompts = _prompts(5, seed=10)
    handles = [batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                              prompts[i], seed=5 + i, max_steps=12)
               for i in range(5)]
    batcher.drain()
    eos_steps = set()
    for i, hd in enumerate(handles):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompts[i],
                             seed=5 + i, max_steps=12, ods=greedy)
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps
        assert got.stopped_by_eos == ref.stopped_by_eos
        eos_steps.add(got.n_steps)
    assert len(eos_steps) > 1, "fixture no longer staggers EOS"


def test_engine_thread_concurrent_submissions(rda_gguf,
                                              tiny_backbone_gguf):
    """EngineThread drives the batcher while requests arrive from several
    threads; every handle resolves to its single-stream result."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf)
    eng = EngineThread(batcher)
    eng.start()
    prompts = _prompts(3, seed=13)
    out = {}

    def worker(i):
        hd = batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                            prompts[i], seed=30 + i, max_steps=4)
        out[i] = hd.wait(timeout=300)
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    eng.stop()
    assert sorted(out) == [0, 1, 2]
    for i in range(3):
        ref = _single_stream(path, tiny_backbone_gguf, prompts[i],
                             seed=30 + i, max_steps=4)
        np.testing.assert_array_equal(out[i].codes, ref.codes)


def test_per_request_sampling_params(rda_gguf, tiny_backbone_gguf):
    """Requests with DIFFERENT sampler chains batch together in one
    engine — the chain is a traced per-slot input (sample_logits_dyn), so
    no recompile per combination — and each request's codes still match
    the single-stream run with that chain baked statically (greedy,
    temperature-only, top_k, top_p, min_p mixes)."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf)
    chains = [OnDeviceSampling(temperature=0.8, top_k=5, chunk_frames=3),
              OnDeviceSampling(chunk_frames=3),               # greedy
              OnDeviceSampling(temperature=1.3, top_p=0.7, chunk_frames=3),
              OnDeviceSampling(temperature=0.5, min_p=0.2, chunk_frames=3)]
    prompts = _prompts(4, seed=23)
    handles = [batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                              prompts[i], seed=40 + i, max_steps=5,
                              sampling=chains[i])
               for i in range(4)]
    batcher.drain()
    for i, hd in enumerate(handles):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompts[i],
                             seed=40 + i, max_steps=5, ods=chains[i])
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps


def test_bucketed_prefill_admission_matches(rda_gguf, tiny_backbone_gguf):
    """Engine with prefill_bucket: admissions prefill the whole prompt in
    one bucket-padded forward. Codes match the single-stream run using
    the SAME bucketed prefill (the batched forward is not bit-identical
    to the per-token loop, so like compares with like)."""
    from codec_tpu.lm.tts_runner import run_codebook_ar

    path, _ = rda_gguf
    shared = create_lm(GGUFReader(path))
    bb = _fresh_backbone(tiny_backbone_gguf)
    batcher = ContinuousBatcher(bb, shared, n_slots=2, on_device=ODS,
                                decode=False, prefill_bucket=4)
    rng = np.random.default_rng(31)
    prompts = [[(rng.standard_normal(H) * 0.3).astype(np.float32)
                for _ in range(n)] for n in (3, 5, 7)]   # pad 3->4, 5->8, 7->8
    handles = [batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                              prompts[i], seed=60 + i, max_steps=5)
               for i in range(3)]
    batcher.drain()
    for i, hd in enumerate(handles):
        got = hd.wait(timeout=0)
        ref = run_codebook_ar(
            AudioLM(GGUFReader(path)), _fresh_backbone(tiny_backbone_gguf),
            prompts[i], max_steps=5, decode=False, prefill_bucket=4,
            on_device=dataclasses.replace(ODS, seed=60 + i))
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps


def test_cancellation(rda_gguf, tiny_backbone_gguf):
    """Cancel a QUEUED request (dropped at the admission scan) and an
    ACTIVE one (retired at the next chunk boundary, slot freed): both
    handles raise RequestCancelled, every other request still matches
    its single-stream run, and a request admitted into the freed slot
    is unaffected."""
    from codec_tpu.serve.cont_batch import RequestCancelled

    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf, n_slots=2)
    prompts = _prompts(4, seed=41)

    # fill both slots with long generations, queue a 3rd, cancel it
    h0 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[0],
                        seed=70, max_steps=6)
    h1 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[1],
                        seed=71, max_steps=6)
    hq = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[2],
                        seed=72, max_steps=6)
    assert hq.cancel() is True
    assert batcher.step() == 2            # queued-cancelled never admitted
    assert hq.done
    with pytest.raises(RequestCancelled):
        hq.wait(timeout=0)

    # cancel stream 1 mid-generation; it retires at the chunk boundary
    assert h1.cancel() is True
    batcher.step()
    with pytest.raises(RequestCancelled):
        h1.wait(timeout=0)
    # freed slot takes a new request; survivors match single-stream runs
    h3 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[3],
                        seed=73, max_steps=4)
    batcher.drain()
    for hd, prompt, seed, ms in ((h0, prompts[0], 70, 6),
                                 (h3, prompts[3], 73, 4)):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompt, seed, ms)
        np.testing.assert_array_equal(got.codes, ref.codes)
    # cancelling a finished request is a no-op
    assert h0.cancel() is False


def test_submit_validation(rda_gguf, tiny_backbone_gguf):
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf)
    other_lm = create_lm(GGUFReader(path))
    with pytest.raises(ValueError, match="share the engine CodecLM"):
        batcher.submit(AudioLM(GGUFReader(path), lm=other_lm), _prompts(1)[0])
    with pytest.raises(ValueError, match="prompt embedding"):
        batcher.submit(AudioLM(GGUFReader(path), lm=shared), [])


def test_dp_sharded_engine_matches(rda_gguf, tiny_backbone_gguf):
    """Slot state sharded over a 2-device dp mesh: results still match the
    single-stream runs, and the KV batch is really device-sharded
    (composes with a TP backbone exactly like run_codebook_ar_batch)."""
    import jax

    from codec_tpu.parallel.mesh import make_mesh

    path, _ = rda_gguf
    shared = create_lm(GGUFReader(path))
    bb = _fresh_backbone(tiny_backbone_gguf)
    batcher = ContinuousBatcher(bb, shared, n_slots=2, on_device=ODS,
                                decode=False, mesh=make_mesh(2, axis="dp"))
    prompts = _prompts(3, seed=17)
    handles = [batcher.submit(AudioLM(GGUFReader(path), lm=shared),
                              prompts[i], seed=50 + i, max_steps=5)
               for i in range(3)]
    batcher.step()
    assert len(batcher._kv.sharding.device_set) == 2, \
        "slot KV state is not device-sharded"
    batcher.drain()
    for i, hd in enumerate(handles):
        got = hd.wait(timeout=0)
        ref = _single_stream(path, tiny_backbone_gguf, prompts[i],
                             seed=50 + i, max_steps=5)
        np.testing.assert_array_equal(got.codes, ref.codes)
        assert got.n_steps == ref.n_steps


def test_dp_slots_divisibility(rda_gguf, tiny_backbone_gguf):
    from codec_tpu.parallel.mesh import make_mesh

    path, _ = rda_gguf
    shared = create_lm(GGUFReader(path))
    with pytest.raises(ValueError, match="not\\s+divisible"):
        ContinuousBatcher(_fresh_backbone(tiny_backbone_gguf), shared,
                          n_slots=3, on_device=ODS,
                          mesh=make_mesh(2, axis="dp"))


def test_frame_cb_error_fails_only_that_request(rda_gguf,
                                                tiny_backbone_gguf):
    """A broken frame callback (e.g. a dead streaming consumer) fails ITS
    request and frees the slot; concurrent streams are untouched and the
    slot admits new work afterwards."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf, n_slots=2)
    prompts = _prompts(3, seed=23)

    def bad_cb(codes):
        raise RuntimeError("consumer broke")

    h_bad = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[0],
                           seed=80, max_steps=6, frame_cb=bad_cb)
    h_ok = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[1],
                          seed=81, max_steps=6)
    batcher.drain()
    with pytest.raises(RuntimeError, match="consumer broke"):
        h_bad.wait(timeout=0)
    got = h_ok.wait(timeout=0)
    ref = _single_stream(path, tiny_backbone_gguf, prompts[1],
                         seed=81, max_steps=6)
    np.testing.assert_array_equal(got.codes, ref.codes)

    h2 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[2],
                        seed=82, max_steps=4)
    batcher.drain()
    ref2 = _single_stream(path, tiny_backbone_gguf, prompts[2],
                          seed=82, max_steps=4)
    np.testing.assert_array_equal(h2.wait(timeout=0).codes, ref2.codes)


def test_engine_thread_survives_step_failure(rda_gguf, tiny_backbone_gguf):
    """An engine-level step() failure resolves every in-flight handle with
    the error (fail_all) instead of hanging them, and the engine thread
    keeps serving subsequent requests."""
    path, _ = rda_gguf
    batcher, shared = _engine(path, tiny_backbone_gguf, n_slots=2)
    real_step = batcher.step
    armed = threading.Event()
    armed.set()

    def step():
        if armed.is_set() and (batcher.n_active or batcher.n_queued):
            armed.clear()
            raise RuntimeError("injected engine failure")
        return real_step()

    batcher.step = step
    eng = EngineThread(batcher)
    eng.start()
    prompts = _prompts(2, seed=29)
    h0 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[0],
                        seed=90, max_steps=4)
    with pytest.raises(RuntimeError, match="injected engine failure"):
        h0.wait(timeout=300)
    # the thread survived; the next request completes correctly
    h1 = batcher.submit(AudioLM(GGUFReader(path), lm=shared), prompts[1],
                        seed=91, max_steps=4)
    got = h1.wait(timeout=300)
    eng.stop()
    assert not eng.is_alive()
    ref = _single_stream(path, tiny_backbone_gguf, prompts[1],
                         seed=91, max_steps=4)
    np.testing.assert_array_equal(got.codes, ref.codes)

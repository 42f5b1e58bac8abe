"""HTTP serving layer (codec_tpu/serve) — endpoints over a fixture model.
No reference analog; this is the TPU rebuild's production-serving surface."""

import http.client
import json
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from test_wavtokenizer_parity import HOP, TorchWT
    from codec_tpu.convert import get_converter
    from codec_tpu.serve import CodecHTTPServer

    ref = TorchWT().eval()
    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    path = tmp_path_factory.mktemp("srv") / "wt.gguf"
    c.convert_and_save(path)

    srv = CodecHTTPServer(str(path), port=0)     # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _req(srv, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_health(server):
    status, data = _req(server, "GET", "/health")
    assert status == 200
    info = json.loads(data)
    assert info["arch"] == "wavtokenizer" and info["has_decoder"]


def test_decode_roundtrip(server):
    codes = [[1], [2], [3], [4]]
    status, data = _req(server, "POST", "/decode",
                        json.dumps({"codes": codes}))
    assert status == 200
    assert data[:4] == b"RIFF"
    n = (len(data) - 44) // 2
    assert n == 4 * server.model.hop_size

    # encode the decoded audio back through /encode
    status2, data2 = _req(server, "POST", "/encode", data)
    assert status2 == 200
    got = json.loads(data2)["codes"]
    assert len(got) == 4 and len(got[0]) == 1


def test_batch_decode_endpoint(server):
    import base64

    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 16, (t, 1)).tolist() for t in (3, 6, 3)]
    status, data = _req(server, "POST", "/batch_decode",
                        json.dumps({"sequences": seqs}))
    assert status == 200
    wavs = [base64.b64decode(w) for w in json.loads(data)["wavs"]]
    assert len(wavs) == 3
    for s, w in zip(seqs, wavs):
        # each WAV matches the single-sequence /decode response; the
        # batched group compiles a different (b>1) graph, so allow the
        # one-LSB float-reorder drift CLAUDE.md documents
        st, single = _req(server, "POST", "/decode",
                          json.dumps({"codes": s}))
        assert st == 200 and len(w) == len(single)
        a = np.frombuffer(w[44:], dtype="<i2").astype(np.int32)
        b = np.frombuffer(single[44:], dtype="<i2").astype(np.int32)
        assert int(np.abs(a - b).max()) <= 1


def test_errors(server):
    assert _req(server, "GET", "/nope")[0] == 404
    status, data = _req(server, "POST", "/decode", "not json")
    assert status == 400 and b"error" in data
    status, _ = _req(server, "POST", "/decode", json.dumps({"codes": [1, 2]}))
    assert status == 400
    status, data = _req(server, "POST", "/synthesize",
                        json.dumps({"text": "x"}))
    assert status == 400 and b"flow_lm" in data


# ---------------------------------------------------------------------------
# concurrency: shared weights + compiled fns, per-request generation state
# (reference analog: multiple codec_lm_state over one codec_lm,
#  src/lm/lm_internal.h:63-68)
# ---------------------------------------------------------------------------

def test_concurrent_decode_matches_serial(server):
    rng = np.random.default_rng(3)
    reqs = [rng.integers(0, 16, (4, 1)).tolist() for _ in range(8)]
    serial = [_req(server, "POST", "/decode", json.dumps({"codes": c}))
              for c in reqs]
    assert all(s == 200 for s, _ in serial)

    results = [None] * len(reqs)

    def worker(i):
        results[i] = _req(server, "POST", "/decode",
                          json.dumps({"codes": reqs[i]}))
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    for (ss, sd), (cs, cd) in zip(serial, results):
        assert cs == 200
        assert cd == sd            # byte-identical audio under concurrency


@pytest.fixture(scope="module")
def tts_server(tmp_path_factory):
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    # reuse the pocket+flow fixture recipe (module-scoped fixtures can't be
    # requested across modules; call the wrapped builder directly)
    gguf = tc.pocket_flow_gguf.__wrapped__(tmp_path_factory)
    srv = CodecHTTPServer(str(gguf), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_concurrent_synthesize_state_isolation(tts_server):
    """N concurrent /synthesize with distinct seeds must produce exactly
    the audio each (text, seed) produces serially — proves per-request
    LmState isolation on shared compiled functions."""
    reqs = [{"text": "hello there", "seed": s, "max_frames": 4}
            for s in range(4)]
    serial = [_req(tts_server, "POST", "/synthesize", json.dumps(r))
              for r in reqs]
    assert all(s == 200 for s, _ in serial)
    # distinct seeds -> distinct audio (rules out trivially equal outputs)
    assert len({d for _, d in serial}) == len(serial)

    results = [None] * len(reqs)

    def worker(i):
        results[i] = _req(tts_server, "POST", "/synthesize",
                          json.dumps(reqs[i]))
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    for (ss, sd), (cs, cd) in zip(serial, results):
        assert cs == 200 and cd == sd


@pytest.fixture(scope="module")
def ar_server(tmp_path_factory):
    """Codebook-AR serving: mimi+rda codec GGUF + llama backbone GGUF
    (fixture recipe shared with tests/test_cli_tts.py)."""
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    model_path, bb_path = tc.mimi_rda_and_backbone.__wrapped__(
        tmp_path_factory)
    srv = CodecHTTPServer(str(model_path), port=0,
                          backbone_path=str(bb_path))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_decode_stream_endpoint(ar_server):
    """Chunked streaming decode on the (causal) mimi model: the streamed
    PCM matches the whole-sequence decode within the usual one-LSB
    cross-graph drift."""
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 16, (7, ar_server.model.n_q)).tolist()
    status, wav = _req(ar_server, "POST", "/decode_stream",
                       json.dumps({"codes": codes, "chunk_frames": 3}))
    assert status == 200 and wav[:4] == b"RIFF"
    got = np.frombuffer(wav[44:], dtype="<i2").astype(np.int32)
    ref_pcm = ar_server.model.decode(np.asarray(codes, np.int32))
    ref = (np.clip(ref_pcm, -1.0, 1.0) * 32767.0).astype(np.int16)
    assert got.shape[0] == ref.shape[0]
    assert int(np.abs(got - ref.astype(np.int32)).max()) <= 1

    # non-causal models refuse cleanly
    # (the module-level `server` fixture is WavTokenizer)


def test_decode_stream_rejects_non_causal(server):
    status, data = _req(server, "POST", "/decode_stream",
                        json.dumps({"codes": [[1], [2]]}))
    assert status == 400 and b"no streaming decode path" in data


def test_backbone_synthesize_endpoint(ar_server):
    req = {"text": "hello there", "seed": 3, "max_frames": 4}
    status, wav = _req(ar_server, "POST", "/synthesize", json.dumps(req))
    assert status == 200 and wav[:4] == b"RIFF" and len(wav) > 44
    # deterministic per seed (SamplerChain + greedy depth codebooks)
    status2, wav2 = _req(ar_server, "POST", "/synthesize", json.dumps(req))
    assert status2 == 200 and wav2 == wav
    # concurrent requests serialize on the backbone lock and both finish
    out = {}

    def worker(i):
        out[i] = _req(ar_server, "POST", "/synthesize",
                      json.dumps(dict(req, seed=10 + i)))
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert sorted(out) == [0, 1]
    assert all(v[0] == 200 for v in out.values())


def test_concurrent_stream_and_batch_synthesize(tts_server):
    """A chunked streaming synthesize interleaved with plain ones: all
    complete, and the streamed PCM equals its non-stream counterpart."""
    batch_req = {"text": "hello", "seed": 9, "max_frames": 4}
    stream_req = dict(batch_req, stream=True)
    _, batch_wav = _req(tts_server, "POST", "/synthesize",
                        json.dumps(batch_req))

    out = {}

    def stream_worker():
        out["stream"] = _req(tts_server, "POST", "/synthesize",
                             json.dumps(stream_req))

    def batch_worker(i):
        out[f"b{i}"] = _req(tts_server, "POST", "/synthesize",
                            json.dumps(batch_req))
    ts = [threading.Thread(target=stream_worker)] + \
        [threading.Thread(target=batch_worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert set(out) == {"stream", "b0", "b1"}, \
        f"legs that completed: {sorted(out)} (missing ones died/timed out)"
    assert all(v[0] == 200 for v in out.values())
    for i in range(2):
        assert out[f"b{i}"][1] == batch_wav
    # http.client de-chunks; strip both WAV headers and compare PCM16.
    # The streamed leg vocodes frame-by-frame (chunked causal convs) vs
    # one whole-sequence decode — mathematically identical but compiled
    # as different graphs, so float reassociation leaves ~1e-6 drift that
    # can flip a 16-bit sample by one LSB; concurrency correctness is
    # what this test pins down, so allow exactly that.
    import numpy as _np

    a = _np.frombuffer(out["stream"][1][44:], dtype="<i2").astype(_np.int32)
    b = _np.frombuffer(batch_wav[44:], dtype="<i2").astype(_np.int32)
    assert a.shape == b.shape
    assert int(_np.abs(a - b).max()) <= 1


def test_synthesize_batch_endpoint(ar_server):
    """B texts through one vmapped on-device generation loop: per-text
    WAVs, deterministic per (seed, stream index)."""
    import base64

    req = {"texts": ["hello there", "hello hello"], "seed": 4,
           "max_frames": 4, "chunk_frames": 2}
    status, body = _req(ar_server, "POST", "/synthesize_batch",
                        json.dumps(req))
    assert status == 200, body
    out = json.loads(body)
    assert len(out["wavs"]) == 2 and out["sample_rate"] == 24000
    wavs = [base64.b64decode(w) for w in out["wavs"]]
    assert all(w[:4] == b"RIFF" and len(w) > 44 for w in wavs)
    assert all(n >= 1 for n in out["n_frames"])

    status2, body2 = _req(ar_server, "POST", "/synthesize_batch",
                          json.dumps(req))
    assert status2 == 200 and json.loads(body2)["wavs"] == out["wavs"]

    # per-text sampling: stream 0 keeps the defaults (same WAV as the
    # plain batch), stream 1's hotter chain changes its codes/audio;
    # deterministic on replay. Chains ride as a traced per-stream input.
    sreq = dict(req, sampling=[{}, {"temperature": 1.5, "top_k": 3}])
    status3, body3 = _req(ar_server, "POST", "/synthesize_batch",
                          json.dumps(sreq))
    assert status3 == 200, body3
    out3 = json.loads(body3)
    assert out3["wavs"][0] == out["wavs"][0]
    assert out3["wavs"][1] != out["wavs"][1]
    status4, body4 = _req(ar_server, "POST", "/synthesize_batch",
                          json.dumps(sreq))
    assert status4 == 200 and json.loads(body4)["wavs"] == out3["wavs"]


def test_backbone_tp_server_matches(ar_server, tmp_path_factory):
    """A server started with a TP-sharded backbone (--tp analog) answers
    /synthesize with the same WAV bytes as the unsharded server."""
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    req = {"text": "hello there", "seed": 3, "max_frames": 4}
    status, want = _req(ar_server, "POST", "/synthesize", json.dumps(req))
    assert status == 200

    model_path, bb_path = tc.mimi_rda_and_backbone.__wrapped__(
        tmp_path_factory)
    srv = CodecHTTPServer(str(model_path), port=0,
                          backbone_path=str(bb_path),
                          backbone_mesh=("tp", 2))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, wav = _req(srv, "POST", "/synthesize", json.dumps(req))
        assert status == 200 and wav == want
        sh = srv.backbone.params["layers"]["q"].sharding
        assert len(sh.device_set) == 2 and not sh.is_fully_replicated
    finally:
        srv.shutdown()


def test_synthesize_batch_dp_tp_server(ar_server, tmp_path_factory):
    """A server on a 2-D (dp=2, tp=2) mesh answers /synthesize_batch with
    the same WAVs as the unsharded server (streams split over dp,
    backbone GEMMs over tp)."""
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    req = {"texts": ["hello there", "more words"], "seed": 5,
           "max_frames": 4}
    status, body = _req(ar_server, "POST", "/synthesize_batch",
                        json.dumps(req))
    assert status == 200
    want = json.loads(body)["wavs"]

    model_path, bb_path = tc.mimi_rda_and_backbone.__wrapped__(
        tmp_path_factory)
    srv = CodecHTTPServer(str(model_path), port=0,
                          backbone_path=str(bb_path),
                          backbone_mesh=("tp", 2), dp=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        assert srv.batch_mesh is not None
        assert dict(srv.batch_mesh.shape) == {"dp": 2, "tp": 2}
        status, body = _req(srv, "POST", "/synthesize_batch",
                            json.dumps(req))
        assert status == 200
        assert json.loads(body)["wavs"] == want
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# continuous batching (--cont-batch; serve/cont_batch.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cont_server(tmp_path_factory):
    """Same mimi+rda+backbone artifacts as ar_server (identical fixed
    torch seeds → identical weights), served through a 2-slot
    continuous-batching engine."""
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    model_path, bb_path = tc.mimi_rda_and_backbone.__wrapped__(
        tmp_path_factory)
    srv = CodecHTTPServer(str(model_path), port=0,
                          backbone_path=str(bb_path),
                          cont_batch=2, chunk_frames=8)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_cont_batch_matches_serialized_path(ar_server, cont_server):
    """A continuous-batching /synthesize answers byte-identically to the
    serialized on-device chunked path on the same weights/seed — the
    engine is a pure scheduling upgrade."""
    req = {"text": "hello there", "seed": 3, "max_frames": 6}
    status_ref, wav_ref = _req(
        ar_server, "POST", "/synthesize",
        json.dumps(dict(req, on_device=True, chunk_frames=8)))
    status, wav = _req(cont_server, "POST", "/synthesize", json.dumps(req))
    assert status_ref == 200 and status == 200
    assert wav == wav_ref


def test_cont_batch_concurrent_requests(cont_server):
    """More concurrent requests than engine slots: all succeed, each is
    per-seed deterministic (re-requesting returns identical bytes even
    though slot assignment/batch composition differ run to run)."""
    out = {}

    def worker(i):
        out[i] = _req(cont_server, "POST", "/synthesize",
                      json.dumps({"text": f"words {i}", "seed": 40 + i,
                                  "max_frames": 5}))
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert sorted(out) == [0, 1, 2, 3]
    assert all(v[0] == 200 for v in out.values())
    for i in (0, 3):                    # replay alone == concurrent run
        status, wav = _req(cont_server, "POST", "/synthesize",
                           json.dumps({"text": f"words {i}",
                                       "seed": 40 + i, "max_frames": 5}))
        assert status == 200 and wav == out[i][1]


def test_cont_batch_stream_synthesize(cont_server):
    """{"stream": true} through the continuous-batching engine: frames
    vocode through a streaming session as they emit; the de-chunked PCM
    matches the non-streamed response within the usual one-LSB
    cross-graph drift (chunked causal convs vs whole-sequence decode)."""
    req = {"text": "hello there", "seed": 5, "max_frames": 7}
    s_ref, wav_ref = _req(cont_server, "POST", "/synthesize",
                          json.dumps(req))
    s_st, wav_st = _req(cont_server, "POST", "/synthesize",
                        json.dumps(dict(req, stream=True)))
    assert s_ref == 200 and s_st == 200
    a = np.frombuffer(wav_st[44:], dtype="<i2").astype(np.int32)
    b = np.frombuffer(wav_ref[44:], dtype="<i2").astype(np.int32)
    assert a.shape == b.shape and a.shape[0] > 0
    assert int(np.abs(a - b).max()) <= 1


def test_cont_batch_dp_server_matches(cont_server, tmp_path_factory):
    """--dp 2 --cont-batch 2: the engine's slot state shards over the dp
    mesh and /synthesize answers byte-identically to the unsharded
    continuous-batching server (and per-request sampling still applies)."""
    import test_cli_tts as tc
    from codec_tpu.serve import CodecHTTPServer

    model_path, bb_path = tc.mimi_rda_and_backbone.__wrapped__(
        tmp_path_factory)
    srv = CodecHTTPServer(str(model_path), port=0,
                          backbone_path=str(bb_path),
                          cont_batch=2, chunk_frames=8, dp=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        assert len(srv._cont_batcher._mesh.devices.ravel()) == 2
        for req in ({"text": "hello there", "seed": 3, "max_frames": 6},
                    {"text": "hello there", "seed": 3, "max_frames": 6,
                     "temperature": 1.3, "top_k": 4}):
            s_ref, wav_ref = _req(cont_server, "POST", "/synthesize",
                                  json.dumps(req))
            s_dp, wav_dp = _req(srv, "POST", "/synthesize", json.dumps(req))
            assert s_ref == 200 and s_dp == 200
            assert wav_dp == wav_ref
    finally:
        srv.shutdown()


def test_stats_endpoint(cont_server, server):
    status, data = _req(cont_server, "GET", "/stats")
    assert status == 200
    info = json.loads(data)
    assert info["backbone"] is True
    assert info["cont_batch"]["slots"] == 2
    assert info["cont_batch"]["active"] == 0          # idle engine
    status, data = _req(server, "GET", "/stats")      # plain codec server
    assert status == 200 and json.loads(data)["cont_batch"] is None

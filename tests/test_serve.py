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


def test_errors(server):
    assert _req(server, "GET", "/nope")[0] == 404
    status, data = _req(server, "POST", "/decode", "not json")
    assert status == 400 and b"error" in data
    status, _ = _req(server, "POST", "/decode", json.dumps({"codes": [1, 2]}))
    assert status == 400
    status, data = _req(server, "POST", "/synthesize",
                        json.dumps({"text": "x"}))
    assert status == 400 and b"flow_lm" in data

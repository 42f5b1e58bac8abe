"""Product-surface TTS smoke: drive `tts_cli synthesize` in a REAL
subprocess over a self-contained Pocket-TTS fixture GGUF (pocket_mimi codec
+ flow_lm adaptor + baked SPM tokenizer), then validate the WAV.

CI analog of the reference's ttscli_synthesize_smoke
(/root/reference/.github/workflows/e2e.yml:41-79 runs the tts surface on
every push); the in-process variants live in tests/test_cli_tts.py — this
one exercises the actual CLI process: imports, argv parsing, file IO.

Run: JAX_PLATFORMS=cpu python tests/e2e/tts_smoke.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_fixture(tmp: str) -> str:
    import numpy as np
    import torch

    from test_cli_tts import _merge_gguf, _spm_b64
    from test_flow_lm import (DM, FDEPTH, FDIM, H, HD as FHD, L, LDIM, LSD,
                              TorchFlow)
    from test_pocket_mimi_parity import (HD as PHD, HEADS, HOP, LAT, OUTER,
                                         RATIOS, TFL, TorchPocket)
    from codec_tpu.convert import get_converter

    assert LDIM == LAT
    ref = TorchPocket()
    c = get_converter("pocket_tts")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in ref.sd.items()}, {
        "sample_rate": 24000, "hop_size": HOP, "ldim": LAT,
        "decoder_ratios": list(RATIOS), "encoder_ratios": list(RATIOS[::-1]),
        "outer_dim": OUTER, "tf_layers": TFL, "tf_heads": HEADS,
        "tf_head_dim": PHD, "tf_context": 250, "tf_max_period": 10000.0,
    })
    codec_path = os.path.join(tmp, "pocket_codec.gguf")
    c.convert_and_save(codec_path)

    flow = TorchFlow()

    def add_flow(w):
        w.add_bool("codec.lm.has_adaptor", True)
        w.add_string("codec.lm.kind", "flow_lm")
        w.add_uint32("codec.lm.d_model", DM)
        w.add_uint32("codec.lm.n_layers", L)
        w.add_uint32("codec.lm.n_heads", H)
        w.add_uint32("codec.lm.head_dim", FHD)
        w.add_uint32("codec.lm.ldim", LDIM)
        w.add_uint32("codec.lm.flow_dim", FDIM)
        w.add_uint32("codec.lm.flow_depth", FDEPTH)
        w.add_uint32("codec.lm.lsd_decode_steps", LSD)
        w.add_bool("codec.lm.insert_bos_before_voice", True)
        w.add_float32("codec.lm.eos_threshold", -4.0)
        w.add_string("codec.lm.tokenizer.spm_b64", _spm_b64())
        for name, t in flow.t.items():
            if name == "lm.text.embed.w":
                g = torch.Generator().manual_seed(11)
                t = torch.randn(300, t.shape[1], generator=g) * 0.25
            w.add_tensor(name, t.numpy())

    del np  # fixture helpers only
    return _merge_gguf(codec_path, os.path.join(tmp, "pocket_flow.gguf"),
                       add_flow)


def main() -> int:
    import numpy as np

    with tempfile.TemporaryDirectory() as tmp:
        gguf = build_fixture(tmp)
        out = os.path.join(tmp, "o.wav")
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        for extra in ([], ["--stream"]):
            r = subprocess.run(
                [sys.executable, "-m", "codec_tpu.cli.tts_cli", "synthesize",
                 "--model", str(gguf), "--text", "hello there",
                 "--max-frames", "12", "--out", out] + extra,
                env=env, cwd=tmp, capture_output=True, text=True, timeout=900)
            if r.returncode != 0:
                print(r.stdout)
                print(r.stderr, file=sys.stderr)
                print(f"FAIL: synthesize {extra} exited {r.returncode}")
                return 1
            from codec_tpu.io.wav import read_wav
            pcm, sr = read_wav(out)
            assert sr == 24000, sr
            assert pcm.size > 0 and np.isfinite(pcm).all(), pcm.shape
            print(f"tts_smoke OK{' (stream)' if extra else ''}: "
                  f"{pcm.size} samples @ {sr} Hz, rms={np.sqrt((pcm**2).mean()):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

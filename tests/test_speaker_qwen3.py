"""Qwen3-TTS ECAPA-TDNN speaker encoder parity vs a torch mirror."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFReader, GGUFWriter

MEL = 8
CH = (16, 16, 16, 24)          # enc_channels (last = MFA out)
KS = (5, 3, 3, 1)
DIL = (1, 2, 3, 1)
SCALE = 4
ATTN_CH = 8
ENC_DIM = 20
N_FFT, HOP = 64, 16
SR = 24000


def conv_reflect(x, w, b, dil):
    # x [C_in, T]; w [out, in, K]
    k = w.shape[-1]
    keff = (k - 1) * dil + 1
    c = keff // 2
    xp = F.pad(x[None], (c, keff - 1 - c), mode="reflect")[0] if k > 1 else x
    return F.conv1d(xp[None], w, b, dilation=dil)[0]


class TorchEcapa:
    def __init__(self, seed=0):
        g = torch.Generator().manual_seed(seed)
        self.t = {}

        def C(name, oc, ic, k, s=0.2):
            self.t[name + ".weight"] = torch.randn(oc, ic, k, generator=g) * s
            self.t[name + ".bias"] = torch.randn(oc, generator=g) * 0.1

        C("speaker.qwen3_tts.blocks.0.conv", CH[0], MEL, KS[0])
        for bi in (1, 2):
            base = f"speaker.qwen3_tts.blocks.{bi}"
            C(base + ".tdnn1.conv", CH[bi], CH[bi - 1], 1)
            C(base + ".tdnn2.conv", CH[bi], CH[bi], 1)
            C(base + ".se.conv1", ATTN_CH, CH[bi], 1)
            C(base + ".se.conv2", CH[bi], ATTN_CH, 1)
            for ri in range(SCALE - 1):
                C(f"{base}.res2net.{ri}.conv", CH[bi] // SCALE, CH[bi] // SCALE,
                  KS[bi])
        C("speaker.qwen3_tts.mfa.conv", CH[-1], CH[1] + CH[2], 1)
        C("speaker.qwen3_tts.asp.tdnn.conv", ATTN_CH, 3 * CH[-1], 1)
        C("speaker.qwen3_tts.asp.conv", CH[-1], ATTN_CH, 1)
        C("speaker.qwen3_tts.fc", ENC_DIM, 2 * CH[-1], 1)
        g2 = torch.Generator().manual_seed(5)
        self.t["speaker.qwen3_tts.mel_basis"] = \
            torch.rand(MEL, N_FFT // 2 + 1, generator=g2) * 0.2
        self.t["speaker.qwen3_tts.window"] = torch.hann_window(N_FFT)

    def w(self, name):
        return self.t[name + ".weight"], self.t[name + ".bias"]

    def forward(self, mel):
        # mel [T, MEL] → torch works in [C, T]
        with torch.no_grad():
            x = torch.as_tensor(mel).T
            x = F.relu(conv_reflect(x, *self.w("speaker.qwen3_tts.blocks.0.conv"),
                                    DIL[0]))
            outs = []
            for bi in (1, 2):
                base = f"speaker.qwen3_tts.blocks.{bi}"
                res = x
                h = F.relu(conv_reflect(x, *self.w(base + ".tdnn1.conv"), 1))
                parts = torch.chunk(h, SCALE, dim=0)
                ys = [parts[0]]
                prev = None
                for i in range(1, SCALE):
                    inp = parts[i] if i == 1 else parts[i] + prev
                    prev = F.relu(conv_reflect(
                        inp, *self.w(f"{base}.res2net.{i - 1}.conv"), DIL[bi]))
                    ys.append(prev)
                h = torch.cat(ys, dim=0)
                h = F.relu(conv_reflect(h, *self.w(base + ".tdnn2.conv"), 1))
                m = h.mean(dim=1)
                w1, b1 = self.w(base + ".se.conv1")
                w2, b2 = self.w(base + ".se.conv2")
                z = F.relu(w1[:, :, 0] @ m + b1)
                gate = torch.sigmoid(w2[:, :, 0] @ z + b2)
                h = h * gate[:, None]
                if res.shape[0] == h.shape[0]:
                    h = h + res
                outs.append(h)
                x = h
            cat = torch.cat(outs, dim=0)
            h = F.relu(conv_reflect(cat, *self.w("speaker.qwen3_tts.mfa.conv"), 1))
            mu = h.mean(dim=1, keepdim=True)
            sd = torch.sqrt(((h - mu) ** 2).mean(dim=1, keepdim=True).clamp(min=1e-12))
            T = h.shape[1]
            asp_in = torch.cat([h, mu.expand(-1, T), sd.expand(-1, T)], dim=0)
            a = torch.tanh(F.relu(conv_reflect(
                asp_in, *self.w("speaker.qwen3_tts.asp.tdnn.conv"), 1)))
            a = conv_reflect(a, *self.w("speaker.qwen3_tts.asp.conv"), 1)
            wts = torch.softmax(a, dim=1)
            pm = (wts * h).sum(dim=1)
            ps = torch.sqrt((wts * (h - pm[:, None]) ** 2).sum(dim=1).clamp(min=1e-12))
            pooled = torch.cat([pm, ps])
            fw, fb = self.w("speaker.qwen3_tts.fc")
            return (fw[:, :, 0] @ pooled + fb).numpy()


def ref_mel(pcm, mel_basis, window):
    pcm = np.asarray(pcm, np.float64)
    pad = (N_FFT - HOP) // 2
    padded = np.pad(pcm, (pad, pad), mode="reflect")
    n_frames = len(pcm) // HOP
    idx = np.arange(N_FFT)[None] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * np.asarray(window, np.float64)
    mag = np.abs(np.fft.rfft(frames, axis=1))
    mel = mag @ np.asarray(mel_basis, np.float64).T
    return np.log(np.maximum(mel, 1e-5)).astype(np.float32)


@pytest.fixture(scope="module")
def tiny_ecapa(tmp_path_factory):
    ref = TorchEcapa()
    path = tmp_path_factory.mktemp("ecapa") / "ecapa.gguf"
    w = GGUFWriter(path, "qwen3_tts_tokenizer")
    w.add_uint32("codec.sample_rate", SR)
    w.add_bool("codec.has_decoder", False)
    w.add_uint32("codec.lm.hidden_dim", ENC_DIM)
    w.add_bool("codec.speaker.has_encoder", True)
    w.add_string("codec.speaker.encoder_arch", "qwen3_tts_ecapa_tdnn")
    w.add_bool("codec.speaker.needs_ref_pcm", True)
    w.add_uint32("codec.speaker.ref_sample_rate", SR)
    w.add_uint32("codec.speaker.n_rows", 1)
    w.add_uint32("codec.speaker.hidden_dim", ENC_DIM)
    w.add_uint32("codec.speaker.ecapa.mel_dim", MEL)
    w.add_uint32("codec.speaker.ecapa.enc_dim", ENC_DIM)
    w.add_uint32("codec.speaker.ecapa.enc_attention_channels", ATTN_CH)
    w.add_uint32("codec.speaker.ecapa.enc_res2net_scale", SCALE)
    w.add_uint32("codec.speaker.ecapa.enc_se_channels", ATTN_CH)
    w.add_uint32("codec.speaker.ecapa.n_fft", N_FFT)
    w.add_uint32("codec.speaker.ecapa.hop_size", HOP)
    w.add_uint32("codec.speaker.ecapa.win_size", N_FFT)
    w.add_array("codec.speaker.ecapa.enc_channels", list(CH))
    w.add_array("codec.speaker.ecapa.enc_kernel_sizes", list(KS))
    w.add_array("codec.speaker.ecapa.enc_dilations", list(DIL))
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()
    return ref, path


def test_ecapa_parity(tiny_ecapa):
    ref, path = tiny_ecapa
    from codec_tpu.lm import create_speaker_encoder

    enc = create_speaker_encoder(GGUFReader(path))
    assert enc is not None
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(800) * 0.3).astype(np.float32)

    got = enc.encode(pcm)
    mel = ref_mel(pcm, ref.t["speaker.qwen3_tts.mel_basis"].numpy(),
                  ref.t["speaker.qwen3_tts.window"].numpy())
    want = ref.forward(mel)
    assert got.shape == (1, ENC_DIM)
    np.testing.assert_allclose(got[0], want, atol=2e-4)


def test_speaker_dispatch_none():
    import tempfile, pathlib
    from codec_tpu.lm import create_speaker_encoder

    path = pathlib.Path(tempfile.mkdtemp()) / "nospk.gguf"
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_tensor("dummy", np.zeros((2, 2), np.float32))
    w.write()
    assert create_speaker_encoder(GGUFReader(path)) is None

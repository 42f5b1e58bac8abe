"""Chatterbox S3Tokenizer parity vs a torch mirror (conv frontend + FSMN/RoPE
blocks + ternary FSQ) and a numpy mirror of the log-mel frontend."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

N_MELS = 8
HID, NH, NL = 16, 2, 2
FSMN_K = 5
N_FFT = 64
CB = 6561


def _rope_neox(x, theta=10000.0):
    # x: [B, H, T, D]; ggml NEOX mode: pair (i, i + D/2)
    b, h, t, d = x.shape
    half = d // 2
    inv = 1.0 / theta ** (torch.arange(half) / half)
    ang = torch.arange(t)[:, None] * inv[None]
    cos, sin = ang.cos(), ang.sin()
    x1, x2 = x[..., :half], x[..., half:]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


class TorchS3T:
    def __init__(self, seed=0, n_mels=N_MELS, hid=HID, nh=NH, nl=NL,
                 fsmn_k=FSMN_K, n_fft=N_FFT, fan_scale=False):
        g = torch.Generator().manual_seed(seed)
        self.t = {}
        self.n_mels, self.hid, self.nh, self.nl = n_mels, hid, nh, nl
        self.fsmn_k, self.n_fft = fsmn_k, n_fft

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps the 1280-state production
            # stack O(1) (see the round-5 fullsize gates)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        HID_, N_MELS_, NL_, FSMN_K_ = hid, n_mels, nl, fsmn_k
        P("s3t.enc.conv1.w", HID_, N_MELS_, 3)
        P("s3t.enc.conv1.b", HID_)
        P("s3t.enc.conv2.w", HID_, HID_, 3)
        P("s3t.enc.conv2.b", HID_)
        for li in range(NL_):
            base = f"s3t.enc.blk.{li}"
            P(base + ".attn_ln.w", HID_, s=0.1, off=1.0)
            P(base + ".attn_ln.b", HID_)
            P(base + ".attn.q.w", HID_, HID_)
            P(base + ".attn.q.b", HID_)
            P(base + ".attn.k.w", HID_, HID_)
            P(base + ".attn.v.w", HID_, HID_)
            P(base + ".attn.v.b", HID_)
            P(base + ".attn.o.w", HID_, HID_)
            P(base + ".attn.o.b", HID_)
            P(base + ".attn.fsmn.w", HID_, 1, FSMN_K_)
            P(base + ".mlp_ln.w", HID_, s=0.1, off=1.0)
            P(base + ".mlp_ln.b", HID_)
            P(base + ".mlp.fc1.w", 4 * HID_, HID_)
            P(base + ".mlp.fc1.b", 4 * HID_)
            P(base + ".mlp.fc2.w", HID_, 4 * HID_)
            P(base + ".mlp.fc2.b", HID_)
        P("s3t.q.proj.w", 8, HID_)
        P("s3t.q.proj.b", 8)
        # mel filters: simple normalized random non-negative filterbank
        g2 = torch.Generator().manual_seed(7)
        mf = torch.rand(N_MELS_, n_fft // 2 + 1, generator=g2) * 0.1
        self.t["s3t.mel_filters"] = mf

    def encode_from_mel(self, mel):
        """mel [T_mel, n_mels] → token ids [T_mel//4]."""
        t = self.t
        HID_, NH_, NL_, FSMN_K_ = self.hid, self.nh, self.nl, self.fsmn_k
        with torch.no_grad():
            x = mel.T[None]                              # [1, n_mels, T]
            x = F.gelu(F.conv1d(x, t["s3t.enc.conv1.w"], t["s3t.enc.conv1.b"],
                                stride=2, padding=1))
            x = F.gelu(F.conv1d(x, t["s3t.enc.conv2.w"], t["s3t.enc.conv2.b"],
                                stride=2, padding=1))
            x = x.transpose(1, 2)                        # [1, T/4, HID]
            for li in range(NL_):
                base = f"s3t.enc.blk.{li}"
                h = F.layer_norm(x, (HID_,), t[base + ".attn_ln.w"],
                                 t[base + ".attn_ln.b"], eps=1e-5)
                q = h @ t[base + ".attn.q.w"].T + t[base + ".attn.q.b"]
                k = h @ t[base + ".attn.k.w"].T
                v = h @ t[base + ".attn.v.w"].T + t[base + ".attn.v.b"]
                b_, tt, _ = q.shape
                hd = HID_ // NH_
                qh = q.view(b_, tt, NH_, hd).transpose(1, 2)
                kh = k.view(b_, tt, NH_, hd).transpose(1, 2)
                vh = v.view(b_, tt, NH_, hd).transpose(1, 2)
                qh, kh = _rope_neox(qh), _rope_neox(kh)
                a = F.scaled_dot_product_attention(qh, kh, vh)
                a = a.transpose(1, 2).reshape(b_, tt, HID_)
                attn = a @ t[base + ".attn.o.w"].T + t[base + ".attn.o.b"]
                fsmn = F.conv1d(v.transpose(1, 2), t[base + ".attn.fsmn.w"],
                                padding=FSMN_K_ // 2, groups=HID_).transpose(1, 2)
                x = x + attn + fsmn + v
                m = F.layer_norm(x, (HID_,), t[base + ".mlp_ln.w"],
                                 t[base + ".mlp_ln.b"], eps=1e-5)
                m = F.gelu(m @ t[base + ".mlp.fc1.w"].T + t[base + ".mlp.fc1.b"])
                x = x + m @ t[base + ".mlp.fc2.w"].T + t[base + ".mlp.fc2.b"]
            q = torch.tanh(x @ t["s3t.q.proj.w"].T + t["s3t.q.proj.b"])
            q = q * 0.9990000128746033
            digits = torch.round(q) + 1.0
            powers = torch.tensor([3.0 ** i for i in range(8)])
            return (digits * powers).sum(-1)[0].long().numpy()


def ref_log_mel(pcm, mel_filters, n_fft=N_FFT, hop=160, token_hop=640):
    """Numpy mirror of codec_chatterbox_s3t_prepare_log_mel."""
    pcm = np.asarray(pcm, np.float64)
    padded = -(-len(pcm) // token_hop) * token_hop
    pcm = np.pad(pcm, (0, padded - len(pcm)))
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    centered = np.pad(pcm, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = padded // hop
    idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
    frames = centered[idx] * win
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = power @ np.asarray(mel_filters, np.float64).T    # [T, n_mels]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


@pytest.fixture(scope="module")
def tiny_s3t(tmp_path_factory):
    ref = TorchS3T()
    path = tmp_path_factory.mktemp("s3t") / "s3t.gguf"
    w = GGUFWriter(path, "chatterbox_s3t")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.encode_sample_rate", 16000)
    w.add_uint32("codec.hop_size", 960)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", CB)
    w.add_uint32("codec.n_fft", N_FFT)
    w.add_uint32("codec.win_length", N_FFT)
    w.add_uint32("codec.n_mels", N_MELS)
    w.add_uint32("chatterbox_s3t.audio_state", HID)
    w.add_uint32("chatterbox_s3t.audio_head", NH)
    w.add_uint32("chatterbox_s3t.audio_layer", NL)
    w.add_uint32("chatterbox_s3t.fsmn_kernel_size", FSMN_K)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", False)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_s3t):
    _, ours = tiny_s3t
    assert ours.arch == "chatterbox_s3t"
    assert ours.has_encoder and not ours.has_decoder
    assert ours.codebook_size == CB
    assert ours.encode_sample_rate == 16000


def test_log_mel_parity(tiny_s3t):
    ref, ours = tiny_s3t
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(2000) * 0.3).astype(np.float32)  # pads to 2560
    want = ref_log_mel(pcm, ref.t["s3t.mel_filters"].numpy())
    got = ours.log_mel(pcm)
    assert got.shape == want.shape == (16, N_MELS)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_parity(tiny_s3t):
    ref, ours = tiny_s3t
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(2560) * 0.3).astype(np.float32)
    mel = ref_log_mel(pcm, ref.t["s3t.mel_filters"].numpy())
    want = ref.encode_from_mel(torch.from_numpy(mel))
    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    match = (got[:, 0] == want).mean()
    assert match == 1.0, f"token match {match}\n{got[:, 0]}\n{want}"


# ---------------------------------------------------------------------------
# Full-production-shape gate (chatterbox S3Tokenizer dims, cited from the
# reference header defaults + converter fixed config —
# src/models/chatterbox_s3t.h:7-18 / scripts/converters/chatterbox.py:432-444:
# n_fft/win 400, 128 mels, audio_state 1280, 20 heads, 6 FSMN/RoPE layers,
# fsmn kernel 31, ternary FSQ over 8 dims (codebook 6561), encode sr 16 kHz,
# hop 960 at 24 kHz). Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_N_MELS, F_HID, F_NH, F_NL = 128, 1280, 20, 6
F_FSMN_K, F_N_FFT = 31, 400


@pytest.fixture(scope="module")
def full_s3t(tmp_path_factory):
    ref = TorchS3T(seed=4, n_mels=F_N_MELS, hid=F_HID, nh=F_NH, nl=F_NL,
                   fsmn_k=F_FSMN_K, n_fft=F_N_FFT, fan_scale=True)
    path = tmp_path_factory.mktemp("s3t_full") / "full.gguf"
    w = GGUFWriter(path, "chatterbox_s3t")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.encode_sample_rate", 16000)
    w.add_uint32("codec.hop_size", 960)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", CB)
    w.add_uint32("codec.n_fft", F_N_FFT)
    w.add_uint32("codec.win_length", F_N_FFT)
    w.add_uint32("codec.n_mels", F_N_MELS)
    w.add_uint32("chatterbox_s3t.audio_state", F_HID)
    w.add_uint32("chatterbox_s3t.audio_head", F_NH)
    w.add_uint32("chatterbox_s3t.audio_layer", F_NL)
    w.add_uint32("chatterbox_s3t.fsmn_kernel_size", F_FSMN_K)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", False)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_encode_tokens_exact(full_s3t):
    """Ternary FSQ rounds tanh-bounded values — no argmin near-ties, so
    production-dim tokens must match bit-exactly (1 s of 16 kHz audio with
    a non-token-aligned tail exercising the log-mel ceil padding)."""
    ref, ours = full_s3t
    assert ours.codebook_size == CB
    rng = np.random.default_rng(13)
    pcm = (rng.standard_normal(16000 + 237) * 0.3).astype(np.float32)
    mel = ref_log_mel(pcm, ref.t["s3t.mel_filters"].numpy(), n_fft=F_N_FFT)
    want = ref.encode_from_mel(torch.from_numpy(mel))
    got = ours.encode(pcm)
    assert got.shape == (len(want), 1)
    mism = int((got[:, 0] != want).sum())
    assert mism == 0, f"{mism}/{len(want)} s3t tokens differ at full size"

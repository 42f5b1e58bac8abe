"""NeuCodec decode parity vs a torch mirror (single-codebook → Vocos-ish
transformer → iSTFT head)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

V, CBD = 64, 8
VQD, HID = 24, 32
NH, HD_ = 2, 16
NL = 2
N_FFT, HOP = 128, 32


class TorchNeu:
    def __init__(self, v=V, cbd=CBD, vqd=VQD, hid=HID, nh=NH, hd=HD_,
                 nl=NL, n_fft=N_FFT, fan_scale=False):
        self.v, self.cbd, self.vqd, self.hid = v, cbd, vqd, hid
        self.nh, self.hd, self.nl, self.n_fft = nh, hd, nl, n_fft
        V, CBD, VQD, HID = v, cbd, vqd, hid            # noqa: N806 (shadow
        NH, HD_, NL, N_FFT = nh, hd, nl, n_fft         # module tiny dims)
        g = torch.Generator().manual_seed(0)
        self.t = {}

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps production-width stacks O(1)
            # (fixed s at dim 1024 saturates the exp-mag clamp in the
            # iSTFT head, destroying the parity signal)
            if fan_scale and len(shape) >= 2 and off == 0.0:
                import math
                s = s / math.sqrt(math.prod(shape[1:]))
            v_ = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v_
            return v_

        P("neucodec.decode.codebook", V, CBD, s=1.0)
        P("neucodec.decode.quant.project_out.w", VQD, CBD)
        P("neucodec.decode.quant.project_out.b", VQD)
        P("neucodec.decode.fc_post_a.w", HID, VQD)
        P("neucodec.decode.fc_post_a.b", HID)
        P("neucodec.decode.embed.w", HID, HID, 7)
        P("neucodec.decode.embed.b", HID)
        for group in ("prior", "post"):
            for li in range(2):
                pre = f"neucodec.decode.{group}.{li}"
                P(pre + ".norm1.w", HID, s=0.2, off=1.0)
                P(pre + ".norm1.b", HID)
                P(pre + ".conv1.w", HID, HID, 3)
                P(pre + ".conv1.b", HID)
                P(pre + ".norm2.w", HID, s=0.2, off=1.0)
                P(pre + ".norm2.b", HID)
                P(pre + ".conv2.w", HID, HID, 3)
                P(pre + ".conv2.b", HID)
        for li in range(NL):
            pre = f"neucodec.decode.transformer.{li}"
            P(pre + ".att_norm.w", HID, s=0.2, off=1.0)
            P(pre + ".ffn_norm.w", HID, s=0.2, off=1.0)
            P(pre + ".att.c_attn.w", 3 * HID, HID)
            P(pre + ".att.c_proj.w", HID, HID)
            P(pre + ".mlp.fc1.w", 2 * HID, HID)
            P(pre + ".mlp.fc2.w", HID, 2 * HID)
        P("neucodec.decode.final_ln.w", HID, s=0.2, off=1.0)
        P("neucodec.decode.final_ln.b", HID)
        P("neucodec.decode.head.out.w", N_FFT + 2, HID)
        P("neucodec.decode.head.out.b", N_FFT + 2)

    def resnet(self, x, pre):
        t = self.t
        h = F.group_norm(x, 32, t[pre + ".norm1.w"], t[pre + ".norm1.b"], eps=1e-6)
        h = F.silu(h)
        h = F.conv1d(h, t[pre + ".conv1.w"], t[pre + ".conv1.b"], padding=1)
        h = F.group_norm(h, 32, t[pre + ".norm2.w"], t[pre + ".norm2.b"], eps=1e-6)
        h = F.silu(h)
        h = F.conv1d(h, t[pre + ".conv2.w"], t[pre + ".conv2.b"], padding=1)
        return x + h

    def decode_head(self, codes):
        t = self.t
        z = t["neucodec.decode.codebook"][codes]                # [B, T, CBD]
        x = z @ t["neucodec.decode.quant.project_out.w"].T + \
            t["neucodec.decode.quant.project_out.b"]
        x = x @ t["neucodec.decode.fc_post_a.w"].T + t["neucodec.decode.fc_post_a.b"]
        x = F.conv1d(x.permute(0, 2, 1), t["neucodec.decode.embed.w"],
                     t["neucodec.decode.embed.b"], padding=3)
        for li in range(2):
            x = self.resnet(x, f"neucodec.decode.prior.{li}")
        x = x.permute(0, 2, 1)
        b, T, c = x.shape

        def rms(v, w):
            return v * torch.rsqrt((v ** 2).mean(-1, keepdim=True) + 1e-6) * w

        NH, HD_, NL, HID = self.nh, self.hd, self.nl, self.hid
        for li in range(NL):
            pre = f"neucodec.decode.transformer.{li}"
            h = rms(x, t[pre + ".att_norm.w"])
            qkv = h @ t[pre + ".att.c_attn.w"].T
            q, k, v = qkv.chunk(3, -1)
            q = q.view(b, T, NH, HD_).transpose(1, 2)
            k = k.view(b, T, NH, HD_).transpose(1, 2)
            v = v.view(b, T, NH, HD_).transpose(1, 2)
            inv = 1.0 / 10000.0 ** (torch.arange(0, HD_, 2) / HD_)
            ang = torch.arange(T)[:, None] * inv[None]
            cos, sin = ang.cos(), ang.sin()

            def rot(z_):
                ze, zo = z_[..., 0::2], z_[..., 1::2]
                return torch.stack([ze * cos - zo * sin, ze * sin + zo * cos],
                                   -1).reshape(z_.shape)
            q, k = rot(q), rot(k)
            a = F.scaled_dot_product_attention(q, k, v)
            a = a.transpose(1, 2).reshape(b, T, c)
            x = x + a @ t[pre + ".att.c_proj.w"].T
            m = rms(x, t[pre + ".ffn_norm.w"])
            x = x + F.silu(m @ t[pre + ".mlp.fc1.w"].T) @ t[pre + ".mlp.fc2.w"].T
        x = x.permute(0, 2, 1)
        for li in range(2):
            x = self.resnet(x, f"neucodec.decode.post.{li}")
        x = x.permute(0, 2, 1)
        x = F.layer_norm(x, (HID,), t["neucodec.decode.final_ln.w"],
                         t["neucodec.decode.final_ln.b"], eps=1e-6)
        return x @ t["neucodec.decode.head.out.w"].T + t["neucodec.decode.head.out.b"]


@pytest.fixture(scope="module")
def tiny_neu(tmp_path_factory):
    ref = TorchNeu()
    path = tmp_path_factory.mktemp("neu") / "neu.gguf"
    w = GGUFWriter(path, "neucodec")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.hop_size", HOP)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", V)
    w.add_uint32("codec.codebook_dim", CBD)
    w.add_uint32("neucodec.vq_dim", VQD)
    w.add_uint32("neucodec.hidden_dim", HID)
    w.add_uint32("neucodec.num_layers", NL)
    w.add_uint32("neucodec.num_heads", NH)
    w.add_uint32("neucodec.head_dim", HD_)
    w.add_bool("codec.has_encoder", False)
    w.add_bool("codec.has_decoder", True)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_neu):
    _, ours = tiny_neu
    assert ours.arch == "neucodec"
    assert not ours.has_encoder and ours.has_decoder
    assert ours.codebook_size == V


def test_decode_parity(tiny_neu):
    ref, ours = tiny_neu
    rng = np.random.default_rng(0)
    t = 9
    codes = rng.integers(0, V, (1, t, 1))
    with torch.no_grad():
        head = ref.decode_head(torch.from_numpy(codes[..., 0]))
        n_bins = N_FFT // 2 + 1
        mag = torch.clamp(torch.exp(head[..., :n_bins]), max=1e2)
        S = mag * torch.exp(1j * head[..., n_bins:])
        frames = torch.fft.irfft(S, N_FFT, dim=-1)
        win = torch.hann_window(N_FFT)
        frames = frames * win
        y = torch.zeros(1, (t - 1) * HOP + N_FFT)
        env = torch.zeros_like(y)
        for f in range(t):
            y[:, f * HOP:f * HOP + N_FFT] += frames[:, f]
            env[:, f * HOP:f * HOP + N_FFT] += win ** 2
        y = y / env.clamp(min=1e-11)
        pad = (N_FFT - HOP) // 2
        want = y[0, pad:-pad].numpy()
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 2e-3


# ---------------------------------------------------------------------------
# Full-production-shape gate (VERDICT r4 #6). Dims are the ones the
# reference converter bakes for neuphonic/neucodec (reference
# scripts/converters/neucodec.py:143-160): 24 kHz, hop 480, n_fft 1920,
# FSQ 4^8 = 65536 codes over dim 8, vq 2048, hidden 1024, 12 RoPE
# transformer layers of 16 heads x 64.

F_V, F_CBD, F_VQD, F_HID = 65536, 8, 2048, 1024
F_NH, F_HD, F_NL = 16, 64, 12
F_NFFT, F_HOP = 1920, 480


@pytest.fixture(scope="module")
def full_neu(tmp_path_factory):
    ref = TorchNeu(v=F_V, cbd=F_CBD, vqd=F_VQD, hid=F_HID, nh=F_NH,
                   hd=F_HD, nl=F_NL, n_fft=F_NFFT, fan_scale=True)
    path = tmp_path_factory.mktemp("neu_full") / "neu_full.gguf"
    w = GGUFWriter(path, "neucodec")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("codec.hop_size", F_HOP)
    w.add_uint32("codec.n_fft", F_NFFT)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", F_V)
    w.add_uint32("codec.codebook_dim", F_CBD)
    w.add_uint32("neucodec.vq_dim", F_VQD)
    w.add_uint32("neucodec.hidden_dim", F_HID)
    w.add_uint32("neucodec.num_layers", F_NL)
    w.add_uint32("neucodec.num_heads", F_NH)
    w.add_uint32("neucodec.head_dim", F_HD)
    w.add_bool("codec.has_encoder", False)
    w.add_bool("codec.has_decoder", True)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_corr(full_neu):
    ref, ours = full_neu
    rng = np.random.default_rng(0)
    t = 48
    codes = rng.integers(0, F_V, (1, t, 1))
    with torch.no_grad():
        head = ref.decode_head(torch.from_numpy(codes[..., 0]))
        n_bins = F_NFFT // 2 + 1
        mag = torch.clamp(torch.exp(head[..., :n_bins]), max=1e2)
        S = mag * torch.exp(1j * head[..., n_bins:])
        frames = torch.fft.irfft(S, F_NFFT, dim=-1)
        win = torch.hann_window(F_NFFT)
        frames = frames * win
        y = torch.zeros(1, (t - 1) * F_HOP + F_NFFT)
        env = torch.zeros_like(y)
        for f in range(t):
            y[:, f * F_HOP:f * F_HOP + F_NFFT] += frames[:, f]
            env[:, f * F_HOP:f * F_HOP + F_NFFT] += win ** 2
        y = y / env.clamp(min=1e-11)
        pad = (F_NFFT - F_HOP) // 2
        want = y[0, pad:-pad].numpy()
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * F_HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 2e-3

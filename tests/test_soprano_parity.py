"""Soprano parity vs a torch mirror (latent → ConvNeXt → iSTFT with
skip-DC/Nyquist and custom window)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

LAT = 24
DIM = 32
INTER = 48
LAYERS = 2
UPSCALE = 4
HOP = 64
N_FFT = 256
DWK = 7


def make_sd(seed=0):
    g = torch.Generator().manual_seed(seed)

    def W(*shape, s=0.3):
        return torch.randn(*shape, generator=g) * s

    sd = {
        "decoder.embed.weight": W(DIM, LAT, 1),
        "decoder.embed.bias": W(DIM),
        "decoder.norm.weight": W(DIM, s=1.0), "decoder.norm.bias": W(DIM),
        "decoder.final_layer_norm.weight": W(DIM, s=1.0),
        "decoder.final_layer_norm.bias": W(DIM),
        "head.out.weight": W(N_FFT + 2, DIM), "head.out.bias": W(N_FFT + 2),
        "head.istft.window": torch.hann_window(N_FFT, periodic=False),
    }
    for li in range(LAYERS):
        p = f"decoder.convnext.{li}"
        sd[f"{p}.dwconv.weight"] = W(DIM, 1, DWK)
        sd[f"{p}.dwconv.bias"] = W(DIM)
        sd[f"{p}.norm.weight"] = W(DIM, s=1.0)
        sd[f"{p}.norm.bias"] = W(DIM)
        sd[f"{p}.pwconv1.weight"] = W(INTER, DIM)
        sd[f"{p}.pwconv1.bias"] = W(INTER)
        sd[f"{p}.pwconv2.weight"] = W(DIM, INTER)
        sd[f"{p}.pwconv2.bias"] = W(DIM)
        sd[f"{p}.gamma"] = W(DIM, s=1.0)
    return sd


def torch_decode(sd, latent):
    """latent [B, T, LAT] → pcm"""
    b, t, _ = latent.shape
    t_up = UPSCALE * (t - 1) + 1
    ti = torch.arange(t_up)
    base = torch.clamp(ti // UPSCALE, max=t - 1)
    nxt = torch.clamp(base + 1, max=t - 1)
    frac = ((ti - base * UPSCALE) / UPSCALE).float()
    x = latent[:, base] + (latent[:, nxt] - latent[:, base]) * frac[None, :, None]

    x = F.conv1d(x.permute(0, 2, 1), sd["decoder.embed.weight"], sd["decoder.embed.bias"])
    y = x.permute(0, 2, 1)
    y = F.layer_norm(y, (DIM,), sd["decoder.norm.weight"], sd["decoder.norm.bias"], eps=1e-6)
    for li in range(LAYERS):
        p = f"decoder.convnext.{li}"
        r = y
        h = F.conv1d(y.permute(0, 2, 1), sd[f"{p}.dwconv.weight"], sd[f"{p}.dwconv.bias"],
                     padding=DWK // 2, groups=DIM).permute(0, 2, 1)
        h = F.layer_norm(h, (DIM,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"], eps=1e-6)
        h = F.gelu(h @ sd[f"{p}.pwconv1.weight"].T + sd[f"{p}.pwconv1.bias"])
        h = h @ sd[f"{p}.pwconv2.weight"].T + sd[f"{p}.pwconv2.bias"]
        y = r + h * sd[f"{p}.gamma"]
    y = F.layer_norm(y, (DIM,), sd["decoder.final_layer_norm.weight"],
                     sd["decoder.final_layer_norm.bias"], eps=1e-6)
    head = y @ sd["head.out.weight"].T + sd["head.out.bias"]

    n_bins = N_FFT // 2 + 1
    logmag, phase = head[..., :n_bins], head[..., n_bins:]
    mag = torch.clamp(torch.exp(logmag), max=1e2)
    S = mag * torch.exp(1j * phase)
    S[..., 0] = 0
    S[..., -1] = 0
    frames = torch.fft.irfft(S, N_FFT, dim=-1)
    win = sd["head.istft.window"]
    frames = frames * win
    out = torch.zeros(b, (t_up - 1) * HOP + N_FFT)
    env = torch.zeros_like(out)
    for f in range(t_up):
        out[:, f * HOP:f * HOP + N_FFT] += frames[:, f]
        env[:, f * HOP:f * HOP + N_FFT] += win ** 2
    out = out / env.clamp(min=1e-11)
    pad = N_FFT // 2
    return out[:, pad:-pad]


@pytest.fixture(scope="module")
def tiny_soprano(tmp_path_factory):
    sd = make_sd()
    from codec_tpu.convert import get_converter

    c = get_converter("soprano")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in sd.items()}, {
        "sample_rate": 32000, "hop_size": HOP, "n_fft": N_FFT,
        "latent_dim": LAT, "decoder_dim": DIM, "intermediate_dim": INTER,
        "num_layers": LAYERS, "upscale": UPSCALE, "dw_kernel": DWK,
    })
    path = tmp_path_factory.mktemp("sop") / "tiny.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return sd, codec_tpu.load_model(path)


def test_config(tiny_soprano):
    _, ours = tiny_soprano
    assert ours.arch == "soprano"
    assert not ours.has_encoder and ours.has_decoder
    assert ours.latent_dim == LAT


def test_decode_latent_parity(tiny_soprano):
    sd, ours = tiny_soprano
    rng = np.random.default_rng(0)
    t = 7
    latent = (rng.standard_normal((1, t, LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = torch_decode(sd, torch.from_numpy(latent)).numpy()[0]
    got = ours.decode_latent(latent[0])
    assert got.shape == want.shape == ((UPSCALE * (t - 1) + 1 - 1) * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


def test_decode_tokens_rejected(tiny_soprano):
    _, ours = tiny_soprano
    from codec_tpu.runtime.model import CodecError

    with pytest.raises(CodecError):
        ours.decode(np.zeros((4, 1), np.int32))

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


def make_sd(seed=0, lat=LAT, dim=DIM, inter=INTER, layers=LAYERS,
            n_fft=N_FFT, dwk=DWK, fan_scale=False):
    g = torch.Generator().manual_seed(seed)

    def W(*shape, s=0.3):
        # fan_scale: 1/sqrt(fan_in) keeps activations O(1) at production
        # width (dim 768 / inter 2304) — fixed s=0.3 there saturates the
        # exp(logmag) clamp and kills the parity signal (see the round-5
        # fullsize gates, e.g. test_wavtokenizer_parity.py).
        if fan_scale and len(shape) >= 2:
            import math as _m
            s = s / _m.sqrt(_m.prod(shape[1:]))
        return torch.randn(*shape, generator=g) * s

    sd = {
        "decoder.embed.weight": W(dim, lat, 1),
        "decoder.embed.bias": W(dim),
        "decoder.norm.weight": W(dim, s=1.0), "decoder.norm.bias": W(dim),
        "decoder.final_layer_norm.weight": W(dim, s=1.0),
        "decoder.final_layer_norm.bias": W(dim),
        "head.out.weight": W(n_fft + 2, dim), "head.out.bias": W(n_fft + 2),
        "head.istft.window": torch.hann_window(n_fft, periodic=False),
    }
    for li in range(layers):
        p = f"decoder.convnext.{li}"
        sd[f"{p}.dwconv.weight"] = W(dim, 1, dwk)
        sd[f"{p}.dwconv.bias"] = W(dim)
        sd[f"{p}.norm.weight"] = W(dim, s=1.0)
        sd[f"{p}.norm.bias"] = W(dim)
        sd[f"{p}.pwconv1.weight"] = W(inter, dim)
        sd[f"{p}.pwconv1.bias"] = W(inter)
        sd[f"{p}.pwconv2.weight"] = W(dim, inter)
        sd[f"{p}.pwconv2.bias"] = W(dim)
        sd[f"{p}.gamma"] = W(dim, s=1.0)
    return sd


def torch_decode(sd, latent, dim=DIM, layers=LAYERS, upscale=UPSCALE,
                 hop=HOP, n_fft=N_FFT, dwk=DWK):
    """latent [B, T, LAT] → pcm"""
    b, t, _ = latent.shape
    t_up = upscale * (t - 1) + 1
    ti = torch.arange(t_up)
    base = torch.clamp(ti // upscale, max=t - 1)
    nxt = torch.clamp(base + 1, max=t - 1)
    frac = ((ti - base * upscale) / upscale).float()
    x = latent[:, base] + (latent[:, nxt] - latent[:, base]) * frac[None, :, None]

    x = F.conv1d(x.permute(0, 2, 1), sd["decoder.embed.weight"], sd["decoder.embed.bias"])
    y = x.permute(0, 2, 1)
    y = F.layer_norm(y, (dim,), sd["decoder.norm.weight"], sd["decoder.norm.bias"], eps=1e-6)
    for li in range(layers):
        p = f"decoder.convnext.{li}"
        r = y
        h = F.conv1d(y.permute(0, 2, 1), sd[f"{p}.dwconv.weight"], sd[f"{p}.dwconv.bias"],
                     padding=dwk // 2, groups=dim).permute(0, 2, 1)
        h = F.layer_norm(h, (dim,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"], eps=1e-6)
        h = F.gelu(h @ sd[f"{p}.pwconv1.weight"].T + sd[f"{p}.pwconv1.bias"])
        h = h @ sd[f"{p}.pwconv2.weight"].T + sd[f"{p}.pwconv2.bias"]
        y = r + h * sd[f"{p}.gamma"]
    y = F.layer_norm(y, (dim,), sd["decoder.final_layer_norm.weight"],
                     sd["decoder.final_layer_norm.bias"], eps=1e-6)
    head = y @ sd["head.out.weight"].T + sd["head.out.bias"]

    n_bins = n_fft // 2 + 1
    logmag, phase = head[..., :n_bins], head[..., n_bins:]
    mag = torch.clamp(torch.exp(logmag), max=1e2)
    S = mag * torch.exp(1j * phase)
    S[..., 0] = 0
    S[..., -1] = 0
    frames = torch.fft.irfft(S, n_fft, dim=-1)
    win = sd["head.istft.window"]
    frames = frames * win
    out = torch.zeros(b, (t_up - 1) * hop + n_fft)
    env = torch.zeros_like(out)
    for f in range(t_up):
        out[:, f * hop:f * hop + n_fft] += frames[:, f]
        env[:, f * hop:f * hop + n_fft] += win ** 2
    out = out / env.clamp(min=1e-11)
    pad = n_fft // 2
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


# ---------------------------------------------------------------------------
# Full-production-shape gate (Soprano 1.1 dims, cited from the reference
# converter's fixed config — scripts/converters/soprano.py:98-111: latent 512,
# decoder_dim 768, intermediate 2304, 8 ConvNeXt layers, upscale 4, dw_kernel
# 3, hop 512, n_fft 2048, 32 kHz). Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_LAT, F_DIM, F_INTER, F_LAYERS = 512, 768, 2304, 8
F_UPSCALE, F_HOP, F_N_FFT, F_DWK = 4, 512, 2048, 3


@pytest.fixture(scope="module")
def full_soprano(tmp_path_factory):
    sd = make_sd(seed=3, lat=F_LAT, dim=F_DIM, inter=F_INTER,
                 layers=F_LAYERS, n_fft=F_N_FFT, dwk=F_DWK, fan_scale=True)
    from codec_tpu.convert import get_converter

    c = get_converter("soprano")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in sd.items()}, {
        "sample_rate": 32000, "hop_size": F_HOP, "n_fft": F_N_FFT,
        "latent_dim": F_LAT, "decoder_dim": F_DIM, "intermediate_dim": F_INTER,
        "num_layers": F_LAYERS, "upscale": F_UPSCALE, "dw_kernel": F_DWK,
    })
    path = tmp_path_factory.mktemp("sop_full") / "full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return sd, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_latent_corr(full_soprano):
    sd, ours = full_soprano
    assert ours.latent_dim == F_LAT and ours.hop_size == F_HOP
    rng = np.random.default_rng(4)
    t = 9
    latent = (rng.standard_normal((1, t, F_LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = torch_decode(sd, torch.from_numpy(latent), dim=F_DIM,
                            layers=F_LAYERS, upscale=F_UPSCALE, hop=F_HOP,
                            n_fft=F_N_FFT, dwk=F_DWK).numpy()[0]
    got = ours.decode_latent(latent[0])
    assert got.shape == want.shape == ((F_UPSCALE * (t - 1) + 1 - 1) * F_HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 2e-3

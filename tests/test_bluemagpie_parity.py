"""BlueMagpie AudioVAE parity vs a torch mirror (causal VAE with
scale/bias conditioning and sign-preserving snake)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

LAT = 8
DEC_RATES = (2, 2)
ENC_RATES = (2, 2)
DEC_HOP = 4
ENC_HOP = 4


class TorchBM:
    def __init__(self, lat=LAT, dec_rates=DEC_RATES, enc_rates=ENC_RATES,
                 dec_chans=None, enc_chans=None, fan_scale=False):
        g = torch.Generator().manual_seed(0)
        self.t = {}
        self.lat, self.dec_rates, self.enc_rates = lat, dec_rates, enc_rates
        dec_chans = dec_chans or [(32, 16), (16, 8)]
        enc_chans = enc_chans or [(8, 16), (16, 16)]
        self.dec_chans, self.enc_chans = dec_chans, enc_chans

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps the 2048-ch production decoder
            # O(1) (see the round-5 fullsize gates for the rationale)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        def res_units(base, c):
            for ri in range(3):
                P(f"{base}.r{ri}.act1.alpha", c, s=0.5, off=0.8)
                P(f"{base}.r{ri}.conv1.w", c, 1, 7)         # depthwise
                P(f"{base}.r{ri}.conv1.b", c)
                P(f"{base}.r{ri}.act2.alpha", c, s=0.5, off=0.8)
                P(f"{base}.r{ri}.conv2.w", c, c, 1)
                P(f"{base}.r{ri}.conv2.b", c)

        P("bluemagpie.dec.conv_in_dw.w", lat, 1, 7)
        P("bluemagpie.dec.conv_in_dw.b", lat)
        P("bluemagpie.dec.conv_in_pw.w", dec_chans[0][0], lat, 1)
        P("bluemagpie.dec.conv_in_pw.b", dec_chans[0][0])
        chans = dec_chans
        for bi, ((cin, cout), s) in enumerate(zip(chans, dec_rates)):
            base = f"bluemagpie.dec.b{bi}"
            P(base + ".cond.scale", cin, s=0.2, off=1.0)
            P(base + ".cond.bias", cin)
            P(base + ".act.alpha", cin, s=0.5, off=0.8)
            P(base + ".convtr.w", cin, cout, 2 * s)
            P(base + ".convtr.b", cout)
            res_units(base, cout)
        dec_last = dec_chans[-1][1]
        P("bluemagpie.dec.act_final.alpha", dec_last, s=0.5, off=0.8)
        P("bluemagpie.dec.conv_out.w", 1, dec_last, 7)
        P("bluemagpie.dec.conv_out.b", 1)

        P("bluemagpie.enc.conv0.w", enc_chans[0][0], 1, 7)
        P("bluemagpie.enc.conv0.b", enc_chans[0][0])
        echans = enc_chans
        for bi, ((cin, cout), s) in enumerate(zip(echans, enc_rates), start=1):
            base = f"bluemagpie.enc.b{bi}"
            res_units(base, cin)
            P(base + ".act.alpha", cin, s=0.5, off=0.8)
            P(base + ".down.w", cout, cin, 2 * s)
            P(base + ".down.b", cout)
        P("bluemagpie.enc.fc_mu.w", lat, enc_chans[-1][1], 3)
        P("bluemagpie.enc.fc_mu.b", lat)

    @staticmethod
    def snake(x, a):
        a = a.view(1, -1, 1)
        return x + torch.sin(a * x) ** 2 / (a + 1e-9)

    @staticmethod
    def cconv(x, w, b, stride=1, dilation=1, groups=1):
        k = w.shape[2]
        k_eff = (k - 1) * dilation + 1
        t = x.shape[-1]
        extra = -(-t // stride) * stride - t
        x = F.pad(x, (k_eff - stride, extra))
        return F.conv1d(x, w, b, stride=stride, dilation=dilation, groups=groups)

    def unit(self, x, base, ri, d):
        t = self.t
        c = x.shape[1]
        h = self.snake(x, t[f"{base}.r{ri}.act1.alpha"])
        h = self.cconv(h, t[f"{base}.r{ri}.conv1.w"], t[f"{base}.r{ri}.conv1.b"],
                       dilation=d, groups=c)
        h = self.snake(h, t[f"{base}.r{ri}.act2.alpha"])
        h = F.conv1d(h, t[f"{base}.r{ri}.conv2.w"], t[f"{base}.r{ri}.conv2.b"])
        return x + h

    def decode(self, lat):
        t = self.t
        x = self.cconv(lat.permute(0, 2, 1), t["bluemagpie.dec.conv_in_dw.w"],
                       t["bluemagpie.dec.conv_in_dw.b"], groups=self.lat)
        x = F.conv1d(x, t["bluemagpie.dec.conv_in_pw.w"], t["bluemagpie.dec.conv_in_pw.b"])
        for bi, s in enumerate(self.dec_rates):
            base = f"bluemagpie.dec.b{bi}"
            x = x * t[base + ".cond.scale"].view(1, -1, 1) + t[base + ".cond.bias"].view(1, -1, 1)
            x = self.snake(x, t[base + ".act.alpha"])
            y = F.conv_transpose1d(x, t[base + ".convtr.w"], t[base + ".convtr.b"], stride=s)
            crop = 2 * ((s + 1) // 2) - (s % 2)
            x = y[:, :, :-crop]
            for ri, d in enumerate((1, 3, 9)):
                x = self.unit(x, base, ri, d)
        x = self.snake(x, t["bluemagpie.dec.act_final.alpha"])
        x = self.cconv(x, t["bluemagpie.dec.conv_out.w"], t["bluemagpie.dec.conv_out.b"])
        return torch.tanh(x)[:, 0]

    def encode(self, pcm):
        t = self.t
        x = self.cconv(pcm, t["bluemagpie.enc.conv0.w"], t["bluemagpie.enc.conv0.b"])
        for bi, s in enumerate(self.enc_rates, start=1):
            base = f"bluemagpie.enc.b{bi}"
            for ri, d in enumerate((1, 3, 9)):
                x = self.unit(x, base, ri, d)
            x = self.snake(x, t[base + ".act.alpha"])
            x = self.cconv(x, t[base + ".down.w"], t[base + ".down.b"], stride=s)
        x = self.cconv(x, t["bluemagpie.enc.fc_mu.w"], t["bluemagpie.enc.fc_mu.b"])
        return x.permute(0, 2, 1)


@pytest.fixture(scope="module")
def tiny_bm(tmp_path_factory):
    ref = TorchBM()
    path = tmp_path_factory.mktemp("bm") / "bm.gguf"
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_uint32("codec.encode_sample_rate", 16000)
    w.add_uint32("codec.latent_dim", LAT)
    w.add_uint32("codec.decode_hop_size", DEC_HOP)
    w.add_uint32("codec.hop_size", ENC_HOP)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", True)
    w.add_array("bluemagpie.decoder_rates", list(DEC_RATES))
    w.add_array("bluemagpie.encoder_rates", list(ENC_RATES))
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_bm):
    _, ours = tiny_bm
    assert ours.arch == "bluemagpie_audiovae"
    assert ours.latent_dim == LAT
    assert ours.sample_rate == 48000 and ours.encode_sample_rate == 16000


def test_decode_latent_parity(tiny_bm):
    ref, ours = tiny_bm
    rng = np.random.default_rng(0)
    t = 7
    z = (rng.standard_normal((1, t, LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).numpy()[0]
    got = ours.decode_latent(z[0])
    assert got.shape == want.shape == (t * DEC_HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


def test_encode_latent_parity(tiny_bm):
    ref, ours = tiny_bm
    rng = np.random.default_rng(1)
    n = ENC_HOP * 9
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = ours.encode_latent(pcm)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-3


# ---------------------------------------------------------------------------
# Full-production-shape gate (BlueMagpie / VoxCPM2 AudioVAE V2 dims, cited
# from the reference header defaults — src/models/bluemagpie_audiovae.h:18-26:
# latent 64, decoder_dim 2048 with rates (8,6,5,2,2,2) / hop 1920, encoder_dim
# 128 with rates (2,5,8,8) / hop 640, 48 kHz out, 16 kHz encode in).
# Channels halve per decoder stage (2048->32) and double per encoder stage
# (128->2048, DAC-style). Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_LAT = 64
F_DEC_RATES = (8, 6, 5, 2, 2, 2)
F_ENC_RATES = (2, 5, 8, 8)
F_DEC_HOP = 1920
F_ENC_HOP = 640
F_DEC_CHANS = [(2048, 1024), (1024, 512), (512, 256), (256, 128), (128, 64),
               (64, 32)]
F_ENC_CHANS = [(128, 256), (256, 512), (512, 1024), (1024, 2048)]


@pytest.fixture(scope="module")
def full_bm(tmp_path_factory):
    ref = TorchBM(lat=F_LAT, dec_rates=F_DEC_RATES, enc_rates=F_ENC_RATES,
                  dec_chans=F_DEC_CHANS, enc_chans=F_ENC_CHANS,
                  fan_scale=True)
    path = tmp_path_factory.mktemp("bm_full") / "full.gguf"
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_uint32("codec.encode_sample_rate", 16000)
    w.add_uint32("codec.latent_dim", F_LAT)
    w.add_uint32("codec.decode_hop_size", F_DEC_HOP)
    w.add_uint32("codec.hop_size", F_ENC_HOP)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", True)
    w.add_array("bluemagpie.decoder_rates", list(F_DEC_RATES))
    w.add_array("bluemagpie.encoder_rates", list(F_ENC_RATES))
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_latent_corr(full_bm):
    ref, ours = full_bm
    assert ours.latent_dim == F_LAT
    rng = np.random.default_rng(14)
    t = 3
    z = (rng.standard_normal((1, t, F_LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).numpy()[0]
    got = ours.decode_latent(z[0])
    assert got.shape == want.shape == (t * F_DEC_HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.slow
def test_fullsize_encode_latent_parity(full_bm):
    """non-hop-aligned tail: the reference right-pads the pcm to a hop
    multiple UPFRONT (bluemagpie_audiovae.cpp:359-365, matching
    AudioVAE.preprocess), so the mirror gets the same padded input — NOT
    per-layer ceil padding (feeding the raw tail diverges the final frame
    by 3.5e-2 at production strides; measured while writing this gate)."""
    ref, ours = full_bm
    rng = np.random.default_rng(15)
    n = F_ENC_HOP * 4 + 233
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    padded = np.pad(pcm, (0, (-n) % F_ENC_HOP))
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(padded)[None, None]).numpy()[0]
    got = ours.encode_latent(pcm)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 1e-3, f"full-size encode err={err}"

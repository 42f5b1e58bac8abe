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
    def __init__(self):
        g = torch.Generator().manual_seed(0)
        self.t = {}

        def P(name, *shape, s=0.25, off=0.0):
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

        P("bluemagpie.dec.conv_in_dw.w", LAT, 1, 7)
        P("bluemagpie.dec.conv_in_dw.b", LAT)
        P("bluemagpie.dec.conv_in_pw.w", 32, LAT, 1)
        P("bluemagpie.dec.conv_in_pw.b", 32)
        chans = [(32, 16), (16, 8)]
        for bi, ((cin, cout), s) in enumerate(zip(chans, DEC_RATES)):
            base = f"bluemagpie.dec.b{bi}"
            P(base + ".cond.scale", cin, s=0.2, off=1.0)
            P(base + ".cond.bias", cin)
            P(base + ".act.alpha", cin, s=0.5, off=0.8)
            P(base + ".convtr.w", cin, cout, 2 * s)
            P(base + ".convtr.b", cout)
            res_units(base, cout)
        P("bluemagpie.dec.act_final.alpha", 8, s=0.5, off=0.8)
        P("bluemagpie.dec.conv_out.w", 1, 8, 7)
        P("bluemagpie.dec.conv_out.b", 1)

        P("bluemagpie.enc.conv0.w", 8, 1, 7)
        P("bluemagpie.enc.conv0.b", 8)
        echans = [(8, 16), (16, 16)]
        for bi, ((cin, cout), s) in enumerate(zip(echans, ENC_RATES), start=1):
            base = f"bluemagpie.enc.b{bi}"
            res_units(base, cin)
            P(base + ".act.alpha", cin, s=0.5, off=0.8)
            P(base + ".down.w", cout, cin, 2 * s)
            P(base + ".down.b", cout)
        P("bluemagpie.enc.fc_mu.w", LAT, 16, 3)
        P("bluemagpie.enc.fc_mu.b", LAT)

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
                       t["bluemagpie.dec.conv_in_dw.b"], groups=LAT)
        x = F.conv1d(x, t["bluemagpie.dec.conv_in_pw.w"], t["bluemagpie.dec.conv_in_pw.b"])
        for bi, s in enumerate(DEC_RATES):
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
        for bi, s in enumerate(ENC_RATES, start=1):
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

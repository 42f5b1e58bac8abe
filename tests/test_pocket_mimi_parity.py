"""Pocket-Mimi parity vs a torch mirror (continuous-latent Mimi variant,
RoPE-NORMAL interleaved transformer)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

LAT = 8
OUTER = 32
TFL, HEADS, HD = 1, 2, 16
RATIOS = (2, 2, 2)       # decoder; encoder reversed
RS = 4                   # resample stride
HOP = RS * 8             # 32


class TorchPocket:
    def __init__(self):
        g = torch.Generator().manual_seed(0)
        self.sd = {}

        def P(name, *shape, s=0.25, off=0.0):
            t = torch.randn(*shape, generator=g) * s + off
            self.sd[name] = t
            return t

        # decoder seanet: l0 32->32 k7, convtr 32->16 k4s2, res@16, convtr 16->8,
        # res@8, convtr 8->8, res@8, l11 8->1 k3
        self.dec = {
            "l0": (P("mimi.decoder.model.0.conv.weight", OUTER, OUTER, 7),
                   P("mimi.decoder.model.0.conv.bias", OUTER)),
            "l11": (P("mimi.decoder.model.11.conv.weight", 1, 8, 3),
                    P("mimi.decoder.model.11.conv.bias", 1)),
        }
        chs = [(OUTER, 16), (16, 8), (8, 8)]
        for si, (li, (cin, cout)) in enumerate(zip((2, 5, 8), chs)):
            self.dec[f"tr{si}"] = (P(f"mimi.decoder.model.{li}.convtr.weight", cin, cout, 4),
                                   P(f"mimi.decoder.model.{li}.convtr.bias", cout))
            self.dec[f"r{si}c1"] = (P(f"mimi.decoder.model.{li + 1}.block.1.conv.weight",
                                      cout // 2, cout, 3),
                                    P(f"mimi.decoder.model.{li + 1}.block.1.conv.bias", cout // 2))
            self.dec[f"r{si}c2"] = (P(f"mimi.decoder.model.{li + 1}.block.3.conv.weight",
                                      cout, cout // 2, 1),
                                    P(f"mimi.decoder.model.{li + 1}.block.3.conv.bias", cout))

        # encoder: l0 1->8 k7, res@8, l3 8->16 k4s2, res@16, l6 16->32, res@32,
        # l9 32->32, l11 32->32 k3
        echs = [(8, 16), (16, 32), (32, OUTER)]
        self.enc = {
            "l0": (P("mimi.encoder.model.0.conv.weight", 8, 1, 7),
                   P("mimi.encoder.model.0.conv.bias", 8)),
            "l11": (P("mimi.encoder.model.11.conv.weight", OUTER, OUTER, 3),
                    P("mimi.encoder.model.11.conv.bias", OUTER)),
        }
        for si, (li, (cin, cout)) in enumerate(zip((3, 6, 9), echs)):
            ri = (1, 4, 7)[si]
            self.enc[f"r{si}c1"] = (P(f"mimi.encoder.model.{ri}.block.1.conv.weight",
                                      cin // 2, cin, 3),
                                    P(f"mimi.encoder.model.{ri}.block.1.conv.bias", cin // 2))
            self.enc[f"r{si}c2"] = (P(f"mimi.encoder.model.{ri}.block.3.conv.weight",
                                      cin, cin // 2, 1),
                                    P(f"mimi.encoder.model.{ri}.block.3.conv.bias", cin))
            self.enc[f"dn{si}"] = (P(f"mimi.encoder.model.{li}.conv.weight", cout, cin, 4),
                                   P(f"mimi.encoder.model.{li}.conv.bias", cout))

        self.out_proj = P("mimi.quantizer.output_proj.weight", OUTER, LAT, 1)
        self.up_dw = P("mimi.upsample.convtr.convtr.weight", OUTER, 1, 2 * RS)
        self.down = P("mimi.downsample.conv.conv.weight", LAT, OUTER, 2 * RS)

        for tf in ("mimi.encoder_transformer.transformer", "mimi.decoder_transformer.transformer"):
            for li in range(TFL):
                s = f"{tf}.layers.{li}"
                P(f"{s}.self_attn.in_proj.weight", 3 * OUTER, OUTER)
                P(f"{s}.self_attn.out_proj.weight", OUTER, OUTER)
                P(f"{s}.linear1.weight", 64, OUTER)
                P(f"{s}.linear2.weight", OUTER, 64)
                P(f"{s}.norm1.weight", OUTER, s=1.0, off=1.0)
                P(f"{s}.norm1.bias", OUTER)
                P(f"{s}.norm2.weight", OUTER, s=1.0, off=1.0)
                P(f"{s}.norm2.bias", OUTER)
                P(f"{s}.layer_scale_1.scale", OUTER, s=0.1)
                P(f"{s}.layer_scale_2.scale", OUTER, s=0.1)

    @staticmethod
    def cconv(x, w, b, stride=1):
        k = w.shape[2]
        pad_l = k - stride
        t = x.shape[-1]
        extra = -(-t // stride) * stride - t
        x = F.pad(x, (pad_l, extra))
        return F.conv1d(x, w, b, stride=stride)

    @staticmethod
    def cconv_rep(x, w, stride):
        k = w.shape[2]
        pad_l = k - stride
        t = x.shape[-1]
        extra = -(-t // stride) * stride - t
        x = F.pad(x, (pad_l, extra), mode="replicate")
        return F.conv1d(x, w, None, stride=stride)

    @staticmethod
    def cconvtr(x, w, b, stride):
        k = w.shape[2]
        y = F.conv_transpose1d(x, w, b, stride=stride)
        crop = k - stride
        return y[:, :, :-crop] if crop > 0 else y

    def resblock(self, x, c1, c2):
        h = F.elu(x)
        h = self.cconv(h, *c1)
        h = F.elu(h)
        h = self.cconv(h, *c2)
        return x + h

    def transformer(self, x, prefix):
        # x [B, T, C]; NORMAL (interleaved) rope
        for li in range(TFL):
            s = f"{prefix}.layers.{li}"
            h = F.layer_norm(x, (OUTER,), self.sd[f"{s}.norm1.weight"],
                             self.sd[f"{s}.norm1.bias"], eps=1e-5)
            qkv = h @ self.sd[f"{s}.self_attn.in_proj.weight"].T
            q, k, v = qkv.chunk(3, -1)
            b, t, _ = q.shape
            q = q.view(b, t, HEADS, HD).transpose(1, 2)
            k = k.view(b, t, HEADS, HD).transpose(1, 2)
            v = v.view(b, t, HEADS, HD).transpose(1, 2)
            inv = 1.0 / 10000.0 ** (torch.arange(0, HD, 2) / HD)
            ang = torch.arange(t)[:, None] * inv[None]
            cos, sin = ang.cos(), ang.sin()

            def rot(z):
                ze, zo = z[..., 0::2], z[..., 1::2]
                ye = ze * cos - zo * sin
                yo = ze * sin + zo * cos
                return torch.stack([ye, yo], -1).reshape(z.shape)
            q, k = rot(q), rot(k)
            att = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            att = att.transpose(1, 2).reshape(b, t, OUTER)
            x = x + (att @ self.sd[f"{s}.self_attn.out_proj.weight"].T) * \
                self.sd[f"{s}.layer_scale_1.scale"]
            m = F.layer_norm(x, (OUTER,), self.sd[f"{s}.norm2.weight"],
                             self.sd[f"{s}.norm2.bias"], eps=1e-5)
            m = F.gelu(m @ self.sd[f"{s}.linear1.weight"].T) @ self.sd[f"{s}.linear2.weight"].T
            x = x + m * self.sd[f"{s}.layer_scale_2.scale"]
        return x

    def decode(self, latent):
        # latent [B, T, LAT]
        x = (latent @ self.out_proj[:, :, 0].T).permute(0, 2, 1)
        up = torch.zeros(OUTER, OUTER, 2 * RS)
        for c in range(OUTER):
            up[c, c] = self.up_dw[c, 0]
        x = self.cconvtr(x, up, None, RS)
        x = self.transformer(x.permute(0, 2, 1), "mimi.decoder_transformer.transformer").permute(0, 2, 1)
        x = self.cconv(x, *self.dec["l0"])
        for si in range(3):
            x = F.elu(x)
            x = self.cconvtr(x, *self.dec[f"tr{si}"], RATIOS[si])
            x = self.resblock(x, self.dec[f"r{si}c1"], self.dec[f"r{si}c2"])
        x = F.elu(x)
        return self.cconv(x, *self.dec["l11"])[:, 0]

    def encode(self, pcm):
        x = self.cconv(pcm, *self.enc["l0"])
        for si, stride in enumerate(RATIOS[::-1]):
            x = self.resblock(x, self.enc[f"r{si}c1"], self.enc[f"r{si}c2"])
            x = F.elu(x)
            x = self.cconv(x, *self.enc[f"dn{si}"], stride=stride)
        x = F.elu(x)
        x = self.cconv(x, *self.enc["l11"])
        x = self.transformer(x.permute(0, 2, 1), "mimi.encoder_transformer.transformer").permute(0, 2, 1)
        return self.cconv_rep(x, self.down, RS).permute(0, 2, 1)


@pytest.fixture(scope="module")
def tiny_pocket(tmp_path_factory):
    ref = TorchPocket()
    from codec_tpu.convert import get_converter

    c = get_converter("pocket_tts")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in ref.sd.items()}, {
        "sample_rate": 24000, "hop_size": HOP, "ldim": LAT,
        "decoder_ratios": list(RATIOS), "encoder_ratios": list(RATIOS[::-1]),
        "outer_dim": OUTER, "tf_layers": TFL, "tf_heads": HEADS,
        "tf_head_dim": HD, "tf_context": 250, "tf_max_period": 10000.0,
    })
    path = tmp_path_factory.mktemp("pm") / "tiny.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_pocket):
    _, ours = tiny_pocket
    assert ours.arch == "pocket_mimi"
    assert ours.hop_size == HOP
    assert ours.latent_dim == LAT
    assert ours.cfg.resample_stride == RS


def test_decode_latent_parity(tiny_pocket):
    ref, ours = tiny_pocket
    rng = np.random.default_rng(0)
    t = 6
    z = (rng.standard_normal((1, t, LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).numpy()[0]
    got = ours.decode_latent(z[0])
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.parametrize("tail", [0, 733])
def test_encode_latent_parity(tiny_pocket, tail):
    """tail=733: non-frame-aligned input — the final partial frame must
    match the mirror's per-layer ceil padding (zeros per strided conv,
    replicate at the downsample), not upfront zero-pad semantics."""
    ref, ours = tiny_pocket
    rng = np.random.default_rng(1)
    n = HOP * 5 + tail
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = ours.encode_latent(pcm)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 1e-3, f"err={err}"


def test_streaming_decode_latent_matches_full(tiny_pocket):
    """Latent-streaming vocoder == full decode_latent (realtime-TTS path;
    no reference analog — the reference decodes whole sequences)."""
    _, ours = tiny_pocket
    rng = np.random.default_rng(9)
    t = 9
    z = (rng.standard_normal((t, ours.latent_dim)) * 0.5).astype(np.float32)
    want = ours.decode_latent(z)
    for chunk in (1, 4):
        dec = ours.streaming_decoder()
        got = np.concatenate([dec.push(z[i:i + chunk])
                              for i in range(0, t, chunk)])
        m = min(len(got), len(want))
        err = np.abs(got[:m] - want[:m]).max()
        assert err < 2e-5, f"chunk={chunk}: err {err}"

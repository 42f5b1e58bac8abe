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
    def __init__(self, lat=LAT, outer=OUTER, tfl=TFL, heads=HEADS, hd=HD,
                 ratios=RATIOS, rs=RS, dec_chs=None, ffn=None,
                 fan_scale=False):
        g = torch.Generator().manual_seed(0)
        self.sd = {}
        self.lat, self.outer, self.tfl = lat, outer, tfl
        self.heads, self.hd, self.ratios, self.rs = heads, hd, ratios, rs
        # decoder stage (in, out) channel pairs; tiny default keeps the
        # historical (32,16),(16,8),(8,8) schedule, production halves
        dec_chs = dec_chs or [(outer, 16), (16, 8), (8, 8)]
        self.dec_chs = dec_chs
        self.base = dec_chs[-1][1]          # channels at pcm rate
        self.ffn = ffn or 2 * outer

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) — at production width (512 ch, k7)
            # fixed s=0.25 multiplies activations ~15x per conv and the
            # decode blows past f32 range (see the round-5 fullsize gates)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            t = torch.randn(*shape, generator=g) * s + off
            self.sd[name] = t
            return t

        # decoder seanet: l0 outer->outer k7, then per stage
        # convtr(cin->cout, k=2*ratio, s=ratio) + res, final l11 base->1 k3
        self.dec = {
            "l0": (P("mimi.decoder.model.0.conv.weight", outer, outer, 7),
                   P("mimi.decoder.model.0.conv.bias", outer)),
            "l11": (P("mimi.decoder.model.11.conv.weight", 1, self.base, 3),
                    P("mimi.decoder.model.11.conv.bias", 1)),
        }
        chs = dec_chs
        for si, (li, (cin, cout)) in enumerate(zip((2, 5, 8), chs)):
            self.dec[f"tr{si}"] = (P(f"mimi.decoder.model.{li}.convtr.weight",
                                     cin, cout, 2 * ratios[si]),
                                   P(f"mimi.decoder.model.{li}.convtr.bias", cout))
            self.dec[f"r{si}c1"] = (P(f"mimi.decoder.model.{li + 1}.block.1.conv.weight",
                                      cout // 2, cout, 3),
                                    P(f"mimi.decoder.model.{li + 1}.block.1.conv.bias", cout // 2))
            self.dec[f"r{si}c2"] = (P(f"mimi.decoder.model.{li + 1}.block.3.conv.weight",
                                      cout, cout // 2, 1),
                                    P(f"mimi.decoder.model.{li + 1}.block.3.conv.bias", cout))

        # encoder mirrors the decoder reversed: l0 1->base k7, then per
        # stage res + down(cin->cout, k=2*ratio_rev, s=ratio_rev), l11 k3
        echs = [(co, ci) for ci, co in reversed(chs)]
        self.enc = {
            "l0": (P("mimi.encoder.model.0.conv.weight", self.base, 1, 7),
                   P("mimi.encoder.model.0.conv.bias", self.base)),
            "l11": (P("mimi.encoder.model.11.conv.weight", outer, outer, 3),
                    P("mimi.encoder.model.11.conv.bias", outer)),
        }
        rrev = tuple(ratios[::-1])
        for si, (li, (cin, cout)) in enumerate(zip((3, 6, 9), echs)):
            ri = (1, 4, 7)[si]
            self.enc[f"r{si}c1"] = (P(f"mimi.encoder.model.{ri}.block.1.conv.weight",
                                      cin // 2, cin, 3),
                                    P(f"mimi.encoder.model.{ri}.block.1.conv.bias", cin // 2))
            self.enc[f"r{si}c2"] = (P(f"mimi.encoder.model.{ri}.block.3.conv.weight",
                                      cin, cin // 2, 1),
                                    P(f"mimi.encoder.model.{ri}.block.3.conv.bias", cin))
            self.enc[f"dn{si}"] = (P(f"mimi.encoder.model.{li}.conv.weight",
                                     cout, cin, 2 * rrev[si]),
                                   P(f"mimi.encoder.model.{li}.conv.bias", cout))

        self.out_proj = P("mimi.quantizer.output_proj.weight", outer, lat, 1)
        self.up_dw = P("mimi.upsample.convtr.convtr.weight", outer, 1, 2 * rs)
        self.down = P("mimi.downsample.conv.conv.weight", lat, outer, 2 * rs)

        for tf in ("mimi.encoder_transformer.transformer", "mimi.decoder_transformer.transformer"):
            for li in range(tfl):
                s = f"{tf}.layers.{li}"
                P(f"{s}.self_attn.in_proj.weight", 3 * outer, outer)
                P(f"{s}.self_attn.out_proj.weight", outer, outer)
                P(f"{s}.linear1.weight", self.ffn, outer)
                P(f"{s}.linear2.weight", outer, self.ffn)
                P(f"{s}.norm1.weight", outer, s=1.0, off=1.0)
                P(f"{s}.norm1.bias", outer)
                P(f"{s}.norm2.weight", outer, s=1.0, off=1.0)
                P(f"{s}.norm2.bias", outer)
                P(f"{s}.layer_scale_1.scale", outer, s=0.1)
                P(f"{s}.layer_scale_2.scale", outer, s=0.1)

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
        outer, heads, hd = self.outer, self.heads, self.hd
        for li in range(self.tfl):
            s = f"{prefix}.layers.{li}"
            h = F.layer_norm(x, (outer,), self.sd[f"{s}.norm1.weight"],
                             self.sd[f"{s}.norm1.bias"], eps=1e-5)
            qkv = h @ self.sd[f"{s}.self_attn.in_proj.weight"].T
            q, k, v = qkv.chunk(3, -1)
            b, t, _ = q.shape
            q = q.view(b, t, heads, hd).transpose(1, 2)
            k = k.view(b, t, heads, hd).transpose(1, 2)
            v = v.view(b, t, heads, hd).transpose(1, 2)
            inv = 1.0 / 10000.0 ** (torch.arange(0, hd, 2) / hd)
            ang = torch.arange(t)[:, None] * inv[None]
            cos, sin = ang.cos(), ang.sin()

            def rot(z):
                ze, zo = z[..., 0::2], z[..., 1::2]
                ye = ze * cos - zo * sin
                yo = ze * sin + zo * cos
                return torch.stack([ye, yo], -1).reshape(z.shape)
            q, k = rot(q), rot(k)
            att = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            att = att.transpose(1, 2).reshape(b, t, outer)
            x = x + (att @ self.sd[f"{s}.self_attn.out_proj.weight"].T) * \
                self.sd[f"{s}.layer_scale_1.scale"]
            m = F.layer_norm(x, (outer,), self.sd[f"{s}.norm2.weight"],
                             self.sd[f"{s}.norm2.bias"], eps=1e-5)
            m = F.gelu(m @ self.sd[f"{s}.linear1.weight"].T) @ self.sd[f"{s}.linear2.weight"].T
            x = x + m * self.sd[f"{s}.layer_scale_2.scale"]
        return x

    def decode(self, latent):
        # latent [B, T, LAT]
        outer, rs = self.outer, self.rs
        x = (latent @ self.out_proj[:, :, 0].T).permute(0, 2, 1)
        up = torch.zeros(outer, outer, 2 * rs)
        for c in range(outer):
            up[c, c] = self.up_dw[c, 0]
        x = self.cconvtr(x, up, None, rs)
        x = self.transformer(x.permute(0, 2, 1), "mimi.decoder_transformer.transformer").permute(0, 2, 1)
        x = self.cconv(x, *self.dec["l0"])
        for si in range(3):
            x = F.elu(x)
            x = self.cconvtr(x, *self.dec[f"tr{si}"], self.ratios[si])
            x = self.resblock(x, self.dec[f"r{si}c1"], self.dec[f"r{si}c2"])
        x = F.elu(x)
        return self.cconv(x, *self.dec["l11"])[:, 0]

    def encode(self, pcm):
        x = self.cconv(pcm, *self.enc["l0"])
        for si, stride in enumerate(self.ratios[::-1]):
            x = self.resblock(x, self.enc[f"r{si}c1"], self.enc[f"r{si}c2"])
            x = F.elu(x)
            x = self.cconv(x, *self.enc[f"dn{si}"], stride=stride)
        x = F.elu(x)
        x = self.cconv(x, *self.enc["l11"])
        x = self.transformer(x.permute(0, 2, 1), "mimi.encoder_transformer.transformer").permute(0, 2, 1)
        return self.cconv_rep(x, self.down, self.rs).permute(0, 2, 1)


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


# ---------------------------------------------------------------------------
# Full-production-shape gate (kyutai/pocket-tts mimi dims, cited from the
# reference converter's verified layout notes — scripts/converters/
# pocket_tts.py:27-44,116-130: outer/seanet 512, latent 32, decoder stages
# convtr 512->256 k12s6 / 256->128 k10s5 / 128->64 k8s4, depthwise upsample
# k32 s16, 2-layer transformer heads 8 x hd 64 ffn 2048, hop 1920).
# Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_LAT, F_OUTER, F_RS = 32, 512, 16
F_RATIOS = (6, 5, 4)
F_DEC_CHS = [(512, 256), (256, 128), (128, 64)]
F_HOP = F_RS * 6 * 5 * 4  # 1920


@pytest.fixture(scope="module")
def full_pocket(tmp_path_factory):
    ref = TorchPocket(lat=F_LAT, outer=F_OUTER, tfl=2, heads=8, hd=64,
                      ratios=F_RATIOS, rs=F_RS, dec_chs=F_DEC_CHS,
                      ffn=2048, fan_scale=True)
    from codec_tpu.convert import get_converter

    c = get_converter("pocket_tts")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in ref.sd.items()}, {
        "sample_rate": 24000, "hop_size": F_HOP, "ldim": F_LAT,
        "decoder_ratios": list(F_RATIOS), "encoder_ratios": list(F_RATIOS[::-1]),
        "outer_dim": F_OUTER, "tf_layers": 2, "tf_heads": 8,
        "tf_head_dim": 64, "tf_context": 250, "tf_max_period": 10000.0,
    })
    path = tmp_path_factory.mktemp("pm_full") / "full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_latent_corr(full_pocket):
    ref, ours = full_pocket
    assert ours.hop_size == F_HOP and ours.latent_dim == F_LAT
    assert ours.cfg.resample_stride == F_RS
    rng = np.random.default_rng(7)
    t = 5
    z = (rng.standard_normal((1, t, F_LAT)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).numpy()[0]
    got = ours.decode_latent(z[0])
    assert got.shape == want.shape == (t * F_HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("tail", [0, 733])
def test_fullsize_encode_latent_parity(full_pocket, tail):
    """tail=733: the production hop (1920) exercises per-layer ceil padding
    through three strides the tiny dims never hit (4/5/6 + resample 16)."""
    ref, ours = full_pocket
    rng = np.random.default_rng(8)
    n = F_HOP * 2 + tail
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = ours.encode_latent(pcm)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 1e-3, f"full-size encode err={err}"

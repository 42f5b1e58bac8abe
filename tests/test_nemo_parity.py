"""NeMo Nano Codec parity vs a torch mirror (FSQ + HiFi-GAN half-snake)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

C0 = 4
D0 = 64
RATES = (2, 3, 6, 7, 7)
LEVELS = (5, 4)
N_Q = 2
D = len(LEVELS)
HOP = 2 * 3 * 6 * 7 * 7   # 1764
KERNELS = (3, 7, 11)
DILS = (1, 3, 5)


class TorchNemo:
    def __init__(self, c0=C0, d0=D0, n_q=N_Q, levels=LEVELS):
        g = torch.Generator().manual_seed(0)
        self.sd = {}
        self.c0, self.d0, self.n_q, self.levels = c0, d0, n_q, levels
        self.d = len(levels)

        def wn(prefix, out_c, in_c, k, groups=1):
            v = torch.randn(out_c, in_c // groups if groups == 1 else 1, k, generator=g) * 0.2
            if groups > 1:
                v = torch.randn(out_c, 1, k, generator=g) * 0.2
            gg = torch.rand(out_c, 1, 1, generator=g) + 0.5
            self.sd[prefix + ".weight_v"] = v
            self.sd[prefix + ".weight_g"] = gg
            norm = v.flatten(1).norm(dim=1).clamp(min=1e-12).view(-1, 1, 1)
            return v * (gg / norm)

        def bias(prefix, c):
            b = torch.randn(c, generator=g) * 0.1
            self.sd[prefix + ".bias"] = b
            return b

        def alpha(prefix, c):
            a = torch.rand(c, generator=g) + 0.3
            self.sd[prefix + ".alpha"] = a
            return a

        e = "audio_encoder"
        self.enc_pre = (wn(f"{e}.pre_conv.conv", c0, 1, 7), bias(f"{e}.pre_conv.conv", c0))
        ch = c0
        self.enc_layers = []
        for li, s in enumerate(RATES):
            blocks = []
            for bi, k in enumerate(KERNELS):
                units = []
                for ri, d in enumerate(DILS):
                    pre = f"{e}.res_layers.{li}.res_blocks.{bi}.res_units.{ri}"
                    units.append({
                        "in": (wn(f"{pre}.input_conv.conv", ch, ch, k),
                               bias(f"{pre}.input_conv.conv", ch)),
                        "sk": (wn(f"{pre}.skip_conv.conv", ch, ch, k),
                               bias(f"{pre}.skip_conv.conv", ch)),
                        "k": k, "d": d,
                    })
                blocks.append(units)
            down = (wn(f"{e}.down_sample_conv_layers.{li}.conv", ch * 2, ch, 2 * s),
                    bias(f"{e}.down_sample_conv_layers.{li}.conv", ch * 2))
            self.enc_layers.append({"blocks": blocks, "down": down, "s": s, "ch": ch})
            ch *= 2
        self.enc_post = (wn(f"{e}.post_conv.conv", n_q * self.d, ch, 7),
                         bias(f"{e}.post_conv.conv", n_q * self.d))

        dd = "audio_decoder"
        self.dec_pre = (wn(f"{dd}.pre_conv.conv", d0, n_q * self.d, 7),
                        bias(f"{dd}.pre_conv.conv", d0))
        dch = d0
        self.dec_layers = []
        for li, s in enumerate(RATES[::-1]):
            a = alpha(f"{dd}.activations.{li}.activation.snake_act", dch // 2)
            # grouped ConvTranspose1d(in=dch, out=dch//2, groups=dch//2): v (dch, 1, 2s)
            up_w = wn(f"{dd}.up_sample_conv_layers.{li}.conv", dch, 1, 2 * s, groups=dch // 2)
            up_b = bias(f"{dd}.up_sample_conv_layers.{li}.conv", dch // 2)
            out_c = dch // 2
            blocks = []
            for bi, k in enumerate(KERNELS):
                units = []
                for ri, d in enumerate(DILS):
                    pre = f"{dd}.res_layers.{li}.res_blocks.{bi}.res_units.{ri}"
                    units.append({
                        "in": (wn(f"{pre}.input_conv.conv", out_c, out_c, k),
                               bias(f"{pre}.input_conv.conv", out_c)),
                        "sk": (wn(f"{pre}.skip_conv.conv", out_c, out_c, k),
                               bias(f"{pre}.skip_conv.conv", out_c)),
                        "in_a": alpha(f"{pre}.input_activation.activation.snake_act", out_c // 2),
                        "sk_a": alpha(f"{pre}.skip_activation.activation.snake_act", out_c // 2),
                        "k": k, "d": d,
                    })
                blocks.append(units)
            self.dec_layers.append({"a": a, "up": (up_w, up_b), "blocks": blocks,
                                    "s": s, "in_ch": dch, "out_ch": out_c})
            dch = out_c
        self.dec_post_a = alpha(f"{dd}.post_activation.activation.snake_act", dch // 2)
        self.dec_post = (wn(f"{dd}.post_conv.conv", 1, dch, 7),
                         bias(f"{dd}.post_conv.conv", 1))

        levels = np.asarray(self.levels, np.float32)
        self.scale = torch.from_numpy((levels // 2).astype(np.float32))
        self.out_scale = torch.from_numpy(((levels - 1) / 2 * (1 - 1e-3)).astype(np.float32))
        self.out_offset = torch.from_numpy(
            np.where(levels.astype(int) % 2 == 0, 0.5, 0.0).astype(np.float32))
        self.in_shift = torch.tan(self.out_offset / self.out_scale)
        self.dim_base = torch.from_numpy(
            np.cumprod(np.concatenate([[1.0], levels[:-1]])).astype(np.float32))

    @staticmethod
    def rep_conv(x, w, b, stride=1, dilation=1, padding=0):
        if padding:
            x = F.pad(x, (padding, padding), mode="replicate")
        return F.conv1d(x, w, b, stride=stride, dilation=dilation)

    @staticmethod
    def causal_conv(x, w, b, dilation=1):
        k = w.shape[2]
        x = F.pad(x, ((k - 1) * dilation, 0))
        return F.conv1d(x, w, b, dilation=dilation)

    def half_snake(self, x, a):
        c = x.shape[1]
        left, right = x[:, :c // 2], x[:, c // 2:]
        aa = a.clamp(min=1e-9).view(1, -1, 1)
        left = left + torch.sin(aa * left) ** 2 / aa
        return torch.cat([left, F.leaky_relu(right, 0.01)], 1)

    def encode(self, pcm):
        x = self.rep_conv(pcm, *self.enc_pre, padding=3)
        for layer in self.enc_layers:
            acc = None
            for units in layer["blocks"]:
                xb = x
                for u in units:
                    k, d = u["k"], u["d"]
                    h = F.leaky_relu(xb, 0.01)
                    h = self.rep_conv(h, *u["in"], dilation=d, padding=(k * d - d) // 2)
                    h = F.leaky_relu(h, 0.01)
                    h = self.rep_conv(h, *u["sk"], padding=k // 2)
                    xb = xb + h
                acc = xb if acc is None else acc + xb
            x = F.leaky_relu(acc / 3.0, 0.01)
            s = layer["s"]
            x = self.rep_conv(x, *layer["down"], stride=s, padding=(s + 1) // 2)
        x = F.leaky_relu(x, 0.01)
        x = self.rep_conv(x, *self.enc_post, padding=3)
        # FSQ
        b, c, t = x.shape
        xg = x.permute(0, 2, 1).reshape(b, t, self.n_q, self.d)
        x1 = torch.tanh(xg + self.in_shift) * self.out_scale - self.out_offset
        r = torch.round(x1)
        idx = ((r + self.scale) * self.dim_base).sum(-1)
        return idx.long()                                   # [B, T, N_Q]

    def decode(self, codes):
        levels = torch.tensor(self.levels, dtype=torch.long)
        bases = self.dim_base.long()
        digits = torch.stack([(codes // bases[i]) % levels[i] for i in range(self.d)], -1)
        vals = (digits.float() - self.scale) / self.scale   # [B,T,N_Q,D]
        x = vals.reshape(codes.shape[0], codes.shape[1], self.n_q * self.d).permute(0, 2, 1)
        x = self.causal_conv(x, *self.dec_pre)
        for layer in self.dec_layers:
            x = self.half_snake(x, layer["a"])
            s = layer["s"]
            w, b = layer["up"]
            # grouped convtr, groups = out_ch
            x = F.conv_transpose1d(x, w, b, stride=s, groups=layer["out_ch"])
            crop = 2 * s - s
            x = x[:, :, :-crop]
            acc = None
            for units in layer["blocks"]:
                xb = x
                for u in units:
                    h = self.half_snake(xb, u["in_a"])
                    h = self.causal_conv(h, *u["in"], dilation=u["d"])
                    h = self.half_snake(h, u["sk_a"])
                    h = self.causal_conv(h, *u["sk"])
                    xb = xb + h
                acc = xb if acc is None else acc + xb
            x = acc / 3.0
        x = self.half_snake(x, self.dec_post_a)
        x = self.causal_conv(x, *self.dec_post)
        return torch.clamp(x, -1, 1)


@pytest.fixture(scope="module")
def tiny_nemo(tmp_path_factory):
    ref = TorchNemo()
    from codec_tpu.convert import get_converter

    c = get_converter("nemo_nano_codec")(quantization="F32")
    c.load_from_state_dict(ref.sd, {
        "sample_rate": 22050, "samples_per_frame": HOP,
        "num_groups": N_Q, "num_levels": list(LEVELS),
    })
    path = tmp_path_factory.mktemp("nemo") / "tiny.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_nemo):
    _, ours = tiny_nemo
    assert ours.arch == "nemo_nano_codec"
    assert ours.hop_size == HOP
    assert ours.n_q == N_Q
    assert ours.codebook_size == 20


def test_decode_parity(tiny_nemo):
    ref, ours = tiny_nemo
    rng = np.random.default_rng(0)
    t = 3
    codes = rng.integers(0, 20, (1, t, N_Q))
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes)).numpy()[0, 0]
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


def test_encode_parity(tiny_nemo):
    ref, ours = tiny_nemo
    rng = np.random.default_rng(1)
    n = HOP * 2
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = ours.encode(pcm)
    assert got.shape == want.shape
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} FSQ codes differ"


# ---------------------------------------------------------------------------
# Full-production-shape gate (nvidia/nemo-nano-codec-22khz-0.6kbps-12.5fps):
# FSQ 4 groups x levels [9,8,8,7] (codebook 4032, dim 4, latent 16 — the
# reference converter defaults, scripts/converters/nemo_nano_codec.py:257-258
# and this repo's NemoConfig), HiFi-GAN encoder base 32 doubling over rates
# (2,3,6,7,7) to 1024, decoder base 1024 halving to 32, hop 1764 (= 12.5 fps
# at 22.05 kHz). Weight-norm rows are unit-norm so the mirror needs no
# fan-scaling at production width. Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_C0, F_D0, F_N_Q, F_LEVELS = 32, 1024, 4, (9, 8, 8, 7)
F_V = 9 * 8 * 8 * 7  # 4032


@pytest.fixture(scope="module")
def full_nemo(tmp_path_factory):
    ref = TorchNemo(c0=F_C0, d0=F_D0, n_q=F_N_Q, levels=F_LEVELS)
    from codec_tpu.convert import get_converter

    c = get_converter("nemo_nano_codec")(quantization="F32")
    c.load_from_state_dict(ref.sd, {
        "sample_rate": 22050, "samples_per_frame": HOP,
        "num_groups": F_N_Q, "num_levels": list(F_LEVELS),
    })
    path = tmp_path_factory.mktemp("nemo_full") / "full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_config(full_nemo):
    _, ours = full_nemo
    assert ours.hop_size == HOP and ours.n_q == F_N_Q
    assert ours.codebook_size == F_V


@pytest.mark.slow
def test_fullsize_encode_codes_exact(full_nemo):
    """FSQ rounds a tanh-bounded value to integer grid points — unlike RVQ
    argmin there are no near-ties to relax for, so production-dim codes
    must match bit-exactly (round-boundary hits have measure zero on
    random input).

    The raw non-aligned pcm goes to BOTH sides un-padded: the reference
    builds its encode graph on raw n_in (nemo_nano_codec.cpp:388,117 — no
    upfront pad to a frame multiple) and the strided replicate convs have
    floor semantics, so 3*HOP+311 samples yield 3 frames, not 4."""
    ref, ours = full_nemo
    rng = np.random.default_rng(5)
    n = HOP * 3 + 311  # non-frame-aligned tail
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(pcm)[None, None]).numpy()[0]
    got = np.asarray(ours.encode(pcm))
    assert got.shape == want.shape
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} FSQ codes differ at full size"


@pytest.mark.slow
def test_fullsize_decode_corr(full_nemo):
    ref, ours = full_nemo
    rng = np.random.default_rng(6)
    t = 4
    codes = rng.integers(0, F_V, (1, t, F_N_Q))
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes)).numpy()[0, 0]
    got = np.asarray(ours.decode(codes[0].astype(np.int32)))
    assert got.shape == want.shape == (t * HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 5e-3

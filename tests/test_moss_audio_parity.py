"""MOSS-Audio parity vs a torch mirror (patched transformer codec with
sliding-window attention, RoPE-NORMAL, LayerScale, tanh-GELU, cosine LFQ)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

SR = 24000
D = 16
HEADS = 2
RVQ_D, CB_D, V, N_Q = 16, 8, 32, 2
LAT = 16
HOP = 4                    # patch 2 × patch 2
ENC_MODS = [  # (kind, patch, in, out, d_model, heads, layers, dur, period)
    (0, 2, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 2, 16, D, HEADS, 1, 8 * 2 / SR, 10000.0),
    (0, 2, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 32, LAT, D, HEADS, 1, 6 * 4 / SR, 10000.0),
]
DEC_MODS = [
    (1, 1, LAT, 32, D, HEADS, 1, 6 * 4 / SR, 10000.0),
    (0, 2, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 16, 2, D, HEADS, 1, 8 * 2 / SR, 10000.0),
    (0, 2, 0, 0, 0, 0, 0, 0.0, 0.0),
]


class TorchMoss:
    def __init__(self, enc_mods=None, dec_mods=None, sr=SR, n_q=N_Q, v=V,
                 cb_d=CB_D, rvq_d=RVQ_D, lat=LAT, nch=1, fan_scale=False):
        g = torch.Generator().manual_seed(0)
        self.t = {}
        self.enc_mods = enc_mods = enc_mods or ENC_MODS
        self.dec_mods = dec_mods = dec_mods or DEC_MODS
        self.sr, self.n_q, self.v, self.cb_d = sr, n_q, v, cb_d
        self.rvq_d, self.lat, self.nch = rvq_d, lat, nch

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps 768-d production stacks O(1)
            # (see the round-5 fullsize gates for the rationale)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            vv = torch.randn(*shape, generator=g) * s + off
            self.t[name] = vv
            return vv

        def block(base, mods, mi):
            _, _, ind, outd, dm, nh, nl, _, _ = mods[mi]
            if ind != dm:
                P(base + ".input_proj.w", dm, ind)
            if outd != dm:
                P(base + ".output_proj.w", outd, dm)
            for li in range(nl):
                lp = f"{base}.l{li}"
                P(lp + ".norm1.w", dm, s=0.2, off=1.0)
                P(lp + ".norm1.b", dm)
                P(lp + ".norm2.w", dm, s=0.2, off=1.0)
                P(lp + ".norm2.b", dm)
                P(lp + ".attn.qkv.w", 3 * dm, dm)
                P(lp + ".attn.out.w", dm, dm)
                P(lp + ".ffn.fc1.w", 2 * dm, dm)
                P(lp + ".ffn.fc2.w", dm, 2 * dm)
                P(lp + ".ls1", dm, s=0.1)
                P(lp + ".ls2", dm, s=0.1)

        for mi, m in enumerate(enc_mods):
            if m[0] == 1:
                block(f"moss.enc.b{mi}", enc_mods, mi)
        for mi, m in enumerate(dec_mods):
            if m[0] == 1:
                block(f"moss.dec.b{mi}", dec_mods, mi)

        P("moss.q.input_proj.w", rvq_d, lat, 1)
        P("moss.q.input_proj.b", rvq_d)
        P("moss.q.output_proj.w", lat, rvq_d, 1)
        P("moss.q.output_proj.b", lat)
        for qi in range(n_q):
            base = f"moss.q.{qi}"
            P(base + ".in_proj.w", cb_d, rvq_d, 1)
            P(base + ".in_proj.b", cb_d)
            P(base + ".out_proj.w", rvq_d, cb_d, 1)
            P(base + ".out_proj.b", rvq_d)
            cb = P(base + ".codebook", v, cb_d, s=1.0)
            self.t[base + ".codebook_norm"] = cb / cb.norm(dim=1, keepdim=True).clamp(min=1e-12)

    def layer(self, x, lp, dm, nh, window, n_valid):
        t = self.t
        d = dm // nh
        h = F.layer_norm(x, (dm,), t[lp + ".norm1.w"], t[lp + ".norm1.b"], eps=1e-5)
        qkv = h @ t[lp + ".attn.qkv.w"].T
        q, k, v = qkv.chunk(3, -1)
        b, T, _ = x.shape
        q = q.view(b, T, nh, d).transpose(1, 2)
        k = k.view(b, T, nh, d).transpose(1, 2)
        v = v.view(b, T, nh, d).transpose(1, 2)
        inv = 1.0 / 10000.0 ** (torch.arange(0, d, 2) / d)
        ang = torch.arange(T)[:, None] * inv[None]
        cos, sin = ang.cos(), ang.sin()

        def rot(z):
            ze, zo = z[..., 0::2], z[..., 1::2]
            return torch.stack([ze * cos - zo * sin, ze * sin + zo * cos], -1).reshape(z.shape)
        q, k = rot(q), rot(k)
        logits = q @ k.transpose(-1, -2) / (d ** 0.5)
        qi = torch.arange(T)[:, None]
        kj = torch.arange(T)[None, :]
        ok = kj <= qi
        if window and window > 0:
            ok &= kj > qi - window
        mask = torch.where(ok, 0.0, float("-inf"))
        if n_valid is not None:
            mask = mask + torch.where(kj < n_valid, 0.0, float("-inf"))
        a = torch.softmax(logits + mask, -1) @ v
        a = a.transpose(1, 2).reshape(b, T, dm)
        x = x + (a @ t[lp + ".attn.out.w"].T) * t[lp + ".ls1"]
        h = F.layer_norm(x, (dm,), t[lp + ".norm2.w"], t[lp + ".norm2.b"], eps=1e-5)
        h = F.gelu(h @ t[lp + ".ffn.fc1.w"].T, approximate="tanh") @ t[lp + ".ffn.fc2.w"].T
        return x + h * t[lp + ".ls2"]

    def projected(self, x, base, mod, window, n_valid):
        t = self.t
        _, _, ind, outd, dm, nh, nl, _, _ = mod
        if base + ".input_proj.w" in t:
            x = x @ t[base + ".input_proj.w"].T
        for li in range(nl):
            x = self.layer(x, f"{base}.l{li}", dm, nh, window, n_valid)
        if base + ".output_proj.w" in t:
            x = x @ t[base + ".output_proj.w"].T
        return x

    @staticmethod
    def patch_enc(x, p):
        b, T, c = x.shape
        return x.reshape(b, T // p, p, c).permute(0, 1, 3, 2).reshape(b, T // p, c * p)

    @staticmethod
    def patch_dec(x, p):
        b, T, c = x.shape
        return x.reshape(b, T, c // p, p).permute(0, 1, 3, 2).reshape(b, T * p, c // p)

    def encode(self, pcm, n_valid_pcm):
        x = pcm[..., None]
        cum = 1
        fr = self.sr * self.nch        # mono-eq rate under channel interleave
        for mi, m in enumerate(self.enc_mods):
            if m[0] == 0:
                x = self.patch_enc(x, m[1])
                cum *= m[1]
            else:
                window = round(m[7] * fr / cum)
                x = self.projected(x, f"moss.enc.b{mi}", m, window, n_valid_pcm // cum)
        t = self.t
        x = x @ t["moss.q.input_proj.w"][:, :, 0].T + t["moss.q.input_proj.b"]
        residual = x
        codes = []
        for qi in range(self.n_q):
            base = f"moss.q.{qi}"
            z = residual @ t[base + ".in_proj.w"][:, :, 0].T + t[base + ".in_proj.b"]
            zn = F.normalize(z, dim=-1, eps=1e-12)
            sims = zn @ t[base + ".codebook_norm"].T
            idx = sims.argmax(-1)
            codes.append(idx)
            zq = t[base + ".codebook"][idx] @ t[base + ".out_proj.w"][:, :, 0].T + \
                t[base + ".out_proj.b"]
            residual = residual - zq
        return torch.stack(codes, -1)

    def decode(self, codes):
        t = self.t
        acc = None
        for qi in range(self.n_q):
            base = f"moss.q.{qi}"
            zq = t[base + ".codebook"][codes[..., qi]] @ t[base + ".out_proj.w"][:, :, 0].T \
                + t[base + ".out_proj.b"]
            acc = zq if acc is None else acc + zq
        x = acc @ t["moss.q.output_proj.w"][:, :, 0].T + t["moss.q.output_proj.b"]
        n = len(self.dec_mods)
        fr = self.sr * self.nch
        for mi, m in enumerate(self.dec_mods):
            if m[0] == 0:
                x = self.patch_dec(x, m[1])
            else:
                cum_rem = 1
                for j in range(mi + 1, n):
                    if self.dec_mods[j][0] == 0:
                        cum_rem *= self.dec_mods[j][1]
                window = round(m[7] * fr / cum_rem)
                x = self.projected(x, f"moss.dec.b{mi}", m, window, None)
        return x[..., 0]


@pytest.fixture(scope="module")
def tiny_moss(tmp_path_factory):
    ref = TorchMoss()
    path = tmp_path_factory.mktemp("moss") / "moss.gguf"
    w = GGUFWriter(path, "moss_audio_tokenizer")
    w.add_uint32("codec.sample_rate", SR)
    w.add_uint32("codec.hop_size", HOP)
    w.add_uint32("codec.n_q", N_Q)
    w.add_uint32("codec.codebook_size", V)
    w.add_uint32("codec.codebook_dim", CB_D)
    w.add_uint32("codec.latent_dim", LAT)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", True)
    w.add_uint32("moss.number_channels", 1)
    w.add_bool("moss.channel_interleave", True)
    w.add_uint32("moss.rvq_dim", RVQ_D)
    for side, mods in (("enc", ENC_MODS), ("dec", DEC_MODS)):
        w.add_uint32(f"moss.{side}.n_modules", len(mods))
        w.add_array(f"moss.{side}.module_types", [m[0] for m in mods])
        w.add_array(f"moss.{side}.patch_sizes", [m[1] for m in mods])
        w.add_array(f"moss.{side}.in_dims", [m[2] for m in mods])
        w.add_array(f"moss.{side}.out_dims", [m[3] for m in mods])
        w.add_array(f"moss.{side}.d_models", [m[4] for m in mods])
        w.add_array(f"moss.{side}.n_heads", [m[5] for m in mods])
        w.add_array(f"moss.{side}.n_layers", [m[6] for m in mods])
        w.add_array(f"moss.{side}.context_durations", [float(m[7]) for m in mods])
        w.add_array(f"moss.{side}.max_periods", [float(m[8]) for m in mods])
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_moss):
    _, ours = tiny_moss
    assert ours.arch == "moss_audio_tokenizer"
    assert ours.n_q == N_Q and ours.hop_size == HOP


def test_encode_parity(tiny_moss):
    ref, ours = tiny_moss
    rng = np.random.default_rng(0)
    n = HOP * 20 + 3                      # exercises hop padding + n_valid mask
    pcm = (rng.standard_normal(n) * 0.2).astype(np.float32)
    pad = (-n) % HOP
    with torch.no_grad():
        want = ref.encode(F.pad(torch.from_numpy(pcm), (0, pad))[None], n).numpy()[0]
    got = ours.encode(pcm)
    assert got.shape == want.shape
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} LFQ codes differ"


def test_decode_parity(tiny_moss):
    ref, ours = tiny_moss
    rng = np.random.default_rng(1)
    t = 16
    codes = rng.integers(0, V, (1, t, N_Q))
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes)).numpy()[0]
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


# ---------------------------------------------------------------------------
# Full-production-shape gate. Top-level dims cited from the reference header
# defaults (src/models/moss_audio.h:16-28): 48 kHz, hop 3840 (12.5 Hz), 16
# quantizers of 1024 x 8 cosine LFQ, latent 768, rvq_dim 512 — and STEREO
# with channel interleave (moss_audio.h number_channels /
# enable_channel_interleave; the converter's (B,2,T)->(B,1,2T) note), the
# one production path the tiny mono gate never exercises. Per-module patch
# splits/layer counts live only in checkpoint config.json (the reference
# converter reads them per-module, scripts/converters/moss_audio.py:200-239),
# so this gate uses a representative 4-stage hierarchy at production widths
# (192->384->768 d_model, heads of dim 64, patch product 7680 = 2x3840 for
# the stereo mono-eq stream) with context windows that BIND at test length.
# ---------------------------------------------------------------------------

F_SR, F_NCH, F_HOP = 48000, 2, 3840
F_N_Q, F_V, F_CB_D, F_RVQ_D, F_LAT = 16, 1024, 8, 512, 768
F_ENC_MODS = [
    (0, 16, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 16, 192, 192, 3, 3, 0.1, 10000.0),
    (0, 8, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 1536, 384, 384, 6, 6, 0.1, 10000.0),
    (0, 6, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 2304, 768, 768, 12, 4, 0.1, 10000.0),
    (0, 10, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 7680, 768, 768, 12, 2, 10.0, 10000.0),
]
F_DEC_MODS = [
    (1, 1, F_LAT, 7680, 768, 12, 2, 10.0, 10000.0),
    (0, 10, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 768, 2304, 768, 12, 4, 0.1, 10000.0),
    (0, 6, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 384, 1536, 384, 6, 6, 0.1, 10000.0),
    (0, 8, 0, 0, 0, 0, 0, 0.0, 0.0),
    (1, 1, 192, 16, 192, 3, 3, 0.1, 10000.0),
    (0, 16, 0, 0, 0, 0, 0, 0.0, 0.0),
]


def _write_moss_gguf(path, ref, sr, hop, n_q, v, cb_d, lat, rvq_d, nch):
    w = GGUFWriter(path, "moss_audio_tokenizer")
    w.add_uint32("codec.sample_rate", sr)
    w.add_uint32("codec.hop_size", hop)
    w.add_uint32("codec.n_q", n_q)
    w.add_uint32("codec.codebook_size", v)
    w.add_uint32("codec.codebook_dim", cb_d)
    w.add_uint32("codec.latent_dim", lat)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", True)
    w.add_uint32("moss.number_channels", nch)
    w.add_bool("moss.channel_interleave", True)
    w.add_uint32("moss.rvq_dim", rvq_d)
    for side, mods in (("enc", ref.enc_mods), ("dec", ref.dec_mods)):
        w.add_uint32(f"moss.{side}.n_modules", len(mods))
        w.add_array(f"moss.{side}.module_types", [m[0] for m in mods])
        w.add_array(f"moss.{side}.patch_sizes", [m[1] for m in mods])
        w.add_array(f"moss.{side}.in_dims", [m[2] for m in mods])
        w.add_array(f"moss.{side}.out_dims", [m[3] for m in mods])
        w.add_array(f"moss.{side}.d_models", [m[4] for m in mods])
        w.add_array(f"moss.{side}.n_heads", [m[5] for m in mods])
        w.add_array(f"moss.{side}.n_layers", [m[6] for m in mods])
        w.add_array(f"moss.{side}.context_durations", [float(m[7]) for m in mods])
        w.add_array(f"moss.{side}.max_periods", [float(m[8]) for m in mods])
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()


@pytest.fixture(scope="module")
def full_moss(tmp_path_factory):
    ref = TorchMoss(enc_mods=F_ENC_MODS, dec_mods=F_DEC_MODS, sr=F_SR,
                    n_q=F_N_Q, v=F_V, cb_d=F_CB_D, rvq_d=F_RVQ_D, lat=F_LAT,
                    nch=F_NCH, fan_scale=True)
    path = tmp_path_factory.mktemp("moss_full") / "full.gguf"
    _write_moss_gguf(path, ref, F_SR, F_HOP, F_N_Q, F_V, F_CB_D, F_LAT,
                     F_RVQ_D, F_NCH)
    import codec_tpu

    return ref, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_stereo_encode_codes_exact(full_moss):
    """Stereo pcm [T, 2] interleaves to one mono-eq stream; codes must
    match the mirror fed the same interleaved stream bit-for-bit (cosine
    LFQ argmax over 1024 entries; torch-vs-XLA near-ties would show as a
    handful of code flips and anything systematic fails the bound)."""
    ref, ours = full_moss
    assert ours.expected_channels == F_NCH and ours.hop_size == F_HOP
    rng = np.random.default_rng(11)
    per_ch = F_HOP * 2 + 517              # non-frame-aligned tail
    pcm = (rng.standard_normal((per_ch, F_NCH)) * 0.2).astype(np.float32)
    pad = (-per_ch) % F_HOP
    flat = np.pad(pcm, ((0, pad), (0, 0))).reshape(-1)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(flat)[None],
                          per_ch * F_NCH).numpy()[0]
    got = ours.encode(pcm)
    assert got.shape == want.shape
    mism = int((got != want).sum())
    assert mism <= max(2, got.size // 100), \
        f"{mism}/{got.size} LFQ codes differ at full size"


@pytest.mark.slow
def test_fullsize_stereo_decode_corr(full_moss):
    ref, ours = full_moss
    rng = np.random.default_rng(12)
    t = 3
    codes = rng.integers(0, F_V, (1, t, F_N_Q))
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(codes)).numpy()[0]
    got = ours.decode(codes[0].astype(np.int32))
    # stereo decode de-interleaves to [T_per_ch, 2]
    assert got.shape == (t * F_HOP, F_NCH)
    want2 = want.reshape(-1, F_NCH)
    corr = float(np.corrcoef(got.reshape(-1), want2.reshape(-1))[0, 1])
    assert corr > 0.9999, f"full-size stereo decode corr={corr}"
    assert np.abs(got - want2).max() < 2e-3

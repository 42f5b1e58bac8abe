"""SNAC parity vs a torch mirror of hubertsiuzdak/snac (not in transformers).

The mirror follows the upstream module layout (WNConv1d with torch
parametrizations naming, depthwise snake residual units, multi-scale VQ at
strides [4,2,1], noise blocks disabled for deterministic decode)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

ENC_DIM = 4          # latent = ENC_DIM * 16 = 64
DEC_DIM = 32
CB_DIM = 8
V = 64
RATES = (2, 4, 8, 8)
DEC_RATES = (8, 8, 4, 2)
VQ_STRIDES = (4, 2, 1)
HOP = 512
PAD_TO = 2048


class TorchSNAC(nn.Module):
    def __init__(self, enc_dim=ENC_DIM, dec_dim=DEC_DIM, cb_dim=CB_DIM, v=V):
        super().__init__()
        self.enc_dim, self.dec_dim, self.cb_dim, self.v = \
            enc_dim, dec_dim, cb_dim, v
        g = torch.Generator().manual_seed(0)
        self.sd = {}

        def wn(prefix, out_c, in_c, k, bias=True, bias_c=None):
            # conv weight layout (out, in, k); for ConvTranspose1d pass
            # out_c=in_channels, in_c=out_channels and bias_c=out_channels.
            v = torch.randn(out_c, in_c, k, generator=g) * 0.2
            gg = torch.rand(out_c, 1, 1, generator=g) + 0.5
            self.sd[prefix + ".parametrizations.weight.original1"] = v
            self.sd[prefix + ".parametrizations.weight.original0"] = gg
            if bias:
                self.sd[prefix + ".bias"] = torch.randn(bias_c or out_c, generator=g) * 0.1
            norm = v.flatten(1).norm(dim=1).clamp(min=1e-12).view(-1, 1, 1)
            w = v * (gg / norm)
            return w, self.sd.get(prefix + ".bias")

        def alpha(prefix, c):
            a = torch.randn(1, c, 1, generator=g) * 0.5 + 1.0
            self.sd[prefix + ".alpha"] = a
            return a

        self.enc0 = wn("encoder.block.0", enc_dim, 1, 7)
        self.enc_blocks = []
        ch = enc_dim
        for bi, s in enumerate(RATES, start=1):
            out_c = ch * 2
            base = f"encoder.block.{bi}.block"
            units = []
            for ri in range(3):
                u = {
                    "a1": alpha(f"{base}.{ri}.block.0", ch),
                    "c1": wn(f"{base}.{ri}.block.1", ch, 1, 7),   # depthwise
                    "a2": alpha(f"{base}.{ri}.block.2", ch),
                    "c2": wn(f"{base}.{ri}.block.3", ch, ch, 1),
                }
                units.append(u)
            blk = {
                "units": units, "ch": ch,
                "act": alpha(f"{base}.3", ch),
                "down": wn(f"{base}.4", out_c, ch, 2 * s),
                "stride": s,
            }
            self.enc_blocks.append(blk)
            ch = out_c
        self.latent = ch
        self.enc_final = wn("encoder.block.5", ch, 1, 7)          # depthwise

        self.q = []
        for qi in range(3):
            base = f"quantizer.quantizers.{qi}"
            cb = torch.randn(v, cb_dim, generator=g)
            self.sd[base + ".codebook.weight"] = cb
            self.q.append({
                "in": wn(base + ".in_proj", cb_dim, ch, 1),
                "out": wn(base + ".out_proj", ch, cb_dim, 1),
                "cb": cb,
            })

        self.dec_in_dw = wn("decoder.model.0", ch, 1, 7)          # depthwise
        self.dec_in_pw = wn("decoder.model.1", dec_dim, ch, 1)
        self.dec_blocks = []
        dch = dec_dim
        for bi, s in enumerate(DEC_RATES, start=2):
            out_c = dch // 2
            base = f"decoder.model.{bi}.block"
            blk = {
                "act": alpha(f"{base}.0", dch),
                "tr": wn(f"{base}.1", dch, out_c, 2 * s, bias_c=out_c),  # convtr (in, out, k)
                "noise": wn(f"{base}.2.linear", out_c, out_c, 1, bias=False),
                "stride": s, "ch": out_c,
            }
            units = []
            for ri in range(3):
                u = {
                    "a1": alpha(f"{base}.{3 + ri}.block.0", out_c),
                    "c1": wn(f"{base}.{3 + ri}.block.1", out_c, 1, 7),
                    "a2": alpha(f"{base}.{3 + ri}.block.2", out_c),
                    "c2": wn(f"{base}.{3 + ri}.block.3", out_c, out_c, 1),
                }
                units.append(u)
            blk["units"] = units
            self.dec_blocks.append(blk)
            dch = out_c
        self.dec_act_final = alpha("decoder.model.6", dch)
        self.dec_final = wn("decoder.model.7", 1, dch, 7)

    @staticmethod
    def snake(x, a):
        return x + (1.0 / (a + 1e-9)) * torch.sin(a * x) ** 2

    def res_unit(self, x, u, dil):
        c = x.shape[1]
        h = self.snake(x, u["a1"])
        h = F.conv1d(h, u["c1"][0], u["c1"][1], dilation=dil,
                     padding=3 * dil, groups=c)
        h = self.snake(h, u["a2"])
        h = F.conv1d(h, u["c2"][0], u["c2"][1])
        return x + h

    def encode_latent(self, pcm):
        x = F.conv1d(pcm, self.enc0[0], self.enc0[1], padding=3)
        for blk in self.enc_blocks:
            for ri, d in enumerate((1, 3, 9)):
                x = self.res_unit(x, blk["units"][ri], d)
            x = self.snake(x, blk["act"])
            s = blk["stride"]
            x = F.conv1d(x, blk["down"][0], blk["down"][1], stride=s,
                         padding=(s + 1) // 2)
        x = F.conv1d(x, self.enc_final[0], self.enc_final[1], padding=3,
                     groups=self.latent)
        return x

    def encode(self, pcm):
        residual = self.encode_latent(pcm)
        rows = []
        t_lat = residual.shape[-1]
        for q, stride in zip(self.q, VQ_STRIDES):
            pooled = F.avg_pool1d(residual, stride, stride) if stride > 1 else residual
            z = F.conv1d(pooled, q["in"][0], q["in"][1])
            zn = F.normalize(z, dim=1)
            cbn = F.normalize(q["cb"], dim=1)
            sims = torch.einsum("bct,vc->bvt", zn, cbn)
            idx = sims.argmax(1)                               # [B, t_q]
            emb = q["cb"][idx].permute(0, 2, 1)
            zq = F.conv1d(emb, q["out"][0], q["out"][1])
            if stride > 1:
                zq = zq.repeat_interleave(stride, dim=-1)
                rows.append(idx.repeat_interleave(stride, dim=-1))
            else:
                rows.append(idx)
            residual = residual - zq
        return torch.stack(rows, -1)                           # [B, t_lat, 3]

    def decode(self, packed):
        z = None
        for qi, (q, stride) in enumerate(zip(self.q, VQ_STRIDES)):
            idx = packed[:, ::stride, qi]
            emb = q["cb"][idx].permute(0, 2, 1)
            zq = F.conv1d(emb, q["out"][0], q["out"][1])
            if stride > 1:
                zq = zq.repeat_interleave(stride, dim=-1)
            z = zq if z is None else z + zq
        x = F.conv1d(z, self.dec_in_dw[0], self.dec_in_dw[1], padding=3,
                     groups=self.latent)
        x = F.conv1d(x, self.dec_in_pw[0], self.dec_in_pw[1])
        for blk in self.dec_blocks:
            x = self.snake(x, blk["act"])
            s = blk["stride"]
            x = F.conv_transpose1d(x, blk["tr"][0], blk["tr"][1], stride=s,
                                   padding=(s + 1) // 2, output_padding=s % 2)
            for ri, d in enumerate((1, 3, 9)):
                x = self.res_unit(x, blk["units"][ri], d)
        x = self.snake(x, self.dec_act_final)
        x = F.conv1d(x, self.dec_final[0], self.dec_final[1], padding=3)
        return torch.tanh(x)


@pytest.fixture(scope="module")
def tiny_snac(tmp_path_factory):
    ref = TorchSNAC()
    from codec_tpu.convert import get_converter

    c = get_converter("snac")(quantization="F32")
    c.load_from_state_dict(ref.sd, {
        "sample_rate": 24000, "encoder_rates": list(RATES),
        "decoder_rates": list(DEC_RATES), "vq_strides": list(VQ_STRIDES),
        "codebook_size": V, "codebook_dim": CB_DIM, "latent_dim": ref.latent,
        "encoder_dim": ENC_DIM, "decoder_dim": DEC_DIM,
        "depthwise": True, "noise": True,
    })
    path = tmp_path_factory.mktemp("snac") / "tiny.gguf"
    c.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return ref, ours


def test_config(tiny_snac):
    ref, ours = tiny_snac
    assert ours.arch == "snac"
    assert ours.hop_size == HOP
    assert ours.n_q == 3
    assert ours.cfg.pad_to == PAD_TO


def test_decode_parity(tiny_snac):
    ref, ours = tiny_snac
    rng = np.random.default_rng(0)
    t_fine = 8
    packed = rng.integers(0, V, (1, t_fine, 3)).astype(np.int64)
    packed[:, :, 0] = np.repeat(packed[:, ::4, 0], 4, axis=1)  # valid Orpheus packing
    packed[:, :, 1] = np.repeat(packed[:, ::2, 1], 2, axis=1)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(packed)).numpy()[0, 0]
    got = ours.decode(packed[0].astype(np.int32))
    assert got.shape == want.shape == (t_fine * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 1e-3


def test_encode_parity(tiny_snac):
    ref, ours = tiny_snac
    rng = np.random.default_rng(1)
    n = PAD_TO * 2 + 700                                     # exercises pad_to
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    pad = -(-n // PAD_TO) * PAD_TO - n
    with torch.no_grad():
        want = ref.encode(F.pad(torch.from_numpy(pcm)[None, None], (0, pad))).numpy()[0]
    got = ours.encode(pcm)
    assert got.shape == want.shape
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} codes differ"

    # int16 PCM input (the CLI's PCM16 WAV path) must scale by 1/32768 —
    # regression: encode overrides consuming raw np.float32 casts saw
    # ±32767-valued "floats" and emitted 100%-flipped codes
    pcm16 = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype(np.int16)
    got16 = ours.encode(pcm16)
    ref16 = ours.encode(pcm16.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(got16, ref16)


def test_roundtrip(tiny_snac):
    ref, ours = tiny_snac
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(PAD_TO * 2) * 0.1).astype(np.float32)
    codes = ours.encode(pcm)
    out = ours.decode(codes)
    assert out.shape == (PAD_TO * 2,)


# ---------------------------------------------------------------------------
# Full-production-shape gate (hubertsiuzdak/snac_24khz dims), companion to
# tests/test_{mimi,dac}_fullsize.py: enc 48, dec 1024, 3x4096 codebooks of
# dim 8, hop 512. Slow-marked; near-ties in the 8-d cosine search are
# margin-verified like the DAC gate.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def full_snac(tmp_path_factory):
    ref = TorchSNAC(enc_dim=48, dec_dim=1024, cb_dim=8, v=4096)
    from codec_tpu.convert import get_converter

    c = get_converter("snac")(quantization="F32")
    c.load_from_state_dict(ref.sd, {
        "sample_rate": 24000, "encoder_rates": list(RATES),
        "decoder_rates": list(DEC_RATES), "vq_strides": list(VQ_STRIDES),
        "codebook_size": ref.v, "codebook_dim": ref.cb_dim,
        "latent_dim": ref.latent, "encoder_dim": ref.enc_dim,
        "decoder_dim": ref.dec_dim, "depthwise": True, "noise": True,
    })
    path = tmp_path_factory.mktemp("snac_full") / "full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return ref, ours


def _snac_first_divergence_margin(ref, pcm, want, got, fine_pos, qi):
    """Relative cosine-distance margin at the first divergent VQ stage,
    rebuilt in f64 through the want-code prefix (multi-scale residual
    semantics: avg-pool at the stage stride, raw-codebook out_proj
    residual updates). Ties show ~1e-6; real full-dim bugs don't."""
    with torch.no_grad():
        residual = ref.encode_latent(pcm)
        for pq in range(qi):
            q, stride = ref.q[pq], VQ_STRIDES[pq]
            idx = torch.from_numpy(want[None, ::stride, pq].astype(np.int64))
            emb = q["cb"][idx].permute(0, 2, 1)
            zq = F.conv1d(emb, q["out"][0], q["out"][1])
            if stride > 1:
                zq = zq.repeat_interleave(stride, dim=-1)
            residual = residual - zq
        q, stride = ref.q[qi], VQ_STRIDES[qi]
        pooled = (F.avg_pool1d(residual, stride, stride)
                  if stride > 1 else residual)
        z = F.conv1d(pooled, q["in"][0], q["in"][1]
                     ).double()[0, :, fine_pos // stride]
        zn = z / z.norm().clamp(min=1e-12)
        cb = q["cb"].double()
        cbn = cb / cb.norm(dim=1, keepdim=True).clamp(min=1e-12)
        d = ((zn[None] - cbn) ** 2).sum(-1)
        c_ref, c_ours = int(want[fine_pos, qi]), int(got[fine_pos, qi])
        return float((d[c_ours] - d[c_ref]) / d[c_ref].clamp(min=1e-12))


@pytest.mark.slow
def test_fullsize_encode_codes_exact_or_near_tie(full_snac):
    ref, ours = full_snac
    rng = np.random.default_rng(1)
    n = PAD_TO * 4 + 700
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    pad = -(-n // PAD_TO) * PAD_TO - n
    with torch.no_grad():
        want = ref.encode(
            F.pad(torch.from_numpy(pcm)[None, None], (0, pad))).numpy()[0]
    got = np.asarray(ours.encode(pcm))
    assert got.shape == want.shape
    mism = got != want
    pos = np.argwhere(mism)
    # fine frames touched; 8-d cosine over 4096 entries near-ties a few
    assert len(pos) <= max(8, want.size // 20), \
        f"{len(pos)}/{want.size} codes differ — not tie noise"
    padded = F.pad(torch.from_numpy(pcm)[None, None], (0, pad))
    seen = set()
    for fine_pos, qcol in pos:
        first_q = int(mism[fine_pos].argmax())
        key = (int(fine_pos) // VQ_STRIDES[first_q] * VQ_STRIDES[first_q],
               first_q)
        if key in seen:
            continue
        seen.add(key)
        margin = _snac_first_divergence_margin(
            ref, padded, want, got, int(fine_pos), first_q)
        assert abs(margin) < 1e-4, \
            f"pos {fine_pos} q{first_q}: rel margin {margin:.2e} — real"


@pytest.mark.slow
def test_fullsize_decode_corr(full_snac):
    ref, ours = full_snac
    rng = np.random.default_rng(2)
    t_fine = 64
    packed = rng.integers(0, ref.v, (1, t_fine, 3)).astype(np.int64)
    packed[:, :, 0] = np.repeat(packed[:, ::4, 0], 4, axis=1)
    packed[:, :, 1] = np.repeat(packed[:, ::2, 1], 2, axis=1)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(packed)).numpy()[0, 0]
    got = np.asarray(ours.decode(packed[0].astype(np.int32)))
    assert got.shape == want.shape == (t_fine * HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 5e-3


def test_production_dim_fixture_runs():
    """random_snac_params (bench lineup fixture) builds the production
    snac_24khz tree that snac_decode_fn/snac_encode_fn accept: decode
    shape is t*hop, encode shape is n/hop x 3 (Orpheus packing)."""
    import jax.numpy as jnp

    from codec_tpu.models.bench_init import random_snac_params
    from codec_tpu.models.snac import snac_decode_fn, snac_encode_fn

    cfg, p = random_snac_params()
    assert cfg.latent_dim == 768 and cfg.hop_size == 512  # snac_24khz dims
    rng = np.random.default_rng(0)
    t = 8                                     # multiple of vq_strides lcm
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, t, 3)),
                        jnp.int32)
    pcm = snac_decode_fn(p, codes, cfg)
    assert pcm.shape == (1, t * cfg.hop_size)
    assert np.isfinite(np.asarray(pcm)).all()

    n = cfg.pad_to
    x = jnp.asarray(rng.standard_normal((1, n)) * 0.1, jnp.float32)
    c2 = snac_encode_fn(p, x, cfg)
    assert c2.shape == (1, n // cfg.hop_size, 3)


def test_tpu_formulation_matches_plain_path(monkeypatch):
    """The TPU decode formulation (depthwise-shifts + conv1d_matmul +
    sub-pixel convtr + 128-lane weight padding; round-5 SNAC perf fix,
    VERDICT r4 #3) is numerically the plain lax path's output. Forced on
    CPU by patching the dispatch gates."""
    import jax.numpy as jnp

    from codec_tpu.models.bench_init import random_snac_params
    from codec_tpu.models.snac import snac_decode_fn, snac_encode_fn
    from codec_tpu.ops import conv

    cfg, p = random_snac_params()
    rng = np.random.default_rng(3)
    t = 8
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, t, 3)),
                        jnp.int32)
    pcm_plain = np.asarray(snac_decode_fn(p, codes, cfg))

    monkeypatch.setattr(conv, "use_conv_matmul", lambda: True)
    monkeypatch.setattr(conv, "lane_pad", lambda: 128)
    pcm_tpu = np.asarray(snac_decode_fn(p, codes, cfg))

    assert pcm_tpu.shape == pcm_plain.shape
    corr = float(np.corrcoef(pcm_tpu.ravel(), pcm_plain.ravel())[0, 1])
    assert corr > 0.999999, f"corr={corr}"
    assert np.abs(pcm_tpu - pcm_plain).max() < 1e-4

    n = cfg.pad_to
    x = jnp.asarray(rng.standard_normal((1, n)) * 0.1, jnp.float32)
    c_tpu = np.asarray(snac_encode_fn(p, x, cfg))
    monkeypatch.undo()
    c_plain = np.asarray(snac_encode_fn(p, x, cfg))
    mism = int((c_tpu != c_plain).sum())
    assert mism <= c_plain.size * 0.02, f"{mism}/{c_plain.size} codes differ"

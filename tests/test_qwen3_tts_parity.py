"""Qwen3-TTS-Tokenizer parity: encoder vs HF MimiModel (the q3t encoder IS
the mimi encoder), decoder vs a torch mirror of the Qwen3 codec decoder."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

N_Q = 4
V = 64
CBD = 16          # codebook vector dim (cb_dim_half)
LAT = 32          # latent (pre-conv out = pt in)
HID = 32          # pre-transformer hidden
HEADS, KVH, HD = 2, 2, 16
INTER = 64
RATIOS = (2,)
RATES = (8, 6, 5, 4)
DEC_DIM = 32
HOP = 1920


class TorchQ3TDecoder:
    def __init__(self, n_q=N_Q, v=V, cbd=CBD, lat=LAT, hid=HID, heads=HEADS,
                 kvh=KVH, hd=HD, inter=INTER, ratios=RATIOS, rates=RATES,
                 dec_dim=DEC_DIM, n_layers=2, fan_scale=False):
        g = torch.Generator().manual_seed(0)
        self.sd = {}
        self.n_q, self.v, self.cbd, self.lat, self.hid = n_q, v, cbd, lat, hid
        self.heads, self.kvh, self.hd, self.inter = heads, kvh, hd, inter
        self.ratios, self.rates, self.dec_dim = ratios, rates, dec_dim
        self.n_layers = n_layers

        def P(name, *shape, s=0.2, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps the 1024-hidden transformer
            # and 1536-ch decoder stack O(1) at production width (see the
            # round-5 fullsize gates for the rationale)
            if fan_scale and len(shape) >= 2:
                import math as _m
                s = s / _m.sqrt(_m.prod(shape[1:]))
            t = torch.randn(*shape, generator=g) * s + off
            self.sd[name] = t
            return t

        d = "decoder."
        # quantizer codebooks via embedding_sum / cluster_usage
        self.cb = []
        for group, idxs in (("rvq_first", [0]), ("rvq_rest", list(range(n_q - 1)))):
            for qi in idxs:
                es = P(f"{d}quantizer.{group}.vq.layers.{qi}._codebook.embedding_sum",
                       v, cbd, s=1.0)
                cu = torch.rand(v, generator=g) + 0.5
                self.sd[f"{d}quantizer.{group}.vq.layers.{qi}._codebook.cluster_usage"] = cu
                self.cb.append(es / torch.clamp(cu[:, None], min=1e-5))
        self.sem_op = P(f"{d}quantizer.rvq_first.output_proj.weight", lat, cbd, 1)
        self.acu_op = P(f"{d}quantizer.rvq_rest.output_proj.weight", lat, cbd, 1)
        self.pre_w = P(f"{d}pre_conv.conv.weight", lat, lat, 3)
        self.pre_b = P(f"{d}pre_conv.conv.bias", lat)

        pt = f"{d}pre_transformer."
        self.pt_in = (P(pt + "input_proj.weight", hid, lat), P(pt + "input_proj.bias", hid))
        self.pt_out = (P(pt + "output_proj.weight", lat, hid), P(pt + "output_proj.bias", lat))
        self.pt_norm = P(pt + "norm.weight", hid, s=1.0, off=1.0)
        self.layers = []
        for li in range(n_layers):
            lp = f"{pt}layers.{li}."
            self.layers.append({
                "inln": P(lp + "input_layernorm.weight", hid, s=1.0, off=1.0),
                "paln": P(lp + "post_attention_layernorm.weight", hid, s=1.0, off=1.0),
                "q": (P(lp + "self_attn.q_proj.weight", heads * hd, hid),
                      P(lp + "self_attn.q_proj.bias", heads * hd)),
                "k": (P(lp + "self_attn.k_proj.weight", kvh * hd, hid),
                      P(lp + "self_attn.k_proj.bias", kvh * hd)),
                "v": (P(lp + "self_attn.v_proj.weight", kvh * hd, hid),
                      P(lp + "self_attn.v_proj.bias", kvh * hd)),
                "o": (P(lp + "self_attn.o_proj.weight", hid, heads * hd),
                      P(lp + "self_attn.o_proj.bias", hid)),
                "gate": P(lp + "mlp.gate_proj.weight", inter, hid),
                "up": P(lp + "mlp.up_proj.weight", inter, hid),
                "down": P(lp + "mlp.down_proj.weight", hid, inter),
                "sa_s": P(lp + "self_attn_layer_scale.scale", hid, s=0.1),
                "mlp_s": P(lp + "mlp_layer_scale.scale", hid, s=0.1),
            })

        # upsample stage 0: convtr + convnext
        u = f"{d}upsample.0."
        self.up_tr = (P(u + "0.conv.weight", lat, lat, 2 * ratios[0]), P(u + "0.conv.bias", lat))
        self.up_cnx = {
            "dw": (P(u + "1.dwconv.conv.weight", lat, 1, 7), P(u + "1.dwconv.conv.bias", lat)),
            "ln": (P(u + "1.norm.weight", lat, s=1.0, off=1.0), P(u + "1.norm.bias", lat)),
            "pw1": (P(u + "1.pwconv1.weight", inter, lat), P(u + "1.pwconv1.bias", inter)),
            "pw2": (P(u + "1.pwconv2.weight", lat, inter), P(u + "1.pwconv2.bias", lat)),
            "gamma": P(u + "1.gamma", lat, s=1.0),
        }

        dd = f"{d}decoder."
        self.d0 = (P(dd + "0.conv.weight", dec_dim, lat, 7), P(dd + "0.conv.bias", dec_dim))
        self.blocks = []
        ch = dec_dim
        for bi, rate in enumerate(rates, start=1):
            out = ch // 2
            b = f"{dd}{bi}.block."
            blk = {
                "s0": (P(b + "0.alpha", ch), P(b + "0.beta", ch)),
                "tr": (P(b + "1.conv.weight", ch, out, 2 * rate), P(b + "1.conv.bias", out)),
                "units": [], "rate": rate,
            }
            for ri, dil in enumerate((1, 3, 9)):
                rb = f"{b}{ri + 2}."
                blk["units"].append({
                    "a1": (P(rb + "act1.alpha", out), P(rb + "act1.beta", out)),
                    "c1": (P(rb + "conv1.conv.weight", out, out, 3), P(rb + "conv1.conv.bias", out)),
                    "a2": (P(rb + "act2.alpha", out), P(rb + "act2.beta", out)),
                    "c2": (P(rb + "conv2.conv.weight", out, out, 1), P(rb + "conv2.conv.bias", out)),
                    "dil": dil,
                })
            self.blocks.append(blk)
            ch = out
        self.final_s = (P(dd + "5.alpha", ch), P(dd + "5.beta", ch))
        self.final = (P(dd + "6.conv.weight", 1, ch, 7), P(dd + "6.conv.bias", 1))

    @staticmethod
    def causal_conv(x, w, b, dilation=1, groups=1):
        k = w.shape[2]
        return F.conv1d(F.pad(x, ((k - 1) * dilation, 0)), w, b,
                        dilation=dilation, groups=groups)

    @staticmethod
    def causal_convtr(x, w, b, stride):
        k = w.shape[2]
        y = F.conv_transpose1d(x, w, b, stride=stride)
        crop = k - stride
        return y[:, :, :-crop] if crop > 0 else y

    @staticmethod
    def sb(x, alpha, beta):
        a = torch.exp(alpha).view(1, -1, 1)
        binv = (1.0 / (torch.exp(beta) + 1e-9)).view(1, -1, 1)
        return x + torch.sin(a * x) ** 2 * binv

    def decode(self, codes):
        # codes [B, T, N_Q]
        heads, kvh, hd, hid, lat = self.heads, self.kvh, self.hd, self.hid, self.lat
        sem = self.cb[0][codes[..., 0]]
        acu = sum(self.cb[qi][codes[..., qi]] for qi in range(1, self.n_q))
        x = sem @ self.sem_op[:, :, 0].T + acu @ self.acu_op[:, :, 0].T  # [B,T,LAT]
        x = self.causal_conv(x.permute(0, 2, 1), self.pre_w, self.pre_b).permute(0, 2, 1)

        h = x @ self.pt_in[0].T + self.pt_in[1]
        for lw in self.layers:
            def rms(v, w):
                return v * torch.rsqrt((v ** 2).mean(-1, keepdim=True) + 1e-5) * w
            hn = rms(h, lw["inln"])
            b, t, _ = hn.shape
            q = (hn @ lw["q"][0].T + lw["q"][1]).view(b, t, heads, hd).transpose(1, 2)
            k = (hn @ lw["k"][0].T + lw["k"][1]).view(b, t, kvh, hd).transpose(1, 2)
            v = (hn @ lw["v"][0].T + lw["v"][1]).view(b, t, kvh, hd).transpose(1, 2)
            # NEOX rope
            inv = 1.0 / 10000.0 ** (torch.arange(0, hd, 2) / hd)
            ang = torch.arange(t)[:, None] * inv[None]
            cos = torch.cat([ang.cos(), ang.cos()], -1)
            sin = torch.cat([ang.sin(), ang.sin()], -1)

            def rot(z):
                z1, z2 = z[..., :hd // 2], z[..., hd // 2:]
                return z * cos + torch.cat([-z2, z1], -1) * sin
            q, k = rot(q), rot(k)
            if kvh != heads:
                k = k.repeat_interleave(heads // kvh, dim=1)
                v = v.repeat_interleave(heads // kvh, dim=1)
            att = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            att = att.transpose(1, 2).reshape(b, t, heads * hd)
            h = h + (att @ lw["o"][0].T + lw["o"][1]) * lw["sa_s"]
            m = rms(h, lw["paln"])
            m = (F.silu(m @ lw["gate"].T) * (m @ lw["up"].T)) @ lw["down"].T
            h = h + m * lw["mlp_s"]
        h = h * torch.rsqrt((h ** 2).mean(-1, keepdim=True) + 1e-5) * self.pt_norm
        x = h @ self.pt_out[0].T + self.pt_out[1]

        xc = x.permute(0, 2, 1)
        xc = self.causal_convtr(xc, self.up_tr[0], self.up_tr[1], self.ratios[0])
        res = xc
        hh = self.causal_conv(xc, self.up_cnx["dw"][0], self.up_cnx["dw"][1], groups=lat)
        hh = hh.permute(0, 2, 1)
        hh = F.layer_norm(hh, (lat,), self.up_cnx["ln"][0], self.up_cnx["ln"][1], eps=1e-6)
        hh = F.gelu(hh @ self.up_cnx["pw1"][0].T + self.up_cnx["pw1"][1])
        hh = hh @ self.up_cnx["pw2"][0].T + self.up_cnx["pw2"][1]
        xc = res + (hh * self.up_cnx["gamma"]).permute(0, 2, 1)

        xc = self.causal_conv(xc, *self.d0)
        for blk in self.blocks:
            xc = self.sb(xc, *blk["s0"])
            xc = self.causal_convtr(xc, blk["tr"][0], blk["tr"][1], blk["rate"])
            for u in blk["units"]:
                r = xc
                h2 = self.sb(xc, *u["a1"])
                h2 = self.causal_conv(h2, *u["c1"], dilation=u["dil"])
                h2 = self.sb(h2, *u["a2"])
                h2 = self.causal_conv(h2, *u["c2"])
                xc = r + h2
        xc = self.sb(xc, *self.final_s)
        xc = self.causal_conv(xc, *self.final)
        return torch.clamp(xc, -1, 1)[:, 0]


@pytest.fixture(scope="module")
def tiny_q3t(tmp_path_factory):
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(1)
    enc_cfg = MimiConfig(
        sampling_rate=24000, frame_rate=12.5, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=2, head_dim=32,
        num_key_value_heads=2, intermediate_size=128, num_filters=8,
        num_residual_layers=1, codebook_size=V, codebook_dim=CBD,
        vector_quantization_hidden_dimension=CBD, num_quantizers=N_Q,
        num_semantic_quantizers=1, sliding_window=250, upsample_groups=64,
        upsampling_ratios=[8, 6, 5, 4], use_causal_conv=True,
    )
    hf_mimi = MimiModel(enc_cfg).eval()
    dec = TorchQ3TDecoder()

    sd = {f"encoder.{k}": v.numpy() for k, v in hf_mimi.state_dict().items()}
    sd.update({k: v.numpy() for k, v in dec.sd.items()})

    from codec_tpu.convert import get_converter

    c = get_converter("qwen3_tts_tokenizer")(quantization="F32")
    c.load_from_state_dict(sd, {
        "output_sample_rate": 24000, "decode_upsample_rate": HOP,
        "decoder_config": {
            "num_quantizers": N_Q, "codebook_size": V, "codebook_dim": CBD,
            "latent_dim": LAT, "hidden_size": HID, "num_hidden_layers": 2,
            "num_attention_heads": HEADS, "num_key_value_heads": KVH,
            "head_dim": HD, "intermediate_size": INTER, "rope_theta": 10000.0,
            "sliding_window": 0, "decoder_dim": DEC_DIM,
            "upsampling_ratios": list(RATIOS), "upsample_rates": list(RATES),
        },
        "encoder_config": {
            "num_quantizers": N_Q, "codebook_size": V, "codebook_dim": CBD,
            "hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 2,
            "head_dim": 32, "intermediate_size": 128, "rope_theta": 10000.0,
        },
    })
    path = tmp_path_factory.mktemp("q3t") / "tiny.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return hf_mimi, dec, codec_tpu.load_model(path)


def test_config(tiny_q3t):
    _, _, ours = tiny_q3t
    assert ours.arch == "qwen3_tts_tokenizer"
    assert ours.n_q == N_Q and ours.hop_size == HOP
    assert ours.has_encoder and ours.has_decoder


@pytest.mark.parametrize("tail", [0, 733])
def test_encode_parity_vs_hf_mimi(tiny_q3t, tail):
    """tail=733: non-frame-aligned — final partial frame must follow the
    per-layer padding semantics (mimi_encode_fn n_valid)."""
    hf_mimi, _, ours = tiny_q3t
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(2 * HOP + tail) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf_mimi.encode(torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]
    got = ours.encode(pcm)
    assert (got == want.T).all()


def test_decode_parity(tiny_q3t):
    _, dec, ours = tiny_q3t
    rng = np.random.default_rng(1)
    t = 5
    codes = rng.integers(0, V, (1, t, N_Q))
    with torch.no_grad():
        want = dec.decode(torch.from_numpy(codes)).numpy()[0]
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * HOP,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    # 2e-3: the random-weight decoder saturates at ±1 with large pre-clamp
    # intermediates, so XLA fusion-order jitter shows up amplified here.
    assert np.abs(got - want).max() < 2e-3


# ---------------------------------------------------------------------------
# Full-production-shape gate (Qwen3-TTS-Tokenizer dims, cited from the
# reference converter defaults — scripts/converters/qwen3_tts_tokenizer.py:
# 430-466: n_q 16, codebook 2048 x 1024, latent 1024, decoder transformer
# 1024h x 8L x 16 heads x hd 64 x inter 3072, decoder_dim 1536, upsampling
# (2,) + rates (8,6,5,4), hop 1920; encoder = mimi at qwen3.encoder.*
# defaults (hidden 512, 8L, 8 heads, inter 2048 — :448-452) with 16
# quantizers. Companion to test_{mimi,dac}_fullsize.py.
# ---------------------------------------------------------------------------

F_N_Q, F_V, F_CBD, F_LAT = 16, 2048, 1024, 1024
F_HID, F_HEADS, F_KVH, F_HD, F_INTER = 1024, 16, 16, 64, 3072
F_DEC_DIM, F_RATIOS, F_RATES = 1536, (2,), (8, 6, 5, 4)
F_ENC_CBD = 256   # encoder-side VQ dim (kyutai mimi codebook layout)


@pytest.fixture(scope="module")
def full_q3t(tmp_path_factory):
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(2)
    enc_cfg = MimiConfig(num_quantizers=F_N_Q, codebook_size=F_V,
                         codebook_dim=F_ENC_CBD)
    assert enc_cfg.hidden_size == 512 and enc_cfg.num_filters == 64
    hf_mimi = MimiModel(enc_cfg).eval()
    # Spread the codebooks like test_mimi_fullsize: HF random init leaves
    # embed_sum near zero → every argmin a degenerate near-tie.
    g = torch.Generator().manual_seed(8)
    with torch.no_grad():
        for name, buf in hf_mimi.named_buffers():
            if name.endswith("codebook.embed_sum"):
                buf.copy_(torch.randn(buf.shape, generator=g))

    dec = TorchQ3TDecoder(n_q=F_N_Q, v=F_V, cbd=F_CBD, lat=F_LAT, hid=F_HID,
                          heads=F_HEADS, kvh=F_KVH, hd=F_HD, inter=F_INTER,
                          ratios=F_RATIOS, rates=F_RATES, dec_dim=F_DEC_DIM,
                          n_layers=8, fan_scale=True)

    sd = {f"encoder.{k}": v.numpy() for k, v in hf_mimi.state_dict().items()}
    sd.update({k: v.numpy() for k, v in dec.sd.items()})

    from codec_tpu.convert import get_converter

    c = get_converter("qwen3_tts_tokenizer")(quantization="F32")
    c.load_from_state_dict(sd, {
        "output_sample_rate": 24000, "decode_upsample_rate": HOP,
        "decoder_config": {
            "num_quantizers": F_N_Q, "codebook_size": F_V, "codebook_dim": F_CBD,
            "latent_dim": F_LAT, "hidden_size": F_HID, "num_hidden_layers": 8,
            "num_attention_heads": F_HEADS, "num_key_value_heads": F_KVH,
            "head_dim": F_HD, "intermediate_size": F_INTER, "rope_theta": 10000.0,
            "sliding_window": 0, "decoder_dim": F_DEC_DIM,
            "upsampling_ratios": list(F_RATIOS), "upsample_rates": list(F_RATES),
        },
        "encoder_config": {
            "num_quantizers": F_N_Q, "codebook_size": F_V, "codebook_dim": F_ENC_CBD,
            "hidden_size": 512, "num_hidden_layers": 8, "num_attention_heads": 8,
            "head_dim": 64, "intermediate_size": 2048, "rope_theta": 10000.0,
        },
    })
    path = tmp_path_factory.mktemp("q3t_full") / "full.gguf"
    c.convert_and_save(path)

    import codec_tpu

    return hf_mimi, dec, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_encode_codes_exact_or_near_tie(full_q3t):
    """Codes match HF mimi bit-for-bit except provable f32 RVQ near-ties
    (margin helper shared with test_mimi_fullsize)."""
    from test_mimi_fullsize import _first_divergence_margin

    hf_mimi, _, ours = full_q3t
    rng = np.random.default_rng(9)
    t_frames = 52
    n = t_frames * HOP + 517  # non-frame-aligned tail
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf_mimi.encode(
            torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]  # [Q,T]
    got = ours.encode(pcm)  # [T,Q]
    assert got.shape == (want.shape[1], want.shape[0])
    mism = got.T != want
    frames = np.where(mism.any(axis=0))[0]
    assert len(frames) <= max(2, want.shape[1] // 100), \
        f"{len(frames)}/{want.shape[1]} frames diverge — not tie noise"
    for fr in frames:
        fq = int(mism[:, fr].argmax())
        margin = _first_divergence_margin(hf_mimi, pcm, want, got.T, int(fr), fq)
        assert abs(margin) < 1e-4, \
            f"frame {fr} q{fq}: rel margin {margin:.2e} — a real mismatch"


@pytest.mark.slow
def test_fullsize_decode_corr(full_q3t):
    _, dec, ours = full_q3t
    rng = np.random.default_rng(10)
    t = 4
    codes = rng.integers(0, F_V, (1, t, F_N_Q))
    with torch.no_grad():
        want = dec.decode(torch.from_numpy(codes)).numpy()[0]
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape == (t * HOP,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 2e-3

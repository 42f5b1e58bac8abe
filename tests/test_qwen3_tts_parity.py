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
    def __init__(self):
        g = torch.Generator().manual_seed(0)
        self.sd = {}

        def P(name, *shape, s=0.2, off=0.0):
            t = torch.randn(*shape, generator=g) * s + off
            self.sd[name] = t
            return t

        d = "decoder."
        # quantizer codebooks via embedding_sum / cluster_usage
        self.cb = []
        for group, idxs in (("rvq_first", [0]), ("rvq_rest", [0, 1, 2])):
            for qi in idxs:
                es = P(f"{d}quantizer.{group}.vq.layers.{qi}._codebook.embedding_sum",
                       V, CBD, s=1.0)
                cu = torch.rand(V, generator=g) + 0.5
                self.sd[f"{d}quantizer.{group}.vq.layers.{qi}._codebook.cluster_usage"] = cu
                self.cb.append(es / torch.clamp(cu[:, None], min=1e-5))
        self.sem_op = P(f"{d}quantizer.rvq_first.output_proj.weight", LAT, CBD, 1)
        self.acu_op = P(f"{d}quantizer.rvq_rest.output_proj.weight", LAT, CBD, 1)
        self.pre_w = P(f"{d}pre_conv.conv.weight", LAT, LAT, 3)
        self.pre_b = P(f"{d}pre_conv.conv.bias", LAT)

        pt = f"{d}pre_transformer."
        self.pt_in = (P(pt + "input_proj.weight", HID, LAT), P(pt + "input_proj.bias", HID))
        self.pt_out = (P(pt + "output_proj.weight", LAT, HID), P(pt + "output_proj.bias", LAT))
        self.pt_norm = P(pt + "norm.weight", HID, s=1.0, off=1.0)
        self.layers = []
        for li in range(2):
            lp = f"{pt}layers.{li}."
            self.layers.append({
                "inln": P(lp + "input_layernorm.weight", HID, s=1.0, off=1.0),
                "paln": P(lp + "post_attention_layernorm.weight", HID, s=1.0, off=1.0),
                "q": (P(lp + "self_attn.q_proj.weight", HEADS * HD, HID),
                      P(lp + "self_attn.q_proj.bias", HEADS * HD)),
                "k": (P(lp + "self_attn.k_proj.weight", KVH * HD, HID),
                      P(lp + "self_attn.k_proj.bias", KVH * HD)),
                "v": (P(lp + "self_attn.v_proj.weight", KVH * HD, HID),
                      P(lp + "self_attn.v_proj.bias", KVH * HD)),
                "o": (P(lp + "self_attn.o_proj.weight", HID, HEADS * HD),
                      P(lp + "self_attn.o_proj.bias", HID)),
                "gate": P(lp + "mlp.gate_proj.weight", INTER, HID),
                "up": P(lp + "mlp.up_proj.weight", INTER, HID),
                "down": P(lp + "mlp.down_proj.weight", HID, INTER),
                "sa_s": P(lp + "self_attn_layer_scale.scale", HID, s=0.1),
                "mlp_s": P(lp + "mlp_layer_scale.scale", HID, s=0.1),
            })

        # upsample stage 0: convtr + convnext
        u = f"{d}upsample.0."
        self.up_tr = (P(u + "0.conv.weight", LAT, LAT, 4), P(u + "0.conv.bias", LAT))
        self.up_cnx = {
            "dw": (P(u + "1.dwconv.conv.weight", LAT, 1, 7), P(u + "1.dwconv.conv.bias", LAT)),
            "ln": (P(u + "1.norm.weight", LAT, s=1.0, off=1.0), P(u + "1.norm.bias", LAT)),
            "pw1": (P(u + "1.pwconv1.weight", INTER, LAT), P(u + "1.pwconv1.bias", INTER)),
            "pw2": (P(u + "1.pwconv2.weight", LAT, INTER), P(u + "1.pwconv2.bias", LAT)),
            "gamma": P(u + "1.gamma", LAT, s=1.0),
        }

        dd = f"{d}decoder."
        self.d0 = (P(dd + "0.conv.weight", DEC_DIM, LAT, 7), P(dd + "0.conv.bias", DEC_DIM))
        self.blocks = []
        ch = DEC_DIM
        for bi, rate in enumerate(RATES, start=1):
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
        sem = self.cb[0][codes[..., 0]]
        acu = sum(self.cb[qi][codes[..., qi]] for qi in range(1, N_Q))
        x = sem @ self.sem_op[:, :, 0].T + acu @ self.acu_op[:, :, 0].T  # [B,T,LAT]
        x = self.causal_conv(x.permute(0, 2, 1), self.pre_w, self.pre_b).permute(0, 2, 1)

        h = x @ self.pt_in[0].T + self.pt_in[1]
        for lw in self.layers:
            def rms(v, w):
                return v * torch.rsqrt((v ** 2).mean(-1, keepdim=True) + 1e-5) * w
            hn = rms(h, lw["inln"])
            b, t, _ = hn.shape
            q = (hn @ lw["q"][0].T + lw["q"][1]).view(b, t, HEADS, HD).transpose(1, 2)
            k = (hn @ lw["k"][0].T + lw["k"][1]).view(b, t, KVH, HD).transpose(1, 2)
            v = (hn @ lw["v"][0].T + lw["v"][1]).view(b, t, KVH, HD).transpose(1, 2)
            # NEOX rope
            inv = 1.0 / 10000.0 ** (torch.arange(0, HD, 2) / HD)
            ang = torch.arange(t)[:, None] * inv[None]
            cos = torch.cat([ang.cos(), ang.cos()], -1)
            sin = torch.cat([ang.sin(), ang.sin()], -1)

            def rot(z):
                z1, z2 = z[..., :HD // 2], z[..., HD // 2:]
                return z * cos + torch.cat([-z2, z1], -1) * sin
            q, k = rot(q), rot(k)
            att = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            att = att.transpose(1, 2).reshape(b, t, HEADS * HD)
            h = h + (att @ lw["o"][0].T + lw["o"][1]) * lw["sa_s"]
            m = rms(h, lw["paln"])
            m = (F.silu(m @ lw["gate"].T) * (m @ lw["up"].T)) @ lw["down"].T
            h = h + m * lw["mlp_s"]
        h = h * torch.rsqrt((h ** 2).mean(-1, keepdim=True) + 1e-5) * self.pt_norm
        x = h @ self.pt_out[0].T + self.pt_out[1]

        xc = x.permute(0, 2, 1)
        xc = self.causal_convtr(xc, self.up_tr[0], self.up_tr[1], RATIOS[0])
        res = xc
        hh = self.causal_conv(xc, self.up_cnx["dw"][0], self.up_cnx["dw"][1], groups=LAT)
        hh = hh.permute(0, 2, 1)
        hh = F.layer_norm(hh, (LAT,), self.up_cnx["ln"][0], self.up_cnx["ln"][1], eps=1e-6)
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

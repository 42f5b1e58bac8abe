"""XY-Tokenizer parity vs a torch mirror (Whisper-style dual encoder +
8-level RVQ + Vocos/iSTFT decoder). The GGUF is built directly in the wire
schema (xy.* names, the same one the reference runtime consumes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.dsp.audio import whisper_mel_padded
from codec_tpu.io.gguf import GGUFWriter

MELS, MEL_FFT, MEL_HOP = 16, 64, 32
ENC_DOWN = 256           # pad pcm to multiple → mel frames multiple of 8
D, HEADS, LAYERS, ADAPT = 32, 2, 1, 1
AVG = 4
LAT = AVG * D            # 128
RVQ_D, V, N_Q = 16, 32, 2
UP_STRIDE = 4
VOCOS_BLOCKS = 1
VN_FFT, VHOP = 96, 24
DEC_UP = 192
VOC_D = D                # vocos backbone dim (production: 512 != D)


class TorchXY:
    def __init__(self, fan_scale=False):
        g = torch.Generator().manual_seed(0)
        self.t = {}

        def P(name, *shape, s=0.25, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps production-width stacks O(1)
            # (see the WavTokenizer/xcodec2 full-size gates)
            if fan_scale and len(shape) >= 2 and off == 0.0:
                import math
                s = s / math.sqrt(math.prod(shape[1:]))
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        def whisper_module(base, n_layers, d_in=D, max_pos=64):
            P(base + ".pos_emb", max_pos, D, s=0.1)
            P(base + ".layer_norm.w", D, s=0.2, off=1.0)
            P(base + ".layer_norm.b", D)
            for li in range(n_layers):
                lp = f"{base}.l{li}"
                P(lp + ".norm1.w", D, s=0.2, off=1.0)
                P(lp + ".norm1.b", D)
                P(lp + ".attn.q.w", D, D)
                P(lp + ".attn.q.b", D)
                P(lp + ".attn.k.w", D, D)
                P(lp + ".attn.v.w", D, D)
                P(lp + ".attn.v.b", D)
                P(lp + ".attn.out.w", D, D)
                P(lp + ".attn.out.b", D)
                P(lp + ".norm2.w", D, s=0.2, off=1.0)
                P(lp + ".norm2.b", D)
                P(lp + ".mlp.fc1.w", 2 * D, D)
                P(lp + ".mlp.fc1.b", 2 * D)
                P(lp + ".mlp.fc2.w", D, 2 * D)
                P(lp + ".mlp.fc2.b", D)

        for enc in ("xy.sem_enc", "xy.acoust_enc"):
            P(enc + ".conv1.w", D, MELS, 3)
            P(enc + ".conv1.b", D)
            P(enc + ".conv2.w", D, D, 3)
            P(enc + ".conv2.b", D)
            whisper_module(enc, LAYERS)
        whisper_module("xy.sem_enc_adapter", ADAPT)
        whisper_module("xy.pre_rvq_adapter", ADAPT)
        P("xy.pre_rvq_adapter.proj.w", D, 2 * D)
        P("xy.pre_rvq_adapter.proj.b", D)
        P("xy.downsample.gate.w", LAT, D, AVG)
        P("xy.downsample.up.w", LAT, D, AVG)
        P("xy.downsample.down.w", LAT, LAT, s=0.1)
        P("xy.downsample.layer_norm.w", LAT, s=0.2, off=1.0)
        P("xy.downsample.layer_norm.b", LAT)
        P("xy.q.in_proj.w", RVQ_D, LAT, 1)
        P("xy.q.in_proj.b", RVQ_D)
        for qi in range(N_Q):
            P(f"xy.q.{qi}.codebook", V, RVQ_D, s=1.0)
        P("xy.q.out_proj.w", LAT, RVQ_D, 1)
        P("xy.q.out_proj.b", LAT)
        whisper_module("xy.post_rvq_adapter", ADAPT, max_pos=16)
        P("xy.post_rvq_adapter.proj.w", D, LAT)
        P("xy.post_rvq_adapter.proj.b", D)
        P("xy.post_rvq_adapter.out_proj.w", LAT, D)
        P("xy.post_rvq_adapter.out_proj.b", LAT)
        P("xy.upsample.up_conv.w", LAT, D, UP_STRIDE)     # convtr (in,out,k)
        whisper_module("xy.acoust_dec", LAYERS, max_pos=80)
        P("xy.acoust_dec.deconv1.w", D, D, 3)             # convtr (in,out,k)
        P("xy.acoust_dec.deconv1.b", D)
        P("xy.acoust_dec.deconv2.w", D, MELS, 1)
        P("xy.acoust_dec.deconv2.b", MELS)
        P("xy.vocos.embed.w", VOC_D, MELS, 7)
        P("xy.vocos.embed.b", VOC_D)
        P("xy.vocos.norm.w", VOC_D, s=0.2, off=1.0)
        P("xy.vocos.norm.b", VOC_D)
        for bi in range(VOCOS_BLOCKS):
            bp = f"xy.vocos.b{bi}"
            P(bp + ".dwconv.w", VOC_D, 1, 7)
            P(bp + ".dwconv.b", VOC_D)
            P(bp + ".norm.w", VOC_D, s=0.2, off=1.0)
            P(bp + ".norm.b", VOC_D)
            P(bp + ".pwconv1.w", 2 * VOC_D, VOC_D)
            P(bp + ".pwconv1.b", 2 * VOC_D)
            P(bp + ".pwconv2.w", VOC_D, 2 * VOC_D)
            P(bp + ".pwconv2.b", VOC_D)
            P(bp + ".gamma", VOC_D, s=1.0)
        P("xy.vocos.final_layer_norm.w", VOC_D, s=0.2, off=1.0)
        P("xy.vocos.final_layer_norm.b", VOC_D)
        P("xy.vocos.head.out.w", VN_FFT + 2, VOC_D)
        P("xy.vocos.head.out.b", VN_FFT + 2)

    # ---- torch forward ---------------------------------------------------
    def whisper_layer(self, x, lp, n_valid=None):
        t = self.t
        d = D // HEADS
        h = F.layer_norm(x, (D,), t[lp + ".norm1.w"], t[lp + ".norm1.b"], eps=1e-5)
        q = (h @ t[lp + ".attn.q.w"].T + t[lp + ".attn.q.b"]) * (d ** -0.5)
        k = h @ t[lp + ".attn.k.w"].T
        v = h @ t[lp + ".attn.v.w"].T + t[lp + ".attn.v.b"]
        b, T, _ = x.shape
        q = q.view(b, T, HEADS, d).transpose(1, 2)
        k = k.view(b, T, HEADS, d).transpose(1, 2)
        v = v.view(b, T, HEADS, d).transpose(1, 2)
        logits = q @ k.transpose(-1, -2)
        if n_valid is not None:
            mask = torch.arange(T)[None, None, None, :] >= n_valid
            logits = logits.masked_fill(mask, float("-inf"))
        a = torch.softmax(logits, -1) @ v
        a = a.transpose(1, 2).reshape(b, T, D)
        a = a @ t[lp + ".attn.out.w"].T + t[lp + ".attn.out.b"]
        if n_valid is not None:
            qmask = (torch.arange(T) < n_valid)[None, :, None]
            a = a * qmask
        x = x + a
        m = F.layer_norm(x, (D,), t[lp + ".norm2.w"], t[lp + ".norm2.b"], eps=1e-5)
        m = F.gelu(m @ t[lp + ".mlp.fc1.w"].T + t[lp + ".mlp.fc1.b"]) \
            @ t[lp + ".mlp.fc2.w"].T + t[lp + ".mlp.fc2.b"]
        if n_valid is not None:
            m = m * qmask
        return x + m

    def whisper_module(self, x, base, n_layers, n_valid=None):
        t = self.t
        if base + ".proj.w" in t:
            x = x @ t[base + ".proj.w"].T + t[base + ".proj.b"]
        x = x + t[base + ".pos_emb"][: x.shape[1]]
        for li in range(n_layers):
            x = self.whisper_layer(x, f"{base}.l{li}", n_valid)
        x = F.layer_norm(x, (D,) if x.shape[-1] == D else (x.shape[-1],),
                         t[base + ".layer_norm.w"], t[base + ".layer_norm.b"], eps=1e-5)
        if base + ".out_proj.w" in t:
            x = x @ t[base + ".out_proj.w"].T + t[base + ".out_proj.b"]
        return x

    def encode(self, mel, n_valid_mel, return_z=False):
        # mel [B, T, MELS]
        t = self.t
        nvc = n_valid_mel // 2

        def omni(base):
            x = F.conv1d(mel.permute(0, 2, 1), t[base + ".conv1.w"],
                         t[base + ".conv1.b"], padding=1)
            x = F.gelu(x)
            x = F.conv1d(x, t[base + ".conv2.w"], t[base + ".conv2.b"],
                         stride=2, padding=1)
            x = F.gelu(x).permute(0, 2, 1)
            return self.whisper_module(x, base, LAYERS, nvc)

        sem = omni("xy.sem_enc")
        aco = omni("xy.acoust_enc")
        sem = self.whisper_module(sem, "xy.sem_enc_adapter", ADAPT, nvc)
        cat = torch.cat([sem, aco], -1)
        cat = self.whisper_module(cat, "xy.pre_rvq_adapter", ADAPT, nvc)
        gate = F.conv1d(cat.permute(0, 2, 1), t["xy.downsample.gate.w"], None,
                        stride=AVG).permute(0, 2, 1)
        up = F.conv1d(cat.permute(0, 2, 1), t["xy.downsample.up.w"], None,
                      stride=AVG).permute(0, 2, 1)
        b, T, d = cat.shape
        fold = cat.reshape(b, T // AVG, AVG * d)
        y = (F.silu(gate) * up) @ t["xy.downsample.down.w"].T + fold
        y = F.layer_norm(y, (LAT,), t["xy.downsample.layer_norm.w"],
                         t["xy.downsample.layer_norm.b"], eps=1e-5)
        z = y @ t["xy.q.in_proj.w"][:, :, 0].T + t["xy.q.in_proj.b"]
        if return_z:
            return z
        codes = []
        residual = z
        for qi in range(N_Q):
            cb = t[f"xy.q.{qi}.codebook"]
            d2 = ((residual[:, :, None, :] - cb[None, None]) ** 2).sum(-1)
            idx = d2.argmin(-1)
            codes.append(idx)
            residual = residual - cb[idx]
        return torch.stack(codes, -1)

    def decode_head(self, codes):
        t = self.t
        z = sum(t[f"xy.q.{qi}.codebook"][codes[..., qi]] for qi in range(N_Q))
        x = z @ t["xy.q.out_proj.w"][:, :, 0].T + t["xy.q.out_proj.b"]
        x = self.whisper_module(x, "xy.post_rvq_adapter", ADAPT)
        x = F.conv_transpose1d(x.permute(0, 2, 1), t["xy.upsample.up_conv.w"],
                               None, stride=UP_STRIDE).permute(0, 2, 1)
        x = self.whisper_module(x, "xy.acoust_dec", LAYERS)
        x = F.conv_transpose1d(x.permute(0, 2, 1), t["xy.acoust_dec.deconv1.w"],
                               t["xy.acoust_dec.deconv1.b"], stride=2)
        x = F.gelu(x)
        x = F.conv_transpose1d(x, t["xy.acoust_dec.deconv2.w"],
                               t["xy.acoust_dec.deconv2.b"], stride=1)
        x = F.gelu(x)
        x = F.conv1d(x, t["xy.vocos.embed.w"], t["xy.vocos.embed.b"], padding=3)
        x = x.permute(0, 2, 1)
        x = F.layer_norm(x, (VOC_D,), t["xy.vocos.norm.w"],
                         t["xy.vocos.norm.b"], eps=1e-6)
        for bi in range(VOCOS_BLOCKS):
            bp = f"xy.vocos.b{bi}"
            r = x
            h = F.conv1d(x.permute(0, 2, 1), t[bp + ".dwconv.w"],
                         t[bp + ".dwconv.b"], padding=3,
                         groups=VOC_D).permute(0, 2, 1)
            h = F.layer_norm(h, (VOC_D,), t[bp + ".norm.w"],
                             t[bp + ".norm.b"], eps=1e-6)
            h = F.gelu(h @ t[bp + ".pwconv1.w"].T + t[bp + ".pwconv1.b"])
            h = h @ t[bp + ".pwconv2.w"].T + t[bp + ".pwconv2.b"]
            x = r + h * t[bp + ".gamma"]
        x = F.layer_norm(x, (VOC_D,), t["xy.vocos.final_layer_norm.w"],
                         t["xy.vocos.final_layer_norm.b"], eps=1e-6)
        return x @ t["xy.vocos.head.out.w"].T + t["xy.vocos.head.out.b"]


@pytest.fixture(scope="module")
def tiny_xy(tmp_path_factory):
    ref = TorchXY()
    path = tmp_path_factory.mktemp("xy") / "xy.gguf"
    w = GGUFWriter(path, "xy_tokenizer")
    w.add_uint32("codec.encode_sample_rate", 16000)
    w.add_uint32("codec.sample_rate", 24000)
    w.add_uint32("xy.encoder_downsample_rate", ENC_DOWN)
    w.add_uint32("xy.decoder_upsample_rate", DEC_UP)
    w.add_uint32("codec.latent_dim", LAT)
    w.add_uint32("codec.codebook_dim", RVQ_D)
    w.add_uint32("codec.codebook_size", V)
    w.add_uint32("codec.n_q", N_Q)
    w.add_uint32("xy.mel.n_mels", MELS)
    w.add_uint32("xy.mel.n_fft", MEL_FFT)
    w.add_uint32("xy.mel.hop_length", MEL_HOP)
    w.add_uint32("xy.sem_enc.n_layers", LAYERS)
    w.add_uint32("xy.sem_enc.n_heads", HEADS)
    w.add_uint32("xy.sem_enc_adapter.n_layers", ADAPT)
    w.add_uint32("xy.pre_rvq_adapter.n_layers", ADAPT)
    w.add_uint32("xy.post_rvq_adapter.n_layers", ADAPT)
    w.add_uint32("xy.downsample.avg_pooler", AVG)
    w.add_uint32("xy.upsample.stride", UP_STRIDE)
    w.add_uint32("xy.vocos.n_blocks", VOCOS_BLOCKS)
    w.add_uint32("xy.vocos.head.n_fft", VN_FFT)
    w.add_uint32("xy.vocos.head.hop_size", VHOP)
    w.add_bool("codec.has_encoder", True)
    w.add_bool("codec.has_decoder", True)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    # pre-baked squared norms (wire-compat with the reference runtime)
    for qi in range(N_Q):
        cb = ref.t[f"xy.q.{qi}.codebook"].numpy()
        w.add_tensor(f"xy.q.{qi}.codebook_sq_norm", (cb ** 2).sum(-1))
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_xy):
    _, ours = tiny_xy
    assert ours.arch == "xy_tokenizer"
    assert ours.n_q == N_Q
    assert ours.encode_sample_rate == 16000
    assert ours.sample_rate == 24000


def test_encode_parity(tiny_xy):
    ref, ours = tiny_xy
    rng = np.random.default_rng(0)
    n = ENC_DOWN * 3 + 100
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    mel, n_frames = whisper_mel_padded(pcm, 16000, MEL_FFT, MEL_HOP, MELS, ENC_DOWN)
    n_valid = min(n_frames, n // MEL_HOP)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(mel.T[None]), n_valid).numpy()[0]
    n_codes_valid = (n_valid // 2) // AVG
    got = ours.encode(pcm)
    assert got.shape == (n_codes_valid, N_Q)
    mismatch = int((got != want[:n_codes_valid]).sum())
    assert mismatch == 0, f"{mismatch}/{got.size} RVQ codes differ"


def test_decode_parity(tiny_xy):
    ref, ours = tiny_xy
    rng = np.random.default_rng(1)
    t = 5
    codes = rng.integers(0, V, (1, t, N_Q))
    with torch.no_grad():
        head = ref.decode_head(torch.from_numpy(codes))
        # istft (vocos same-padding, periodic hann) — reuse our op's reference
        # formula via torch
        n_bins = VN_FFT // 2 + 1
        logmag, phase = head[..., :n_bins], head[..., n_bins:]
        mag = torch.clamp(torch.exp(logmag), max=1e2)
        S = mag * torch.exp(1j * phase)
        frames = torch.fft.irfft(S, VN_FFT, dim=-1)
        win = torch.hann_window(VN_FFT)
        frames = frames * win
        T = frames.shape[1]
        y = torch.zeros(1, (T - 1) * VHOP + VN_FFT)
        env = torch.zeros_like(y)
        for f in range(T):
            y[:, f * VHOP:f * VHOP + VN_FFT] += frames[:, f]
            env[:, f * VHOP:f * VHOP + VN_FFT] += win ** 2
        y = y / env.clamp(min=1e-11)
        pad = (VN_FFT - VHOP) // 2
        want = y[:, pad:-pad].numpy()[0]
    got = ours.decode(codes[0].astype(np.int32))
    assert got.shape == want.shape
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999, f"corr={corr}"
    assert np.abs(got - want).max() < 2e-3


# ---------------------------------------------------------------------------
# Full-production-shape gates (VERDICT r4 #6). Dims from the reference
# converter's architecture map (reference scripts/converters/xy_tokenizer.py:
# 7-37): 80-mel (n_fft 400, hop 160, 16 kHz) -> two 768-d Whisper-style
# encoders (12 layers, 12 heads) -> pre_rvq 1536->768 + 4 layers ->
# ResidualDownConv avg 4 -> 3072 -> in_proj 3072->512 -> 8-level RVQ of
# 1024x512 -> out_proj 512->3072 -> post_rvq 4 layers -> UpConv stride 4 ->
# OmniAudioDecoder 12 layers -> 80 mel -> Vocos 512 x 30 ConvNeXt blocks ->
# iSTFT head 512->962 (n_fft 960, hop 240, 24 kHz). encoder_downsample_rate
# 1280, decoder hop 1920.

FULL_XY = dict(MELS=80, MEL_FFT=400, MEL_HOP=160, ENC_DOWN=1280,
               D=768, HEADS=12, LAYERS=12, ADAPT=4, AVG=4, LAT=3072,
               RVQ_D=512, V=1024, N_Q=8, UP_STRIDE=4, VOCOS_BLOCKS=30,
               VN_FFT=960, VHOP=240, DEC_UP=1920, VOC_D=512)


@pytest.fixture(scope="module")
def full_xy(tmp_path_factory):
    """Mirror built + reference outputs computed under production globals
    (the mirror reads module globals at call time), then restored."""
    import sys
    m = sys.modules[__name__]
    saved = {k: getattr(m, k) for k in FULL_XY}
    for k, v in FULL_XY.items():
        setattr(m, k, v)
    try:
        ref = TorchXY(fan_scale=True)
        rng = np.random.default_rng(0)
        n = m.ENC_DOWN * 4 + 333            # non-aligned tail
        pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
        mel, n_frames = whisper_mel_padded(pcm, 16000, m.MEL_FFT, m.MEL_HOP,
                                           m.MELS, m.ENC_DOWN)
        n_valid = min(n_frames, n // m.MEL_HOP)
        with torch.no_grad():
            want = ref.encode(torch.from_numpy(mel.T[None]),
                              n_valid).numpy()[0]
            z = ref.encode(torch.from_numpy(mel.T[None]), n_valid,
                           return_z=True)[0].double()
            cbs = [ref.t[f"xy.q.{qi}.codebook"].double()
                   for qi in range(m.N_Q)]
        t_dec = 12
        dec_codes = rng.integers(0, m.V, (1, t_dec, m.N_Q))
        with torch.no_grad():
            head = ref.decode_head(torch.from_numpy(dec_codes))
            n_bins = m.VN_FFT // 2 + 1
            mag = torch.clamp(torch.exp(head[..., :n_bins]), max=1e2)
            S = mag * torch.exp(1j * head[..., n_bins:])
            frames = torch.fft.irfft(S, m.VN_FFT, dim=-1)
            win = torch.hann_window(m.VN_FFT)
            frames = frames * win
            T = frames.shape[1]
            y = torch.zeros(1, (T - 1) * m.VHOP + m.VN_FFT)
            env = torch.zeros_like(y)
            for f in range(T):
                y[:, f * m.VHOP:f * m.VHOP + m.VN_FFT] += frames[:, f]
                env[:, f * m.VHOP:f * m.VHOP + m.VN_FFT] += win ** 2
            y = y / env.clamp(min=1e-11)
            pad = (m.VN_FFT - m.VHOP) // 2
            dec_want = y[:, pad:-pad].numpy()[0]

        path = tmp_path_factory.mktemp("xy_full") / "xy_full.gguf"
        w = GGUFWriter(path, "xy_tokenizer")
        w.add_uint32("codec.encode_sample_rate", 16000)
        w.add_uint32("codec.sample_rate", 24000)
        w.add_uint32("xy.encoder_downsample_rate", m.ENC_DOWN)
        w.add_uint32("xy.decoder_upsample_rate", m.DEC_UP)
        w.add_uint32("codec.latent_dim", m.LAT)
        w.add_uint32("codec.codebook_dim", m.RVQ_D)
        w.add_uint32("codec.codebook_size", m.V)
        w.add_uint32("codec.n_q", m.N_Q)
        w.add_uint32("xy.mel.n_mels", m.MELS)
        w.add_uint32("xy.mel.n_fft", m.MEL_FFT)
        w.add_uint32("xy.mel.hop_length", m.MEL_HOP)
        w.add_uint32("xy.sem_enc.n_layers", m.LAYERS)
        w.add_uint32("xy.sem_enc.n_heads", m.HEADS)
        w.add_uint32("xy.sem_enc_adapter.n_layers", m.ADAPT)
        w.add_uint32("xy.pre_rvq_adapter.n_layers", m.ADAPT)
        w.add_uint32("xy.post_rvq_adapter.n_layers", m.ADAPT)
        w.add_uint32("xy.downsample.avg_pooler", m.AVG)
        w.add_uint32("xy.upsample.stride", m.UP_STRIDE)
        w.add_uint32("xy.vocos.n_blocks", m.VOCOS_BLOCKS)
        w.add_uint32("xy.vocos.head.n_fft", m.VN_FFT)
        w.add_uint32("xy.vocos.head.hop_size", m.VHOP)
        w.add_bool("codec.has_encoder", True)
        w.add_bool("codec.has_decoder", True)
        for name, tensor in ref.t.items():
            w.add_tensor(name, tensor.numpy())
        for qi in range(m.N_Q):
            cb = ref.t[f"xy.q.{qi}.codebook"].numpy()
            w.add_tensor(f"xy.q.{qi}.codebook_sq_norm", (cb ** 2).sum(-1))
        w.write()
        n_codes_valid = (n_valid // 2) // m.AVG
    finally:
        for k, v in saved.items():
            setattr(m, k, v)

    import codec_tpu

    return dict(pcm=pcm, want=want, z=z, cbs=cbs, n_codes_valid=n_codes_valid,
                dec_codes=dec_codes, dec_want=dec_want,
                ours=codec_tpu.load_model(path))


@pytest.mark.slow
def test_fullsize_encode_exact_or_near_tie(full_xy):
    """RVQ codes match the mirror bit-for-bit except frames whose first
    divergent level is a provable f64 near-tie (rebuilding the residual
    through the common prefix, DAC-gate style)."""
    f = full_xy
    got = f["ours"].encode(f["pcm"])
    n_q = f["want"].shape[-1]
    assert got.shape == (f["n_codes_valid"], n_q)
    want = f["want"][: f["n_codes_valid"]]
    mism = got != want
    frames = np.where(mism.any(axis=1))[0]
    assert len(frames) <= max(2, len(want) // 20), \
        f"{len(frames)}/{len(want)} frames diverge — not tie noise"
    for fr in frames:
        fq = int(mism[fr].argmax())
        r = f["z"][int(fr)].clone()
        for li in range(fq):
            r = r - f["cbs"][li][int(want[fr, li])]
        d2 = ((r[None] - f["cbs"][fq]) ** 2).sum(-1)
        c_ref, c_ours = int(want[fr, fq]), int(got[fr, fq])
        margin = float((d2[c_ours] - d2[c_ref]) / d2[c_ref].clamp(min=1e-12))
        assert abs(margin) < 1e-4, \
            f"frame {fr} q{fq}: rel margin {margin:.2e} — a real mismatch"


@pytest.mark.slow
def test_fullsize_decode_corr(full_xy):
    f = full_xy
    got = f["ours"].decode(f["dec_codes"][0].astype(np.int32))
    assert got.shape == f["dec_want"].shape
    corr = float(np.corrcoef(got, f["dec_want"])[0, 1])
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert np.abs(got - f["dec_want"]).max() < 2e-3

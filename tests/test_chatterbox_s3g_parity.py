"""Chatterbox S3Gen parity vs a torch/numpy mirror: flow encoder (ESPnet
rel-pos conformer, with the pad-reshape-slice rel-shift as an independent
formulation), CFM UNet Euler/CFG loop, and the HiFT NSF vocoder with
explicit-loop OLA."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter

MEL = 8
SPK = 12
EH, NH, HD = 32, 2, 16
ENC_L, UP_L = 2, 1
MID, TPB = 2, 1
FF = 64
CFM_FF = FF               # CFM transformer ffn (production: 1024 != FF)
CFM_CH = 24               # base channels
TED = 48                  # time embed dim
IN_CH = 4 * MEL
V = 6561
HIFT_CH = (16, 8, 4, 2)   # conv_pre out, then after each upsample
UPS = (8, 5, 3)
UPK = (16, 11, 7)
SRC_S = (15, 3, 1)
SRC_P = (7, 1, 0)
RBK = (3, 7, 11)
SRC_RBK = (7, 7, 11)
DILS = (1, 3, 5)
NFFT, HOP = 16, 4
NBINS = NFFT // 2 + 1
SR = 24000

N_SPEECH_TOK = 4
N_PROMPT_TOK = 2
MEL_LEN1 = 4


class Mirror:
    def __init__(self, seed=0, fan_scale=False):
        g = torch.Generator().manual_seed(seed)
        self.t = {}

        def P(name, *shape, s=0.2, off=0.0):
            # fan_scale: 1/sqrt(fan_in) keeps production-width stacks O(1)
            # (see the WavTokenizer/xcodec2 full-size gates)
            if fan_scale and len(shape) >= 2 and off == 0.0:
                s = s / math.sqrt(math.prod(shape[1:]))
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        # ---- flow encoder ----
        P("s3g.flow.input_emb.w", V, EH, s=0.3)
        P("s3g.flow.enc.embed.lin.w", EH, EH)
        P("s3g.flow.enc.embed.lin.b", EH)
        P("s3g.flow.enc.embed.ln.w", EH, s=0.1, off=1.0)
        P("s3g.flow.enc.embed.ln.b", EH)
        P("s3g.flow.enc.pre.cv1.w", EH, EH, 4, s=0.1)
        P("s3g.flow.enc.pre.cv1.b", EH)
        P("s3g.flow.enc.pre.cv2.w", EH, EH, 3, s=0.1)
        P("s3g.flow.enc.pre.cv2.b", EH)

        def conformer(base):
            P(base + ".norm_mha.w", EH, s=0.1, off=1.0)
            P(base + ".norm_mha.b", EH)
            P(base + ".norm_ff.w", EH, s=0.1, off=1.0)
            P(base + ".norm_ff.b", EH)
            for n in ("q", "k", "v", "o"):
                P(f"{base}.attn.{n}.w", EH, EH)
                P(f"{base}.attn.{n}.b", EH)
            P(base + ".attn.pos.w", EH, EH)
            P(base + ".attn.pbu", NH, HD)
            P(base + ".attn.pbv", NH, HD)
            P(base + ".ff.w1.w", FF, EH)
            P(base + ".ff.w1.b", FF)
            P(base + ".ff.w2.w", EH, FF)
            P(base + ".ff.w2.b", EH)

        for i in range(ENC_L):
            conformer(f"s3g.flow.enc.blk.{i}")
        P("s3g.flow.enc.up.w", EH, EH, 5, s=0.1)
        P("s3g.flow.enc.up.b", EH)
        P("s3g.flow.enc.up_embed.lin.w", EH, EH)
        P("s3g.flow.enc.up_embed.lin.b", EH)
        P("s3g.flow.enc.up_embed.ln.w", EH, s=0.1, off=1.0)
        P("s3g.flow.enc.up_embed.ln.b", EH)
        for i in range(UP_L):
            conformer(f"s3g.flow.enc.up_blk.{i}")
        P("s3g.flow.enc.after_norm.w", EH, s=0.1, off=1.0)
        P("s3g.flow.enc.after_norm.b", EH)
        P("s3g.flow.proj.w", MEL, EH)
        P("s3g.flow.proj.b", MEL)
        P("s3g.flow.spk_aff.w", MEL, SPK)
        P("s3g.flow.spk_aff.b", MEL)
        P("s3g.cond.embedding", SPK, s=0.5)
        P("s3g.cond.prompt_feat", MEL_LEN1, MEL, s=0.4)

        # ---- CFM ----
        P("s3g.cfm.t.l1.w", TED, IN_CH)
        P("s3g.cfm.t.l1.b", TED)
        P("s3g.cfm.t.l2.w", TED, TED)
        P("s3g.cfm.t.l2.b", TED)

        def causal_block(base, cin, cout):
            P(base + ".cv.w", cout, cin, 3, s=0.1)
            P(base + ".cv.b", cout)
            P(base + ".ln.w", cout, s=0.1, off=1.0)
            P(base + ".ln.b", cout)

        def resnet(base, cin, cout):
            causal_block(base + ".b1", cin, cout)
            causal_block(base + ".b2", cout, cout)
            P(base + ".mlp.w", cout, TED)
            P(base + ".mlp.b", cout)
            P(base + ".res.w", cout, cin, 1)
            P(base + ".res.b", cout)

        def transformer(base, c):
            P(base + ".norm1.w", c, s=0.1, off=1.0)
            P(base + ".norm1.b", c)
            inner = NH * HD
            P(base + ".attn.q.w", inner, c)
            P(base + ".attn.k.w", inner, c)
            P(base + ".attn.v.w", inner, c)
            P(base + ".attn.o.w", c, inner)
            P(base + ".attn.o.b", c)
            P(base + ".norm3.w", c, s=0.1, off=1.0)
            P(base + ".norm3.b", c)
            P(base + ".ff.w1.w", CFM_FF, c)
            P(base + ".ff.w1.b", CFM_FF)
            P(base + ".ff.w2.w", c, CFM_FF)
            P(base + ".ff.w2.b", c)

        def stage(base, cin, cout):
            resnet(base + ".r", cin, cout)
            for ti in range(TPB):
                transformer(f"{base}.t.{ti}", cout)

        stage("s3g.cfm.dn.0", IN_CH, CFM_CH)
        P("s3g.cfm.dn.0.x.w", CFM_CH, CFM_CH, 3, s=0.1)
        P("s3g.cfm.dn.0.x.b", CFM_CH)
        for i in range(MID):
            stage(f"s3g.cfm.md.{i}", CFM_CH, CFM_CH)
        stage("s3g.cfm.up.0", 2 * CFM_CH, CFM_CH)
        P("s3g.cfm.up.0.x.w", CFM_CH, CFM_CH, 3, s=0.1)
        P("s3g.cfm.up.0.x.b", CFM_CH)
        causal_block("s3g.cfm.final", CFM_CH, CFM_CH)
        self.t["s3g.cfm.final.cv.w"] = self.t.pop("s3g.cfm.final.cv.w")
        P("s3g.cfm.proj.w", MEL, CFM_CH, 1)
        P("s3g.cfm.proj.b", MEL)

        # ---- HiFT ----
        for i in range(5):
            cin = MEL if i == 0 else MEL
            P(f"s3g.hift.f0.cn.{i}.w", MEL, cin, 3, s=0.15)
            P(f"s3g.hift.f0.cn.{i}.b", MEL)
        P("s3g.hift.f0.cls.w", 1, MEL)
        P("s3g.hift.f0.cls.b", 1)
        P("s3g.hift.src.lin.w", 1, 9)
        P("s3g.hift.src.lin.b", 1)
        P("s3g.hift.conv_pre.w", HIFT_CH[0], MEL, 7, s=0.15)
        P("s3g.hift.conv_pre.b", HIFT_CH[0])
        for i in range(3):
            P(f"s3g.hift.up.{i}.w", HIFT_CH[i], HIFT_CH[i + 1], UPK[i], s=0.15)
            P(f"s3g.hift.up.{i}.b", HIFT_CH[i + 1])
            # src_dn takes the 18-dim source STFT
            ksd = 2 * SRC_S[i] if SRC_S[i] > 1 else 1
            P(f"s3g.hift.src_dn.{i}.w", HIFT_CH[i + 1], NFFT + 2, ksd, s=0.15)
            P(f"s3g.hift.src_dn.{i}.b", HIFT_CH[i + 1])

        def resblock(base, ch):
            for j in range(3):
                P(f"{base}.a1.{j}", ch, s=0.1, off=1.0)
                P(f"{base}.a2.{j}", ch, s=0.1, off=1.0)
                P(f"{base}.cv1.{j}.w", ch, ch, 0, s=0.15)  # kernel set later
                P(f"{base}.cv2.{j}.w", ch, ch, 0, s=0.15)
                P(f"{base}.cv1.{j}.b", ch)
                P(f"{base}.cv2.{j}.b", ch)

        g2 = torch.Generator().manual_seed(99)
        for i in range(3):
            ch = HIFT_CH[i + 1]
            for j in range(3):
                k = SRC_RBK[i]
                self.t[f"s3g.hift.src_rb.{i}.a1.{j}"] = torch.randn(ch, generator=g2) * 0.1 + 1.0
                self.t[f"s3g.hift.src_rb.{i}.a2.{j}"] = torch.randn(ch, generator=g2) * 0.1 + 1.0
                self.t[f"s3g.hift.src_rb.{i}.cv1.{j}.w"] = torch.randn(ch, ch, k, generator=g2) * 0.1
                self.t[f"s3g.hift.src_rb.{i}.cv1.{j}.b"] = torch.randn(ch, generator=g2) * 0.1
                self.t[f"s3g.hift.src_rb.{i}.cv2.{j}.w"] = torch.randn(ch, ch, k, generator=g2) * 0.1
                self.t[f"s3g.hift.src_rb.{i}.cv2.{j}.b"] = torch.randn(ch, generator=g2) * 0.1
            for j in range(3):
                k = RBK[j]
                base = f"s3g.hift.rb.{i * 3 + j}"
                self.t[f"{base}.a1.0"] = torch.randn(ch, generator=g2) * 0.1 + 1.0
                for jj in range(3):
                    self.t[f"{base}.a1.{jj}"] = torch.randn(ch, generator=g2) * 0.1 + 1.0
                    self.t[f"{base}.a2.{jj}"] = torch.randn(ch, generator=g2) * 0.1 + 1.0
                    self.t[f"{base}.cv1.{jj}.w"] = torch.randn(ch, ch, k, generator=g2) * 0.1
                    self.t[f"{base}.cv1.{jj}.b"] = torch.randn(ch, generator=g2) * 0.1
                    self.t[f"{base}.cv2.{jj}.w"] = torch.randn(ch, ch, k, generator=g2) * 0.1
                    self.t[f"{base}.cv2.{jj}.b"] = torch.randn(ch, generator=g2) * 0.1
        P("s3g.hift.conv_post.w", NFFT + 2, HIFT_CH[3], 7, s=0.1)
        P("s3g.hift.conv_post.b", NFFT + 2)
        # drop the placeholder zero-kernel resblock tensors
        self.t = {k: v for k, v in self.t.items() if 0 not in v.shape}

    # ------------- flow encoder mirror -------------

    def _rel_pos_emb(self, t):
        half = EH // 2
        pos = (t - 1) - torch.arange(2 * t - 1, dtype=torch.float32)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-2.0 * math.log(10000.0) / EH))
        ang = pos[:, None] * freqs[None]
        pe = torch.zeros(2 * t - 1, EH)
        pe[:, 0::2] = torch.sin(ang)
        pe[:, 1::2] = torch.cos(ang)
        return pe

    def _rel_shift(self, x):
        # x: [H, T, 2T-1] espnet pad-reshape-slice
        h, t, _ = x.shape
        zp = torch.zeros(h, t, 1)
        xp = torch.cat([zp, x], dim=-1)                  # [H, T, 2T]
        xp = xp.view(h, 2 * t, t)
        xp = xp[:, 1:].reshape(h, t, 2 * t - 1)
        return xp[:, :, :t]

    def _conformer(self, x, base, pos):
        t = self.t
        T = x.shape[1]
        h = F.layer_norm(x, (EH,), t[base + ".norm_mha.w"],
                         t[base + ".norm_mha.b"], eps=1e-12)
        q = (h @ t[base + ".attn.q.w"].T + t[base + ".attn.q.b"]).view(1, T, NH, HD).transpose(1, 2)
        k = (h @ t[base + ".attn.k.w"].T + t[base + ".attn.k.b"]).view(1, T, NH, HD).transpose(1, 2)
        v = (h @ t[base + ".attn.v.w"].T + t[base + ".attn.v.b"]).view(1, T, NH, HD).transpose(1, 2)
        p = (pos @ t[base + ".attn.pos.w"].T).view(2 * T - 1, NH, HD).permute(1, 0, 2)
        q_u = q[0] + t[base + ".attn.pbu"][:, None, :]
        q_v = q[0] + t[base + ".attn.pbv"][:, None, :]
        ac = q_u @ k[0].transpose(-1, -2)
        bd = self._rel_shift(q_v @ p.transpose(-1, -2))
        w = torch.softmax((ac + bd) / math.sqrt(HD), dim=-1)
        a = (w @ v[0]).transpose(0, 1).reshape(T, EH)
        x = x + (a @ t[base + ".attn.o.w"].T + t[base + ".attn.o.b"])
        f = F.layer_norm(x, (EH,), t[base + ".norm_ff.w"],
                         t[base + ".norm_ff.b"], eps=1e-12)
        f = F.silu(f @ t[base + ".ff.w1.w"].T + t[base + ".ff.w1.b"])
        return x + (f @ t[base + ".ff.w2.w"].T + t[base + ".ff.w2.b"])

    def flow_encode(self, tokens):
        t = self.t
        T = len(tokens)
        x = t["s3g.flow.input_emb.w"][tokens][None]       # [1, T, EH]
        x = x @ t["s3g.flow.enc.embed.lin.w"].T + t["s3g.flow.enc.embed.lin.b"]
        x = F.layer_norm(x, (EH,), t["s3g.flow.enc.embed.ln.w"],
                         t["s3g.flow.enc.embed.ln.b"], eps=1e-5)
        x = x * math.sqrt(EH)
        h = F.pad(x.transpose(1, 2), (0, 3))
        h = F.conv1d(h, t["s3g.flow.enc.pre.cv1.w"], t["s3g.flow.enc.pre.cv1.b"])
        h = F.leaky_relu(h, 0.01)
        h = F.pad(h, (2, 0))
        h = F.conv1d(h, t["s3g.flow.enc.pre.cv2.w"], t["s3g.flow.enc.pre.cv2.b"])
        x = x + h.transpose(1, 2)
        pos = self._rel_pos_emb(T)
        for i in range(ENC_L):
            x = self._conformer(x, f"s3g.flow.enc.blk.{i}", pos)
        x = x.repeat_interleave(2, dim=1)
        x = F.pad(x.transpose(1, 2), (4, 0))
        x = F.conv1d(x, t["s3g.flow.enc.up.w"], t["s3g.flow.enc.up.b"]).transpose(1, 2)
        x = x @ t["s3g.flow.enc.up_embed.lin.w"].T + t["s3g.flow.enc.up_embed.lin.b"]
        x = F.layer_norm(x, (EH,), t["s3g.flow.enc.up_embed.ln.w"],
                         t["s3g.flow.enc.up_embed.ln.b"], eps=1e-5)
        x = x * math.sqrt(EH)
        pos2 = self._rel_pos_emb(2 * T)
        for i in range(UP_L):
            x = self._conformer(x, f"s3g.flow.enc.up_blk.{i}", pos2)
        x = F.layer_norm(x, (EH,), t["s3g.flow.enc.after_norm.w"],
                         t["s3g.flow.enc.after_norm.b"], eps=1e-5)
        return x @ t["s3g.flow.proj.w"].T + t["s3g.flow.proj.b"]

    # ------------- CFM mirror -------------

    def _causal_block(self, x, base):
        t = self.t
        h = F.pad(x.transpose(1, 2), (2, 0))
        h = F.conv1d(h, t[base + ".cv.w"], t[base + ".cv.b"]).transpose(1, 2)
        c = h.shape[-1]
        h = F.layer_norm(h, (c,), t[base + ".ln.w"], t[base + ".ln.b"], eps=1e-5)
        return h * torch.tanh(F.softplus(h))

    def _resnet(self, x, temb, base):
        t = self.t
        h = self._causal_block(x, base + ".b1")
        tm = temb * torch.tanh(F.softplus(temb))
        tm = tm @ t[base + ".mlp.w"].T + t[base + ".mlp.b"]
        h = h + tm[None, None, :]
        h = self._causal_block(h, base + ".b2")
        res = F.conv1d(x.transpose(1, 2), t[base + ".res.w"],
                       t[base + ".res.b"]).transpose(1, 2)
        return h + res

    def _btransformer(self, x, base):
        t = self.t
        T, c = x.shape[1], x.shape[2]
        h = F.layer_norm(x, (c,), t[base + ".norm1.w"], t[base + ".norm1.b"],
                         eps=1e-5)
        inner = NH * HD
        q = (h @ t[base + ".attn.q.w"].T).view(1, T, NH, HD).transpose(1, 2)
        k = (h @ t[base + ".attn.k.w"].T).view(1, T, NH, HD).transpose(1, 2)
        v = (h @ t[base + ".attn.v.w"].T).view(1, T, NH, HD).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(1, T, inner)
        x = x + (a @ t[base + ".attn.o.w"].T + t[base + ".attn.o.b"])
        f = F.layer_norm(x, (c,), t[base + ".norm3.w"], t[base + ".norm3.b"],
                         eps=1e-5)
        f = F.gelu(f @ t[base + ".ff.w1.w"].T + t[base + ".ff.w1.b"])
        return x + (f @ t[base + ".ff.w2.w"].T + t[base + ".ff.w2.b"])

    def _stage(self, x, temb, base):
        x = self._resnet(x, temb, base + ".r")
        for ti in range(TPB):
            x = self._btransformer(x, f"{base}.t.{ti}")
        return x

    def _time_emb(self, t_v):
        t = self.t
        half = IN_CH // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-math.log(10000.0) / (half - 1)))
        e = freqs * t_v * 1000.0
        te = torch.cat([torch.sin(e), torch.cos(e)])
        te = te @ t["s3g.cfm.t.l1.w"].T + t["s3g.cfm.t.l1.b"]
        te = F.silu(te)
        return te @ t["s3g.cfm.t.l2.w"].T + t["s3g.cfm.t.l2.b"]

    def estimator(self, x, mu, spks, cond, temb):
        t = self.t
        T = x.shape[1]
        h = torch.cat([x, mu, spks[None, None, :].expand(1, T, MEL), cond], -1)
        h = self._stage(h, temb, "s3g.cfm.dn.0")
        skip = h
        h = F.pad(h.transpose(1, 2), (2, 0))
        h = F.conv1d(h, t["s3g.cfm.dn.0.x.w"], t["s3g.cfm.dn.0.x.b"]).transpose(1, 2)
        for i in range(MID):
            h = self._stage(h, temb, f"s3g.cfm.md.{i}")
        h = torch.cat([h, skip], -1)
        h = self._stage(h, temb, "s3g.cfm.up.0")
        h = F.pad(h.transpose(1, 2), (2, 0))
        h = F.conv1d(h, t["s3g.cfm.up.0.x.w"], t["s3g.cfm.up.0.x.b"]).transpose(1, 2)
        h = self._causal_block(h, "s3g.cfm.final")
        return F.conv1d(h.transpose(1, 2), t["s3g.cfm.proj.w"],
                        t["s3g.cfm.proj.b"]).transpose(1, 2)

    def cfm(self, mu, noise_z):
        t = self.t
        spk = t["s3g.cond.embedding"]
        spk = spk / torch.sqrt((spk * spk).sum() + 1e-12)
        spks = spk @ t["s3g.flow.spk_aff.w"].T + t["s3g.flow.spk_aff.b"]
        T_total = mu.shape[1]
        cond = torch.cat([t["s3g.cond.prompt_feat"][None],
                          torch.zeros(1, T_total - MEL_LEN1, MEL)], dim=1)
        x = noise_z
        for i in range(10):
            t_v = 1.0 - math.cos(i / 10 * 0.5 * math.pi)
            r_v = 1.0 - math.cos((i + 1) / 10 * 0.5 * math.pi)
            temb = self._time_emb(t_v)
            dc = self.estimator(x, mu, spks, cond, temb)
            du = self.estimator(x, mu * 0, spks * 0, cond * 0, temb)
            x = x + (r_v - t_v) * (1.7 * dc - 0.7 * du)
        return x[:, MEL_LEN1:]

    # ------------- HiFT mirror -------------

    def _snake_rb(self, x, base, kernel):
        t = self.t
        for j, d in enumerate(DILS):
            a1 = t[f"{base}.a1.{j}"].view(1, -1, 1)
            a2 = t[f"{base}.a2.{j}"].view(1, -1, 1)
            h = x + torch.sin(a1 * x) ** 2 / (a1 + 1e-9)
            h = F.conv1d(h, t[f"{base}.cv1.{j}.w"], t[f"{base}.cv1.{j}.b"],
                         dilation=d, padding=(kernel * d - d) // 2)
            h = h + torch.sin(a2 * h) ** 2 / (a2 + 1e-9)
            h = F.conv1d(h, t[f"{base}.cv2.{j}.w"], t[f"{base}.cv2.{j}.b"],
                         padding=(kernel - 1) // 2)
            x = x + h
        return x

    def hift(self, mel, phase, nsf_noise):
        t = self.t
        x = mel.transpose(1, 2)                           # [1, MEL, T]
        for i in range(5):
            x = F.conv1d(x, t[f"s3g.hift.f0.cn.{i}.w"],
                         t[f"s3g.hift.f0.cn.{i}.b"], padding=1)
            x = F.elu(x)
        f0 = (x.transpose(1, 2) @ t["s3g.hift.f0.cls.w"].T +
              t["s3g.hift.f0.cls.b"]).abs()[0, :, 0]      # [T]
        T_pcm = len(f0) * 480
        f0_pcm = f0.repeat_interleave(480)
        scales = torch.arange(1, 10, dtype=torch.float32) / SR
        f_harm = f0_pcm[:, None] * scales[None]
        theta = 2 * math.pi * torch.cumsum(f_harm, dim=0)
        sine = 0.1 * torch.sin(theta + phase[None, :])
        uv = (f0_pcm[:, None] > 10.0).float()
        namp = uv * (0.003 - 0.1 / 3) + 0.1 / 3
        waves = sine * uv + namp * nsf_noise
        merge = torch.tanh(waves @ t["s3g.hift.src.lin.w"].T +
                           t["s3g.hift.src.lin.b"])[:, 0]
        win = 0.5 - 0.5 * torch.cos(2 * math.pi * torch.arange(NFFT) / NFFT)
        sp = F.pad(merge, (NFFT // 2, NFFT // 2))
        n_frames = T_pcm // HOP + 1
        frames = torch.stack([sp[i * HOP:i * HOP + NFFT] * win
                              for i in range(n_frames)])
        spec = torch.fft.rfft(frames, dim=-1)
        s_stft = torch.cat([spec.real, spec.imag], dim=-1).T[None]  # [1,18,Ts]

        x = F.conv1d(mel.transpose(1, 2), t["s3g.hift.conv_pre.w"],
                     t["s3g.hift.conv_pre.b"], padding=3)
        for i in range(3):
            x = F.leaky_relu(x, 0.1)
            x = F.conv_transpose1d(x, t[f"s3g.hift.up.{i}.w"],
                                   t[f"s3g.hift.up.{i}.b"], stride=UPS[i],
                                   padding=(UPK[i] - UPS[i]) // 2)
            if i == 2:
                x = torch.cat([x[:, :, 1:2], x], dim=2)
            si = F.conv1d(s_stft, t[f"s3g.hift.src_dn.{i}.w"],
                          t[f"s3g.hift.src_dn.{i}.b"], stride=SRC_S[i],
                          padding=SRC_P[i])
            si = self._snake_rb(si, f"s3g.hift.src_rb.{i}", SRC_RBK[i])
            common = min(si.shape[2], x.shape[2])
            x = x[:, :, :common] + si[:, :, :common]
            acc = None
            for j in range(3):
                br = self._snake_rb(x, f"s3g.hift.rb.{i * 3 + j}", RBK[j])
                acc = br if acc is None else acc + br
            x = acc / 3.0
        x = F.leaky_relu(x, 0.01)
        head = F.conv1d(x, t["s3g.hift.conv_post.w"], t["s3g.hift.conv_post.b"],
                        padding=3)                        # [1, 18, T_head]
        head = head[0].T                                  # [T_head, 18]
        log_mag, ph = head[:, :NBINS], torch.sin(head[:, NBINS:])
        mag = torch.exp(torch.clamp(log_mag, max=1e2))
        spec = torch.complex(mag * torch.cos(ph), mag * torch.sin(ph))
        fr = torch.fft.irfft(spec, NFFT, dim=-1) * (win * win)[None]
        T_head = fr.shape[0]
        out_len = (T_head - 1) * HOP + NFFT
        y = torch.zeros(out_len)
        env = torch.zeros(out_len)
        w2 = win * win
        for i in range(T_head):
            y[i * HOP:i * HOP + NFFT] += fr[i]
            env[i * HOP:i * HOP + NFFT] += w2
        sig = y / env.clamp(min=1e-11)
        pcm = sig[NFFT // 2:-(NFFT // 2)]
        return torch.clamp(pcm, -0.99, 0.99)

    def decode(self, speech_tokens, prompt_tokens, noise_z, phase, nsf_noise):
        with torch.no_grad():
            toks = torch.tensor(list(prompt_tokens) + list(speech_tokens))
            mu = self.flow_encode(toks)
            mel = self.cfm(mu, noise_z)
            return self.hift(mel, phase, nsf_noise).numpy()


@pytest.fixture(scope="module")
def tiny_s3g(tmp_path_factory):
    ref = Mirror()
    path = tmp_path_factory.mktemp("s3g") / "s3g.gguf"
    w = GGUFWriter(path, "chatterbox_s3g")
    w.add_uint32("codec.sample_rate", SR)
    w.add_uint32("codec.hop_size", 960)
    w.add_uint32("codec.n_q", 1)
    w.add_uint32("codec.codebook_size", V)
    w.add_bool("codec.has_encoder", False)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("chatterbox_s3g.has_builtin_conditioning", True)
    w.add_uint32("chatterbox_s3g.cond.prompt_token_len", N_PROMPT_TOK)
    w.add_uint32("chatterbox_s3g.cond.prompt_feat_frames", MEL_LEN1)
    w.add_uint32("chatterbox_s3g.cond.prompt_feat_dim", MEL)
    w.add_uint32("chatterbox_s3g.cond.embedding_dim", SPK)
    w.add_array("chatterbox_s3g.cond.prompt_token", [11, 222])
    w.add_uint32("chatterbox_s3g.mel_dim", MEL)
    w.add_uint32("chatterbox_s3g.spk_dim", SPK)
    w.add_uint32("chatterbox_s3g.enc_hidden", EH)
    w.add_uint32("chatterbox_s3g.enc_layers", ENC_L)
    w.add_uint32("chatterbox_s3g.enc_up_layers", UP_L)
    w.add_uint32("chatterbox_s3g.attn_heads", NH)
    w.add_uint32("chatterbox_s3g.attn_head_dim", HD)
    w.add_uint32("chatterbox_s3g.cfm_mid_blocks", MID)
    w.add_uint32("chatterbox_s3g.cfm_transformers", TPB)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()

    import codec_tpu

    return ref, codec_tpu.load_model(path)


def test_config(tiny_s3g):
    _, ours = tiny_s3g
    assert ours.arch == "chatterbox_s3g"
    assert not ours.has_encoder and ours.has_decoder
    assert ours.prompt_token.tolist() == [11, 222]


def test_decode_parity(tiny_s3g):
    ref, ours = tiny_s3g
    rng = np.random.default_rng(2)
    speech = rng.integers(0, V, N_SPEECH_TOK)

    got = ours.decode(speech.reshape(-1, 1).astype(np.int32))

    # replay the model's noise draws (np.default_rng(0), same shapes/order)
    t_tok = N_PROMPT_TOK + N_SPEECH_TOK
    t_total = 2 * t_tok
    t_pcm = (t_total - MEL_LEN1) * 480
    nrng = np.random.default_rng(0)
    noise_z = torch.from_numpy(
        nrng.standard_normal((1, t_total, MEL)).astype(np.float32))
    phase = torch.from_numpy(np.concatenate(
        [[0.0], nrng.uniform(-np.pi, np.pi, 8)]).astype(np.float32))
    nsf_noise = torch.from_numpy(
        nrng.standard_normal((1, t_pcm, 9)).astype(np.float32))[0]
    want = ref.decode(speech, [11, 222], noise_z, phase, nsf_noise)

    # apply the same trim-fade to the mirror
    n_trim = SR // 50
    want = want.copy()
    want[:n_trim] = 0.0
    i = np.arange(min(n_trim, max(0, len(want) - n_trim)))
    want[n_trim:n_trim + len(i)] *= 0.5 * (np.cos(np.pi * (1 - i / n_trim)) + 1)

    assert got.shape == want.shape == (t_pcm,)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.999, f"corr={corr}"
    assert np.abs(got - want).max() < 5e-3, np.abs(got - want).max()


# ---------------------------------------------------------------------------
# Full-production-shape gate (VERDICT r4 #6). Dims are the constants the
# reference hard-codes for CosyVoice2-style S3Gen (reference
# src/models/chatterbox_s3g.cpp:23-72 + scripts/converters/chatterbox.py:
# 182-185): 80 mel, spk 192, flow conformer 512 x 6 + 4 upsampled layers
# (8 heads x 64, ff 2048), CFM UNet channels 256 / time-embed 1024 /
# 12 mid blocks x 4 transformers (inner 512, ff 1024), vocab 6561, HiFT
# 512->256->128->64 with ups (8,5,3) and the production n_fft 16 / hop 4
# source-filter iSTFT head.

FULL_S3G = dict(MEL=80, SPK=192, EH=512, NH=8, HD=64, ENC_L=6, UP_L=4,
                MID=12, TPB=4, FF=2048, CFM_FF=1024, CFM_CH=256, TED=1024,
                IN_CH=320, HIFT_CH=(512, 256, 128, 64))
FULL_SPEECH_TOK = 4


@pytest.fixture(scope="module")
def full_s3g(tmp_path_factory):
    """Mirror built + reference decode computed under production globals
    (the mirror reads module globals at call time), then restored."""
    import sys
    m = sys.modules[__name__]
    saved = {k: getattr(m, k) for k in FULL_S3G}
    for k, v in FULL_S3G.items():
        setattr(m, k, v)
    try:
        ref = Mirror(seed=3, fan_scale=True)
        # The HiFT resblock conv weights are built directly (generator
        # g2), bypassing P's fan scaling — at ch 256/512 with k 7-11 each
        # conv amplifies ~4x, compounding to ~1e10 through 9 resblocks
        # and overflowing exp() in the iSTFT head. Normalize them to
        # fan-scale, and bound snake alphas away from 0 like a trained
        # checkpoint keeps them.
        for k_, v_ in ref.t.items():
            if (".cv1." in k_ or ".cv2." in k_) and k_.endswith(".w"):
                v_ /= math.sqrt(v_.shape[1] * v_.shape[2])
            elif ".a1." in k_ or ".a2." in k_:
                v_.clamp_(min=0.5)
        rng = np.random.default_rng(2)
        speech = rng.integers(0, V, FULL_SPEECH_TOK)
        t_tok = N_PROMPT_TOK + FULL_SPEECH_TOK
        t_total = 2 * t_tok
        t_pcm = (t_total - MEL_LEN1) * 480
        nrng = np.random.default_rng(0)
        noise_z = torch.from_numpy(
            nrng.standard_normal((1, t_total, m.MEL)).astype(np.float32))
        phase = torch.from_numpy(np.concatenate(
            [[0.0], nrng.uniform(-np.pi, np.pi, 8)]).astype(np.float32))
        nsf_noise = torch.from_numpy(
            nrng.standard_normal((1, t_pcm, 9)).astype(np.float32))[0]
        want = ref.decode(speech, [11, 222], noise_z, phase, nsf_noise)

        path = tmp_path_factory.mktemp("s3g_full") / "s3g_full.gguf"
        w = GGUFWriter(path, "chatterbox_s3g")
        w.add_uint32("codec.sample_rate", SR)
        w.add_uint32("codec.hop_size", 960)
        w.add_uint32("codec.n_q", 1)
        w.add_uint32("codec.codebook_size", V)
        w.add_bool("codec.has_encoder", False)
        w.add_bool("codec.has_decoder", True)
        w.add_bool("chatterbox_s3g.has_builtin_conditioning", True)
        w.add_uint32("chatterbox_s3g.cond.prompt_token_len", N_PROMPT_TOK)
        w.add_uint32("chatterbox_s3g.cond.prompt_feat_frames", MEL_LEN1)
        w.add_uint32("chatterbox_s3g.cond.prompt_feat_dim", m.MEL)
        w.add_uint32("chatterbox_s3g.cond.embedding_dim", m.SPK)
        w.add_array("chatterbox_s3g.cond.prompt_token", [11, 222])
        w.add_uint32("chatterbox_s3g.mel_dim", m.MEL)
        w.add_uint32("chatterbox_s3g.spk_dim", m.SPK)
        w.add_uint32("chatterbox_s3g.enc_hidden", m.EH)
        w.add_uint32("chatterbox_s3g.enc_layers", m.ENC_L)
        w.add_uint32("chatterbox_s3g.enc_up_layers", m.UP_L)
        w.add_uint32("chatterbox_s3g.attn_heads", m.NH)
        w.add_uint32("chatterbox_s3g.attn_head_dim", m.HD)
        w.add_uint32("chatterbox_s3g.cfm_mid_blocks", m.MID)
        w.add_uint32("chatterbox_s3g.cfm_transformers", m.TPB)
        for name, tensor in ref.t.items():
            w.add_tensor(name, tensor.numpy())
        w.write()
    finally:
        for k, v in saved.items():
            setattr(m, k, v)

    import codec_tpu

    return speech, want, t_pcm, codec_tpu.load_model(path)


@pytest.mark.slow
def test_fullsize_decode_corr(full_s3g):
    speech, want, t_pcm, ours = full_s3g
    got = ours.decode(speech.reshape(-1, 1).astype(np.int32))

    n_trim = SR // 50
    want = want.copy()
    want[:n_trim] = 0.0
    i = np.arange(min(n_trim, max(0, len(want) - n_trim)))
    want[n_trim:n_trim + len(i)] *= 0.5 * (np.cos(np.pi * (1 - i / n_trim)) + 1)

    assert got.shape == want.shape == (t_pcm,)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.999, f"full-size decode corr={corr}"
    assert np.abs(got - want).max() < 5e-3, np.abs(got - want).max()

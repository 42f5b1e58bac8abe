"""continuous_latent_cfm parity vs a torch mirror: text_prefill → primed
step → free-running steps with deterministic noise; teacher-forcing hook."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm import create_lm
from codec_tpu.lm.continuous_cfm import sway_schedule, sinusoidal

HB, HV, HE, HD = 16, 24, 16, 16     # barbet / vox / enc / dit hidden
D, P = 4, 2                          # latent dim, patch size
NH, NKV, HDIM = 2, 1, 8
NL_ENC = NL_DIT = NL_RALM = 1
FSQ = 9
EPS = 1e-5


class TorchCFM:
    def __init__(self):
        g = torch.Generator().manual_seed(0)
        self.t = {}

        def PT(name, *shape, s=0.3, off=0.0):
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        def lin(p, out, inp, bias=True):
            PT(p + ".w", out, inp)
            if bias:
                PT(p + ".b", out)

        PT("lm.tslm_adapter.norm.w", HB, s=0.2, off=1.0)
        lin("lm.tslm_adapter.proj", HV, HB)
        PT("lm.tslm_adapter.blk0.ln.w", HV, s=0.2, off=1.0)
        PT("lm.tslm_adapter.blk0.gate.w", 2 * HV, HV)
        PT("lm.tslm_adapter.blk0.up.w", 2 * HV, HV)
        PT("lm.tslm_adapter.blk0.down.w", HV, 2 * HV)
        lin("lm.fsq.in_proj", 8, HV)
        lin("lm.fsq.out_proj", HV, 8)
        lin("lm.proj.fusion_concat", HV, 2 * HV)
        lin("lm.proj.lm_to_dit", HD, HV)
        lin("lm.proj.res_to_dit", HD, HV)
        lin("lm.proj.enc_to_tslm", HB, HE)
        lin("lm.proj.enc_to_lm", HV, HE)
        lin("lm.stop.proj", HV, HV)
        PT("lm.stop.head.w", 2, HV)
        PT("lm.ralm.norm.w", HV, s=0.2, off=1.0)
        PT("lm.locdit.norm.w", HD, s=0.2, off=1.0)
        lin("lm.locdit.in_proj", HD, D)
        lin("lm.locdit.cond_proj", HD, D)
        lin("lm.locdit.out_proj", D, HD)
        lin("lm.locenc.in_proj", HE, D)
        PT("lm.locenc.special_token", HE)
        PT("lm.locenc.norm.w", HE, s=0.2, off=1.0)
        PT("lm.rope.cos", 64, HDIM, s=1.0)
        PT("lm.rope.sin", 64, HDIM, s=1.0)
        for mlp in ("time_mlp", "dtime_mlp"):
            lin(f"lm.locdit.{mlp}.l1", HD, HD)
            lin(f"lm.locdit.{mlp}.l2", HD, HD)

        def block(prefix, hidden, ffn):
            PT(prefix + ".ln1.w", hidden, s=0.2, off=1.0)
            PT(prefix + ".ln2.w", hidden, s=0.2, off=1.0)
            PT(prefix + ".attn_q.w", NH * HDIM, hidden)
            PT(prefix + ".attn_k.w", NKV * HDIM, hidden)
            PT(prefix + ".attn_v.w", NKV * HDIM, hidden)
            PT(prefix + ".attn_o.w", hidden, NH * HDIM)
            PT(prefix + ".gate.w", ffn, hidden)
            PT(prefix + ".up.w", ffn, hidden)
            PT(prefix + ".down.w", hidden, ffn)

        for i in range(NL_RALM):
            block(f"lm.ralm.layers.{i}", HV, 2 * HV)
        for i in range(NL_DIT):
            block(f"lm.locdit.layers.{i}", HD, 2 * HD)
        for i in range(NL_ENC):
            block(f"lm.locenc.layers.{i}", HE, 2 * HE)

    # ---- torch forward ---------------------------------------------------
    def rms(self, x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + EPS) * w

    def lin(self, p, x):
        y = x @ self.t[p + ".w"].T
        if p + ".b" in self.t:
            y = y + self.t[p + ".b"]
        return y

    def tslm(self, h):
        a = self.lin("lm.tslm_adapter.proj", self.rms(h, self.t["lm.tslm_adapter.norm.w"]))
        bn = self.rms(a, self.t["lm.tslm_adapter.blk0.ln.w"])
        m = F.silu(bn @ self.t["lm.tslm_adapter.blk0.gate.w"].T) * \
            (bn @ self.t["lm.tslm_adapter.blk0.up.w"].T)
        return a + m @ self.t["lm.tslm_adapter.blk0.down.w"].T

    def fsq(self, a):
        q = torch.tanh(self.lin("lm.fsq.in_proj", a))
        q = torch.round(q * FSQ) / FSQ
        return self.lin("lm.fsq.out_proj", q)

    def block(self, x, prefix, causal, use_rope):
        t = self.t
        T = x.shape[0]
        h = self.rms(x, t[prefix + ".ln1.w"])
        q = (h @ t[prefix + ".attn_q.w"].T).view(T, NH, HDIM).transpose(0, 1)
        k = (h @ t[prefix + ".attn_k.w"].T).view(T, NKV, HDIM).transpose(0, 1)
        v = (h @ t[prefix + ".attn_v.w"].T).view(T, NKV, HDIM).transpose(0, 1)
        if use_rope:
            cos = t["lm.rope.cos"][:T][None]
            sin = t["lm.rope.sin"][:T][None]

            def rot(z):
                z1, z2 = z[..., : HDIM // 2], z[..., HDIM // 2:]
                zr = torch.cat([-z2, z1], -1)
                return z * cos + zr * sin
            q, k = rot(q), rot(k)
        k = k.repeat_interleave(NH // NKV, 0)
        v = v.repeat_interleave(NH // NKV, 0)
        logits = q @ k.transpose(-1, -2) / (HDIM ** 0.5)
        if causal:
            cm = torch.where(torch.arange(T)[None, :] <= torch.arange(T)[:, None],
                             0.0, float("-inf"))
            logits = logits + cm
        ctx = (torch.softmax(logits, -1) @ v).transpose(0, 1).reshape(T, -1)
        x = x + ctx @ t[prefix + ".attn_o.w"].T
        h = self.rms(x, t[prefix + ".ln2.w"])
        m = F.silu(h @ t[prefix + ".gate.w"].T) * (h @ t[prefix + ".up.w"].T)
        return x + m @ t[prefix + ".down.w"].T

    def locdit(self, x_h, cond_h, mu, t_h):
        seq = torch.cat([mu, t_h[None], cond_h, x_h], 0)
        for i in range(NL_DIT):
            seq = self.block(seq, f"lm.locdit.layers.{i}", False, True)
        seq = self.rms(seq, self.t["lm.locdit.norm.w"])
        xt = seq[2 + 1 + P: 2 + 1 + 2 * P]
        return self.lin("lm.locdit.out_proj", xt)

    def locenc(self, patch):
        le = self.lin("lm.locenc.in_proj", patch)
        le = torch.cat([self.t["lm.locenc.special_token"][None], le], 0)
        for i in range(NL_ENC):
            le = self.block(le, f"lm.locenc.layers.{i}", False, True)
        le = self.rms(le, self.t["lm.locenc.norm.w"])
        return (self.lin("lm.proj.enc_to_tslm", le[0]),
                self.lin("lm.proj.enc_to_lm", le[0]))

    def time_mlp(self, name, s_emb):
        h = F.silu(self.lin(f"lm.locdit.{name}.l1", s_emb))
        return self.lin(f"lm.locdit.{name}.l2", h)

    def generate(self, prefix_hiddens, step_hiddens, noises, cfg=2.0, n_t=6):
        """Full reference loop: prefill + primed step + free steps."""
        # prefill
        lm_h = torch.stack([self.tslm(h) for h in prefix_hiddens])
        fus = torch.cat([lm_h, torch.zeros_like(lm_h)], -1)
        x = self.lin("lm.proj.fusion_concat", fus)
        ralm_seq = x
        for i in range(NL_RALM):
            ralm_seq = self.block(ralm_seq, f"lm.ralm.layers.{i}", True, False)
        res = self.rms(ralm_seq, self.t["lm.ralm.norm.w"])
        prefill_lm, prefill_res = lm_h[-1], res[-1]

        t_real, dts = sway_schedule(n_t)
        tsin = torch.tensor(np.stack([sinusoidal(t, HD) for t in t_real]))
        dtsin = torch.tensor(sinusoidal(0.0, HD))
        dt_emb = self.time_mlp("dtime_mlp", dtsin)

        ralm_inputs = list(x)           # accumulated RALM inputs (full recompute)
        prev_patch = torch.zeros(P, D)
        prev_fb_lm = torch.zeros(HV)
        patches, stops = [], []
        for idx, noise in enumerate(noises):
            if idx == 0:
                lm_hidden, residual_hidden = prefill_lm, prefill_res
            else:
                a = self.tslm(step_hiddens[idx - 1])
                lm_hidden = self.fsq(a)
                fus1 = torch.cat([lm_hidden, prev_fb_lm])
                new_in = self.lin("lm.proj.fusion_concat", fus1)
                ralm_inputs.append(new_in)
                seq = torch.stack(ralm_inputs)
                for i in range(NL_RALM):
                    seq = self.block(seq, f"lm.ralm.layers.{i}", True, False)
                residual_hidden = self.rms(seq, self.t["lm.ralm.norm.w"])[-1]
            mu = torch.stack([self.lin("lm.proj.lm_to_dit", lm_hidden),
                              self.lin("lm.proj.res_to_dit", residual_hidden)])
            cond_h = self.lin("lm.locdit.cond_proj", prev_patch)
            x_cur = torch.as_tensor(noise)
            for s in range(len(t_real)):
                x_h = self.lin("lm.locdit.in_proj", x_cur)
                t_h = self.time_mlp("time_mlp", tsin[s]) + dt_emb
                pos = self.locdit(x_h, cond_h, mu, t_h)
                neg = self.locdit(x_h, cond_h, torch.zeros_like(mu), t_h)
                st = (pos * neg).sum() / ((neg * neg).sum() + 1e-8)
                dphi = neg * st + cfg * (pos - neg * st)
                x_cur = x_cur - dphi * float(dts[s])
            sp = F.silu(self.lin("lm.stop.proj", lm_hidden))
            stop_logits = self.t["lm.stop.head.w"] @ sp
            fb_tslm, fb_lm = self.locenc(x_cur)
            patches.append(x_cur)
            stops.append(stop_logits)
            prev_patch = x_cur
            prev_fb_lm = fb_lm
        return patches, stops


@pytest.fixture(scope="module")
def tiny_cfm(tmp_path_factory):
    ref = TorchCFM()
    path = tmp_path_factory.mktemp("cfm") / "cfm.gguf"
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "continuous_latent_cfm")
    w.add_uint32("codec.lm.hidden_dim", HB)
    w.add_uint32("codec.lm.h_vox", HV)
    w.add_uint32("codec.lm.h_enc", HE)
    w.add_uint32("codec.lm.h_dit", HD)
    w.add_uint32("codec.lm.latent_dim", D)
    w.add_uint32("codec.lm.patch_size", P)
    w.add_uint32("codec.lm.n_locenc", NL_ENC)
    w.add_uint32("codec.lm.n_locdit", NL_DIT)
    w.add_uint32("codec.lm.n_ralm", NL_RALM)
    w.add_uint32("codec.lm.n_heads", NH)
    w.add_uint32("codec.lm.n_kv", NKV)
    w.add_uint32("codec.lm.head_dim", HDIM)
    w.add_uint32("codec.lm.fsq_scale", FSQ)
    w.add_uint32("codec.lm.min_len", 0)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()
    return ref, create_lm(GGUFReader(path))


def test_info(tiny_cfm):
    _, lm = tiny_cfm
    assert lm.info.kind == "continuous_latent_cfm"
    assert lm.info.is_continuous
    assert lm.info.patch_size == P and lm.info.latent_dim == D


def test_full_loop_parity(tiny_cfm):
    ref, lm = tiny_cfm
    rng = np.random.default_rng(0)
    prefix = torch.tensor(rng.standard_normal((3, HB)).astype(np.float32) * 0.5)
    step_h = torch.tensor(rng.standard_normal((3, HB)).astype(np.float32) * 0.5)
    noises = [rng.standard_normal((P, D)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        want_patches, want_stops = ref.generate(prefix, step_h, noises, cfg=2.0, n_t=6)

    st = lm.new_state()
    lm.text_prefill(st, prefix.numpy())
    for i, noise in enumerate(noises):
        h_in = step_h[i - 1].numpy() if i > 0 else np.zeros(HB, np.float32)
        patch, stop, feedback = lm.step_generate(st, h_in, cfg_value=2.0,
                                                 n_timesteps=6, noise=noise)
        np.testing.assert_allclose(patch, want_patches[i].numpy(),
                                   rtol=2e-3, atol=5e-4)
        want_stop = bool(want_stops[i][1] > want_stops[i][0]) and i > 0
        assert stop == want_stop, f"step {i}"
        assert feedback.shape == (HB,)


def test_teacher_forcing(tiny_cfm):
    ref, lm = tiny_cfm
    rng = np.random.default_rng(1)
    st = lm.new_state()
    lm.text_prefill(st, rng.standard_normal((2, HB)).astype(np.float32))
    teacher = rng.standard_normal((P, D)).astype(np.float32)
    lm.set_teacher_patch(st, teacher)
    noise = rng.standard_normal((P, D)).astype(np.float32)
    patch, _, _ = lm.step_generate(st, np.zeros(HB, np.float32), noise=noise,
                                   n_timesteps=4)
    # teacher patch became the next cond
    np.testing.assert_allclose(st.kind_state["prev_patch"], teacher, rtol=1e-6)

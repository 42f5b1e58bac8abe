"""flow_lm (Pocket-TTS) parity vs a torch mirror: prefill + AR steps with
deterministic noise, EOS logits, speaker rows, latent denorm."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm import create_lm

DM = 32          # d_model
L = 2            # layers
H, HD = 2, 16
LDIM = 8
FDIM = 24        # flow dim
FDEPTH = 2
NBINS = 50
LSD = 2


class TorchFlow:
    def __init__(self):
        g = torch.Generator().manual_seed(0)
        self.t = {}

        def P(name, *shape, s=0.25, off=0.0):
            v = torch.randn(*shape, generator=g) * s + off
            self.t[name] = v
            return v

        P("lm.text.embed.w", NBINS + 1, DM)
        P("lm.bos_before_voice", DM)
        P("lm.bos_emb", LDIM)
        P("lm.input_linear.w", DM, LDIM)
        P("lm.out_norm.w", DM, s=0.2, off=1.0)
        P("lm.out_norm.b", DM)
        P("lm.out_eos.w", 1, DM)
        P("lm.out_eos.b", 1)
        P("lm.emb_std", LDIM, s=0.1, off=1.0)
        P("lm.emb_mean", LDIM)
        P("lm.speaker_proj.w", DM, LDIM)
        for l in range(L):
            p = f"lm.tf.l{l}"
            P(p + ".inln.w", DM, s=0.2, off=1.0)
            P(p + ".inln.b", DM)
            P(p + ".paln.w", DM, s=0.2, off=1.0)
            P(p + ".paln.b", DM)
            P(p + ".attn.q_proj.w", DM, DM)
            P(p + ".attn.k_proj.w", DM, DM)
            P(p + ".attn.v_proj.w", DM, DM)
            P(p + ".attn.o_proj.w", DM, DM)
            P(p + ".mlp.fc1.w", 2 * DM, DM)
            P(p + ".mlp.fc2.w", DM, 2 * DM)
        P("lm.flow.input_proj.w", FDIM, LDIM)
        P("lm.flow.input_proj.b", FDIM)
        P("lm.flow.cond_embed.w", FDIM, DM)
        P("lm.flow.cond_embed.b", FDIM)
        P("lm.flow.final.adaln.w", 2 * FDIM, FDIM)
        P("lm.flow.final.adaln.b", 2 * FDIM)
        P("lm.flow.final.linear.w", LDIM, FDIM)
        P("lm.flow.final.linear.b", LDIM)
        for i in range(2):
            p = f"lm.flow.time_embed.{i}"
            P(p + ".freqs", FDIM // 2, s=1.0)
            P(p + ".l1.w", FDIM, FDIM)
            P(p + ".l1.b", FDIM)
            P(p + ".l2.w", FDIM, FDIM)
            P(p + ".l2.b", FDIM)
            P(p + ".rms.alpha", FDIM, s=0.2, off=1.0)
        for b in range(FDEPTH):
            p = f"lm.flow.res.{b}"
            P(p + ".adaln.w", 3 * FDIM, FDIM)
            P(p + ".adaln.b", 3 * FDIM)
            P(p + ".in_ln.w", FDIM, s=0.2, off=1.0)
            P(p + ".in_ln.b", FDIM)
            P(p + ".mlp.l1.w", 2 * FDIM, FDIM)
            P(p + ".mlp.l1.b", 2 * FDIM)
            P(p + ".mlp.l2.w", FDIM, 2 * FDIM)
            P(p + ".mlp.l2.b", FDIM)

    def rope(self, x, pos):
        # x [H, T, HD] NORMAL interleaved
        inv = 10000.0 ** (-torch.arange(0, HD, 2) / HD)
        ang = pos.float()[:, None] * inv[None]
        cos, sin = ang.cos()[None], ang.sin()[None]
        xe, xo = x[..., 0::2], x[..., 1::2]
        return torch.stack([xe * cos - xo * sin, xe * sin + xo * cos], -1).reshape(x.shape)

    def transformer(self, seq):
        """Full causal pass over prefix seq [T, DM] → hiddens [T, DM]."""
        t = self.t
        T = seq.shape[0]
        pos = torch.arange(T)
        x = seq
        for l in range(L):
            p = f"lm.tf.l{l}"
            h = F.layer_norm(x, (DM,), t[p + ".inln.w"], t[p + ".inln.b"], eps=1e-5)
            q = (h @ t[p + ".attn.q_proj.w"].T).view(T, H, HD).transpose(0, 1)
            k = (h @ t[p + ".attn.k_proj.w"].T).view(T, H, HD).transpose(0, 1)
            v = (h @ t[p + ".attn.v_proj.w"].T).view(T, H, HD).transpose(0, 1)
            q, k = self.rope(q, pos), self.rope(k, pos)
            logits = q @ k.transpose(-1, -2) / (HD ** 0.5)
            cm = torch.where(torch.arange(T)[None, :] <= torch.arange(T)[:, None],
                             0.0, float("-inf"))
            a = torch.softmax(logits + cm, -1) @ v
            a = a.transpose(0, 1).reshape(T, DM)
            x = x + a @ t[p + ".attn.o_proj.w"].T
            f = F.layer_norm(x, (DM,), t[p + ".paln.w"], t[p + ".paln.b"], eps=1e-5)
            x = x + F.gelu(f @ t[p + ".mlp.fc1.w"].T, approximate="tanh") @ t[p + ".mlp.fc2.w"].T
        return x

    def time_embed(self, i, s):
        t = self.t
        p = f"lm.flow.time_embed.{i}"
        args = t[p + ".freqs"] * s
        emb = torch.cat([args.cos(), args.sin()])
        h = F.silu(t[p + ".l1.w"] @ emb + t[p + ".l1.b"])
        h = t[p + ".l2.w"] @ h + t[p + ".l2.b"]
        var = h.var(unbiased=True)
        return h / torch.sqrt(var + 1e-5) * t[p + ".rms.alpha"]

    def flow_net(self, cond, s, tv, x):
        t = self.t
        xh = t["lm.flow.input_proj.w"] @ x + t["lm.flow.input_proj.b"]
        tc = 0.5 * (self.time_embed(0, s) + self.time_embed(1, tv))
        y = tc + t["lm.flow.cond_embed.w"] @ cond + t["lm.flow.cond_embed.b"]
        sy = F.silu(y)
        for b in range(FDEPTH):
            p = f"lm.flow.res.{b}"
            mod = t[p + ".adaln.w"] @ sy + t[p + ".adaln.b"]
            shift, scale, gate = mod[:FDIM], mod[FDIM:2 * FDIM], mod[2 * FDIM:]
            hn = F.layer_norm(xh, (FDIM,), t[p + ".in_ln.w"], t[p + ".in_ln.b"], eps=1e-6)
            hn = hn * (1 + scale) + shift
            hn = t[p + ".mlp.l2.w"] @ F.silu(t[p + ".mlp.l1.w"] @ hn + t[p + ".mlp.l1.b"]) \
                + t[p + ".mlp.l2.b"]
            xh = xh + gate * hn
        fmod = t["lm.flow.final.adaln.w"] @ sy + t["lm.flow.final.adaln.b"]
        fshift, fscale = fmod[:FDIM], fmod[FDIM:]
        xf = F.layer_norm(xh, (FDIM,), eps=1e-6)
        xf = xf * (1 + fscale) + fshift
        return t["lm.flow.final.linear.w"] @ xf + t["lm.flow.final.linear.b"]

    def generate(self, token_ids, voice_rows, noises):
        """Prefill + len(noises) steps; returns (latents, eos_logits)."""
        t = self.t
        parts = [t["lm.text.embed.w"][torch.as_tensor(token_ids)]]
        if voice_rows is not None:
            parts.append(t["lm.bos_before_voice"][None])
            parts.append(torch.as_tensor(voice_rows))
        prefix = torch.cat(parts, 0)
        latents, eoses = [], []
        seq = prefix
        prev = None
        for noise in noises:
            inp = t["lm.bos_emb"] if prev is None else prev
            seq = torch.cat([seq, (t["lm.input_linear.w"] @ inp)[None]], 0)
            hs = self.transformer(seq)
            c = F.layer_norm(hs[-1], (DM,), t["lm.out_norm.w"], t["lm.out_norm.b"], eps=1e-5)
            eoses.append(float(t["lm.out_eos.w"] @ c + t["lm.out_eos.b"]))
            cur = torch.as_tensor(noise)
            for i in range(LSD):
                cur = cur + self.flow_net(c, i / LSD, (i + 1) / LSD, cur) / LSD
            latents.append(cur)
            prev = cur
        return torch.stack(latents), eoses


@pytest.fixture(scope="module")
def tiny_flow(tmp_path_factory):
    ref = TorchFlow()
    path = tmp_path_factory.mktemp("flow") / "flow.gguf"
    w = GGUFWriter(path, "pocket_mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "flow_lm")
    w.add_uint32("codec.lm.d_model", DM)
    w.add_uint32("codec.lm.n_layers", L)
    w.add_uint32("codec.lm.n_heads", H)
    w.add_uint32("codec.lm.head_dim", HD)
    w.add_uint32("codec.lm.ldim", LDIM)
    w.add_uint32("codec.lm.flow_dim", FDIM)
    w.add_uint32("codec.lm.flow_depth", FDEPTH)
    w.add_uint32("codec.lm.lut_n_bins", NBINS)
    w.add_bool("codec.lm.insert_bos_before_voice", True)
    w.add_uint32("codec.lm.lsd_decode_steps", LSD)
    w.add_float32("codec.lm.eos_threshold", -4.0)
    for name, tensor in ref.t.items():
        w.add_tensor(name, tensor.numpy())
    w.write()
    return ref, create_lm(GGUFReader(path))


def test_info(tiny_flow):
    _, lm = tiny_flow
    assert lm.info.kind == "flow_lm"
    assert lm.info.is_continuous
    assert lm.info.latent_dim == LDIM


def test_generation_parity(tiny_flow):
    ref, lm = tiny_flow
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, NBINS, 5).tolist()
    mu = rng.standard_normal((3, LDIM)).astype(np.float32)
    voice = lm.speaker_rows(mu)
    np.testing.assert_allclose(
        voice, mu @ ref.t["lm.speaker_proj.w"].numpy().T, rtol=1e-5, atol=1e-5)

    noises = [rng.standard_normal(LDIM).astype(np.float32) * 0.5 for _ in range(3)]
    with torch.no_grad():
        want_lat, want_eos = ref.generate(tokens, voice, noises)

    st = lm.new_state()
    lm.flow_prefill(st, tokens, voice_rows=voice)
    prev = None
    for i, noise in enumerate(noises):
        lat, eos_logit, is_eos = lm.flow_step(st, prev_latent=prev, noise=noise)
        np.testing.assert_allclose(lat, want_lat[i].numpy(), rtol=1e-3, atol=2e-4)
        assert abs(eos_logit - want_eos[i]) < 2e-4
        assert is_eos == (want_eos[i] > -4.0)
        prev = lat


def test_flow_run_chunk_matches_single_steps(tiny_flow):
    """flow_run (K frames in one lax.scan call) must reproduce the
    repeated-flow_step trajectory: latents, eos logits, and KV state."""
    ref, lm = tiny_flow
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, NBINS, 4).tolist()
    noises = (rng.standard_normal((6, LDIM)) * 0.5).astype(np.float32)

    st1 = lm.new_state()
    lm.flow_prefill(st1, tokens)
    want_lat, want_eos = [], []
    prev = None
    for noise in noises:
        lat, eos_logit, _ = lm.flow_step(st1, prev_latent=prev, noise=noise)
        want_lat.append(lat)
        want_eos.append(eos_logit)
        prev = lat

    st2 = lm.new_state()
    lm.flow_prefill(st2, tokens)
    # split across two chunks to exercise carry-over of prev/frame/kv_pos
    lat_a, eos_a = lm.flow_run(st2, noises[:4])
    lat_b, eos_b = lm.flow_run(st2, noises[4:], prev_latent=lat_a[-1])
    got_lat = np.concatenate([lat_a, lat_b])
    got_eos = np.concatenate([eos_a, eos_b])

    np.testing.assert_allclose(got_lat, np.stack(want_lat), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_eos, np.asarray(want_eos), rtol=1e-4, atol=1e-5)
    assert st2.kind_state["kv_pos"] == st1.kind_state["kv_pos"]
    np.testing.assert_allclose(np.asarray(st2.kind_state["k"]),
                               np.asarray(st1.kind_state["k"]),
                               rtol=1e-4, atol=1e-5)


def test_denorm_and_tokenize_absent(tiny_flow):
    ref, lm = tiny_flow
    lat = np.ones(LDIM, np.float32)
    out = lm.denorm_latent(lat)
    want = ref.t["lm.emb_std"].numpy() + ref.t["lm.emb_mean"].numpy()
    np.testing.assert_allclose(out, want, rtol=1e-6)
    with pytest.raises(Exception):
        lm.tokenize("hello")          # no spm baked into this fixture

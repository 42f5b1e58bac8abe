"""Direct op-level parity, part 2: op families previously covered only
transitively through model suites (VERDICT r1 "thin direct op tests").

Oracles are torch modules/functions where torch has the semantics
(convs, pools, LSTM, norms, ISTFT) and explicit python-loop
re-derivations where the op is bespoke (Shaw rel-key, ESPnet rel-shift) —
a structurally different computation, so layout/transpose bugs can't
cancel out.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from codec_tpu.ops import act, attn, blocks, conv, norms, rope
from codec_tpu.ops.istft import hann_periodic, istft_from_head

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# convs / pools
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k,stride,dilation,pad", [
    (7, 1, 1, 3), (7, 1, 3, 9), (3, 1, 1, 1), (4, 2, 1, 2), (16, 8, 1, 4)])
def test_conv1d_symmetric_vs_torch(k, stride, dilation, pad):
    """DAC/HiFi-GAN style symmetric-pad conv (models/_sym_conv semantics)."""
    rng = np.random.default_rng(0)
    b, t, cin, cout = 2, 41, 6, 8
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    yt = F.conv1d(torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(w),
                  torch.from_numpy(bias), stride=stride, padding=pad,
                  dilation=dilation).permute(0, 2, 1).numpy()
    y = conv.conv1d(jnp.asarray(x), conv.prepare_conv_weight(w),
                    jnp.asarray(bias), stride=stride, dilation=dilation,
                    padding=pad)
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,pad", [(16, 8, 4), (4, 2, 1), (10, 5, 3)])
def test_convtr1d_padding_vs_torch(k, stride, pad):
    """Symmetric-crop transposed conv (DAC upsample: pad=ceil(s/2))."""
    rng = np.random.default_rng(1)
    b, t, cin, cout = 2, 19, 6, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    yt = F.conv_transpose1d(torch.from_numpy(x).permute(0, 2, 1),
                            torch.from_numpy(w), torch.from_numpy(bias),
                            stride=stride, padding=pad).permute(0, 2, 1).numpy()
    y = conv.convtr1d(jnp.asarray(x), conv.prepare_convtr_weight(w),
                      jnp.asarray(bias), stride=stride, padding=pad)
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride", [(2, 2), (3, 1), (4, 4)])
def test_pool1d_vs_torch(k, stride):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 24, 6)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)
    want_avg = F.avg_pool1d(xt, k, stride).permute(0, 2, 1).numpy()
    want_max = F.max_pool1d(xt, k, stride).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(_np(conv.pool1d_avg(jnp.asarray(x), k, stride)),
                               want_avg, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(conv.pool1d_max(jnp.asarray(x), k, stride)),
                               want_max, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# activations / norms
# ---------------------------------------------------------------------------

def test_unary_acts_vs_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 33)).astype(np.float32) * 3
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(_np(act.silu(jnp.asarray(x))),
                               F.silu(xt).numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(act.mish(jnp.asarray(x))),
                               F.mish(xt).numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(act.gelu_tanh(jnp.asarray(x))),
                               F.gelu(xt, approximate="tanh").numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(act.leaky_relu(jnp.asarray(x), 0.1)),
                               F.leaky_relu(xt, 0.1).numpy(),
                               rtol=RTOL, atol=ATOL)


def test_snake_beta_formula():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 9, 5)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(5).astype(np.float32)) + 0.2
    beta = np.abs(rng.standard_normal(5).astype(np.float32)) + 0.2
    want = x + np.sin(alpha * x) ** 2 / (beta + 1e-9)
    got = act.snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
    np.testing.assert_allclose(_np(got), want, rtol=RTOL, atol=ATOL)


def test_rms_norm_vs_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    g = rng.standard_normal(16).astype(np.float32)
    xt = torch.from_numpy(x)
    want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)
            * torch.from_numpy(g)).numpy()
    got = norms.rms_norm(jnp.asarray(x), jnp.asarray(g))
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_l2_normalize_vs_torch():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    want = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    got = norms.l2_normalize(jnp.asarray(x))
    np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------

def test_convnext_block_vs_torch():
    """Vocos ConvNeXtBlock: dw k7 -> LN -> pw -> gelu -> pw -> gamma -> +x."""
    rng = np.random.default_rng(7)
    c, inter, t = 12, 24, 15
    x = rng.standard_normal((2, t, c)).astype(np.float32)
    p_np = {
        "dw_w": rng.standard_normal((c, 1, 7)).astype(np.float32),
        "dw_b": rng.standard_normal(c).astype(np.float32),
        "ln_w": rng.standard_normal(c).astype(np.float32),
        "ln_b": rng.standard_normal(c).astype(np.float32),
        "pw1_w": rng.standard_normal((inter, c)).astype(np.float32),
        "pw1_b": rng.standard_normal(inter).astype(np.float32),
        "pw2_w": rng.standard_normal((c, inter)).astype(np.float32),
        "pw2_b": rng.standard_normal(c).astype(np.float32),
        "gamma": rng.standard_normal(c).astype(np.float32),
    }
    xt = torch.from_numpy(x)
    h = F.conv1d(xt.permute(0, 2, 1), torch.from_numpy(p_np["dw_w"]),
                 torch.from_numpy(p_np["dw_b"]), padding=3,
                 groups=c).permute(0, 2, 1)
    h = F.layer_norm(h, (c,), torch.from_numpy(p_np["ln_w"]),
                     torch.from_numpy(p_np["ln_b"]), eps=1e-6)
    h = F.gelu(F.linear(h, torch.from_numpy(p_np["pw1_w"]),
                        torch.from_numpy(p_np["pw1_b"])))
    h = F.linear(h, torch.from_numpy(p_np["pw2_w"]),
                 torch.from_numpy(p_np["pw2_b"]))
    want = (xt + h * torch.from_numpy(p_np["gamma"])).numpy()

    p = {k: jnp.asarray(v) for k, v in p_np.items()}
    p["dw_w"] = conv.prepare_conv_weight(p_np["dw_w"])
    got = blocks.convnext_block(jnp.asarray(x), p)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_lstm_stack_vs_torch():
    rng = np.random.default_rng(8)
    c, t = 10, 13
    x = rng.standard_normal((2, t, c)).astype(np.float32)
    lstm = torch.nn.LSTM(c, c, num_layers=2, batch_first=True)
    with torch.no_grad():
        want = (lstm(torch.from_numpy(x))[0] + torch.from_numpy(x)).numpy()
    layers = []
    for li in range(2):
        layers.append({
            "w_ih": jnp.asarray(getattr(lstm, f"weight_ih_l{li}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(lstm, f"weight_hh_l{li}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(lstm, f"bias_ih_l{li}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(lstm, f"bias_hh_l{li}").detach().numpy()),
        })
    got = blocks.lstm_stack(jnp.asarray(x), layers, skip=True)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_diffusion_resblock_vs_torch():
    rng = np.random.default_rng(9)
    c, t, groups = 16, 11, 4
    x = rng.standard_normal((1, t, c)).astype(np.float32)
    p_np = {
        "n1_w": rng.standard_normal(c).astype(np.float32),
        "n1_b": rng.standard_normal(c).astype(np.float32),
        "c1_w": rng.standard_normal((c, c, 3)).astype(np.float32),
        "c1_b": rng.standard_normal(c).astype(np.float32),
        "n2_w": rng.standard_normal(c).astype(np.float32),
        "n2_b": rng.standard_normal(c).astype(np.float32),
        "c2_w": rng.standard_normal((c, c, 3)).astype(np.float32),
        "c2_b": rng.standard_normal(c).astype(np.float32),
    }
    xt = torch.from_numpy(x).permute(0, 2, 1)
    h = F.group_norm(xt, groups, torch.from_numpy(p_np["n1_w"]),
                     torch.from_numpy(p_np["n1_b"]), eps=1e-6)
    h = F.conv1d(F.silu(h), torch.from_numpy(p_np["c1_w"]),
                 torch.from_numpy(p_np["c1_b"]), padding=1)
    h = F.group_norm(h, groups, torch.from_numpy(p_np["n2_w"]),
                     torch.from_numpy(p_np["n2_b"]), eps=1e-6)
    h = F.conv1d(F.silu(h), torch.from_numpy(p_np["c2_w"]),
                 torch.from_numpy(p_np["c2_b"]), padding=1)
    want = (xt + h).permute(0, 2, 1).numpy()

    p = {k: jnp.asarray(v) for k, v in p_np.items()}
    p["c1_w"] = conv.prepare_conv_weight(p_np["c1_w"])
    p["c2_w"] = conv.prepare_conv_weight(p_np["c2_w"])
    got = blocks.diffusion_resblock(jnp.asarray(x), p, n_groups=groups)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# iSTFT vs torch.istft
# ---------------------------------------------------------------------------

def test_istft_vocos_vs_torch():
    """istft_from_head interior samples == torch.istft(center=True).

    Vocos trims (n_fft-hop)/2 per side (out T*hop); torch center=True trims
    n_fft//2 (out (T-1)*hop). Compare on the overlapping interior, away from
    the first/last frame where the envelope floors differ.
    """
    rng = np.random.default_rng(10)
    n_fft, hop, t = 32, 8, 20
    n_bins = n_fft // 2 + 1
    logmag = rng.standard_normal((1, t, n_bins)).astype(np.float32) * 0.3
    phase = rng.standard_normal((1, t, n_bins)).astype(np.float32) * np.pi
    head = np.concatenate([logmag, phase], axis=-1)

    got = _np(istft_from_head(jnp.asarray(head), hop))       # [1, T*hop]
    assert got.shape == (1, t * hop)

    spec = torch.from_numpy(
        np.clip(np.exp(logmag), None, 1e2) * np.exp(1j * phase)
    ).permute(0, 2, 1).to(torch.complex64)                   # [1, bins, T]
    win = torch.from_numpy(hann_periodic(n_fft))
    want = torch.istft(spec, n_fft, hop_length=hop, win_length=n_fft,
                       window=win, center=True).numpy()      # [1, (T-1)*hop]

    # ours[j] corresponds to torch[j - (n_fft//2 - (n_fft-hop)//2)] = j - hop//2
    off = n_fft // 2 - (n_fft - hop) // 2
    lo, hi = n_fft, (t - 4) * hop                            # interior
    np.testing.assert_allclose(got[0, lo + off: hi + off], want[0, lo: hi],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# RoPE NORMAL (interleaved) + bespoke attention variants vs loop oracles
# ---------------------------------------------------------------------------

def test_rope_normal_interleaved_loop_oracle():
    rng = np.random.default_rng(11)
    b, h, t, d = 1, 2, 6, 8
    x = rng.standard_normal((b, h, t, d)).astype(np.float32)
    theta = 10000.0
    want = np.empty_like(x)
    for pos in range(t):
        for i in range(d // 2):
            ang = pos * theta ** (-2.0 * i / d)
            c, s = np.cos(ang), np.sin(ang)
            xe, xo = x[:, :, pos, 2 * i], x[:, :, pos, 2 * i + 1]
            want[:, :, pos, 2 * i] = xe * c - xo * s
            want[:, :, pos, 2 * i + 1] = xe * s + xo * c
    got = rope.apply_rope(jnp.asarray(x), theta=theta, neox=False)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_sdpa_rel_key_loop_oracle():
    """Shaw relative-key attention vs an explicit per-position loop."""
    rng = np.random.default_rng(12)
    b, h, t, d = 1, 2, 9, 4
    left, right = 3, 2
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    emb = rng.standard_normal((left + right + 1, d)).astype(np.float32)
    scale = d ** -0.5

    want = np.empty_like(q)
    for bi in range(b):
        for hi in range(h):
            for tq in range(t):
                logits = np.empty(t)
                for tk in range(t):
                    bucket = int(np.clip(tk - tq, -left, right)) + left
                    logits[tk] = (q[bi, hi, tq] @ k[bi, hi, tk]
                                  + q[bi, hi, tq] @ emb[bucket])
                w = np.exp(logits * scale - np.max(logits * scale))
                w /= w.sum()
                want[bi, hi, tq] = w @ v[bi, hi]

    got = attn.sdpa_rel_key(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(emb), left, right)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_sdpa_rel_pos_loop_oracle():
    """ESPnet Transformer-XL rel-shift attention vs an explicit loop."""
    rng = np.random.default_rng(13)
    b, h, t, d = 1, 2, 7, 4
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    p = rng.standard_normal((b, h, 2 * t - 1, d)).astype(np.float32)
    u = rng.standard_normal((h, d)).astype(np.float32)
    vb = rng.standard_normal((h, d)).astype(np.float32)
    scale = d ** -0.5

    want = np.empty_like(q)
    for hi in range(h):
        for tq in range(t):
            logits = np.empty(t)
            for tk in range(t):
                # row r of p holds relative position (t-1) - r
                r = (t - 1) - (tk - tq)
                logits[tk] = ((q[0, hi, tq] + u[hi]) @ k[0, hi, tk]
                              + (q[0, hi, tq] + vb[hi]) @ p[0, hi, r])
            w = np.exp(logits * scale - np.max(logits * scale))
            w /= w.sum()
            want[0, hi, tq] = w @ v[0, hi]

    got = attn.sdpa_rel_pos(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(p), jnp.asarray(u), jnp.asarray(vb))
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# streaming conv chunk-exactness (direct; model suites cover it end-to-end)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k,stride,dilation", [(7, 1, 1), (8, 4, 1), (3, 1, 3)])
def test_conv1d_causal_stream_chunk_exact(k, stride, dilation):
    rng = np.random.default_rng(14)
    b, t, c = 1, 48, 5
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((8, c, k)).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    wj = conv.prepare_conv_weight(w)
    full = _np(conv.conv1d_causal(jnp.asarray(x), wj, jnp.asarray(bias),
                                  stride=stride, dilation=dilation))
    carry = conv.conv1d_causal_stream_init(b, c, k, stride, dilation)
    outs = []
    # chunks must be stride multiples; vary sizes
    sizes = [stride * 4, stride * 2, stride * 6]
    sizes.append(t - sum(sizes))
    pos = 0
    for sz in sizes:
        y, carry = conv.conv1d_causal_stream(
            jnp.asarray(x[:, pos:pos + sz]), wj, jnp.asarray(bias), carry,
            stride=stride, dilation=dilation)
        outs.append(_np(y))
        pos += sz
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride", [(16, 8), (4, 2)])
def test_convtr1d_causal_stream_chunk_exact(k, stride):
    rng = np.random.default_rng(15)
    b, t, cin, cout = 1, 24, 4, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    wj = conv.prepare_convtr_weight(w)
    full = _np(conv.convtr1d_causal(jnp.asarray(x), wj, jnp.asarray(bias),
                                    stride=stride))
    carry = conv.convtr1d_causal_stream_init(b, cout, k, stride)
    outs = []
    pos = 0
    for sz in (7, 5, 9, 3):
        y, carry = conv.convtr1d_causal_stream(
            jnp.asarray(x[:, pos:pos + sz]), wj, jnp.asarray(bias), carry,
            stride=stride)
        outs.append(_np(y))
        pos += sz
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,cin,cout,d,pad", [
    (7, 128, 1, 1, 3),     # SEANet final conv shape (narrow-output form)
    (7, 64, 2, 1, 3),      # narrow-output, cout > 1
    (3, 96, 1, 2, 2),      # dilated narrow-output
    (7, 32, 32, 1, 3),     # wide output -> K-shifted-matmul form
])
def test_conv1d_matmul_matches_conv1d(k, cin, cout, d, pad):
    """Both branches of the TPU stride-1 matmul conv formulation
    (ops/conv.conv1d_matmul): the K-shifted-matmul form and the
    narrow-output z-shift form (one [T,C_in]@[C_in,K*C_out] matmul +
    K shifted adds over the small z — dispatched when
    2*K*C_out <= (K-1)*C_in, e.g. every SEANet decoder's final k7 C->1
    conv) against lax conv1d."""
    import jax.numpy as jnp

    from codec_tpu.ops import conv

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 300, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    want = np.asarray(conv.conv1d(x, w, b, dilation=d, padding=pad))
    got = np.asarray(conv.conv1d_matmul(x, w, b, dilation=d, padding=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv1d_matmul_asymmetric_padding():
    import jax.numpy as jnp

    from codec_tpu.ops import conv

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 300, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 128, 1)) * 0.2, jnp.float32)
    want = np.asarray(conv.conv1d(jnp.pad(x, ((0, 0), (5, 1), (0, 0))),
                                  w, None, padding=0))
    got = np.asarray(conv.conv1d_matmul(x, w, None, padding=(5, 1)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

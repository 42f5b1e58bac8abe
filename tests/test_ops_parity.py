"""Op-level parity vs torch CPU references (torch is the reference's source
framework; bit-level agreement here is the foundation for model parity)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from codec_tpu.ops import act, attn, conv, norms, rope, rvq

RTOL = 1e-5
ATOL = 1e-5


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,stride,dilation", [(7, 1, 1), (8, 4, 1), (3, 1, 2), (10, 5, 1), (4, 2, 1)])
def test_conv1d_causal_vs_torch(k, stride, dilation):
    rng = np.random.default_rng(0)
    b, t, cin, cout = 2, 50, 6, 8
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    # torch reference: left-pad k_eff - stride, right-pad to multiple of stride
    k_eff = (k - 1) * dilation + 1
    pad_l = k_eff - stride
    pad_r = -(-t // stride) * stride - t
    xt = torch.from_numpy(x).permute(0, 2, 1)
    xt = F.pad(xt, (pad_l, pad_r))
    yt = F.conv1d(xt, torch.from_numpy(w), torch.from_numpy(bias), stride=stride, dilation=dilation)
    yt = yt.permute(0, 2, 1).numpy()

    y = conv.conv1d_causal(jnp.asarray(x), conv.prepare_conv_weight(w), jnp.asarray(bias),
                           stride=stride, dilation=dilation)
    assert y.shape == yt.shape == (b, -(-t // stride), cout)
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


def test_conv1d_causal_replicate_vs_torch():
    rng = np.random.default_rng(1)
    b, t, c, k, stride = 1, 33, 4, 4, 2
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((c, c, k)).astype(np.float32)
    pad_l = k - stride
    pad_r = -(-t // stride) * stride - t
    xt = torch.from_numpy(x).permute(0, 2, 1)
    xt = F.pad(xt, (pad_l, pad_r), mode="replicate")
    yt = F.conv1d(xt, torch.from_numpy(w), None, stride=stride).permute(0, 2, 1).numpy()
    y = conv.conv1d_causal(jnp.asarray(x), conv.prepare_conv_weight(w), None,
                           stride=stride, pad_mode="replicate")
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride", [(4, 2), (16, 8), (12, 6), (10, 5), (8, 4)])
def test_convtr1d_causal_vs_torch(k, stride):
    rng = np.random.default_rng(2)
    b, t, cin, cout = 2, 25, 6, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    yt = F.conv_transpose1d(torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(w),
                            torch.from_numpy(bias), stride=stride)
    crop = max(0, k - stride)
    yt = yt[:, :, : yt.shape[2] - crop].permute(0, 2, 1).numpy()

    y = conv.convtr1d_causal(jnp.asarray(x), conv.prepare_convtr_weight(w), jnp.asarray(bias),
                             stride=stride)
    assert y.shape == (b, t * stride, cout)
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


def test_depthwise_causal_conv():
    rng = np.random.default_rng(3)
    b, t, c, k = 2, 20, 8, 5
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((c, 1, k)).astype(np.float32)  # torch depthwise layout
    xt = F.pad(torch.from_numpy(x).permute(0, 2, 1), (k - 1, 0))
    yt = F.conv1d(xt, torch.from_numpy(w), None, groups=c).permute(0, 2, 1).numpy()
    y = conv.conv1d_depthwise_causal(jnp.asarray(x), conv.prepare_conv_weight(w), None)
    np.testing.assert_allclose(_np(y), yt, rtol=RTOL, atol=ATOL)


def test_elu_gelu_snake():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 17)).astype(np.float32)
    np.testing.assert_allclose(_np(act.elu(jnp.asarray(x))), F.elu(torch.from_numpy(x)).numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(act.gelu_erf(jnp.asarray(x))),
                               F.gelu(torch.from_numpy(x)).numpy(), rtol=RTOL, atol=ATOL)
    alpha = np.abs(rng.standard_normal((17,)).astype(np.float32)) + 0.1
    want = x + np.sin(alpha * x) ** 2 / (alpha + 1e-9)
    np.testing.assert_allclose(_np(act.snake(jnp.asarray(x), jnp.asarray(alpha))), want,
                               rtol=RTOL, atol=ATOL)


def test_layer_norm_vs_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 9, 16)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    yt = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g), torch.from_numpy(b)).numpy()
    y = norms.layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-5)


def test_group_norm_vs_torch():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 11, 12)).astype(np.float32)
    g = rng.standard_normal((12,)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32)
    yt = F.group_norm(torch.from_numpy(x).permute(0, 2, 1), 4, torch.from_numpy(g),
                      torch.from_numpy(b)).permute(0, 2, 1).numpy()
    y = norms.group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 4)
    np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-5)


def test_rope_neox_vs_hf():
    """NEOX rope == HF rotate-half formula."""
    rng = np.random.default_rng(7)
    b, h, t, d = 1, 2, 10, 8
    x = rng.standard_normal((b, h, t, d)).astype(np.float32)
    theta = 10000.0
    inv = 1.0 / theta ** (np.arange(0, d, 2) / d)
    pos = np.arange(t)
    ang = np.einsum("t,f->tf", pos, inv)
    cos = np.cos(ang)
    sin = np.sin(ang)
    cos2 = np.concatenate([cos, cos], axis=-1)[None, None]
    sin2 = np.concatenate([sin, sin], axis=-1)[None, None]

    def rotate_half(v):
        return np.concatenate([-v[..., d // 2:], v[..., : d // 2]], axis=-1)

    want = x * cos2 + rotate_half(x) * sin2
    got = rope.apply_rope(jnp.asarray(x), theta=theta, neox=True)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-5)


def test_sdpa_causal_vs_torch():
    rng = np.random.default_rng(8)
    b, h, t, d = 2, 3, 12, 8
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    yt = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True).numpy()
    m = attn.attn_mask(t, t, causal=True)
    y = attn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=m)
    np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-5)


def test_sdpa_window_mask():
    m = _np(attn.attn_mask(5, 5, causal=True, window=2))
    # row i may see keys {i-1, i}
    want_ok = np.array([[j <= i and j > i - 2 for j in range(5)] for i in range(5)])
    np.testing.assert_array_equal(m == 0.0, want_ok)


def test_rvq_encode_matches_bruteforce():
    rng = np.random.default_rng(9)
    b, t, d, v, n_q = 2, 7, 16, 32, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    cbs = rng.standard_normal((n_q, v, d)).astype(np.float32)

    # numpy brute force argmin ||r - cb||^2
    r = x.copy()
    codes_ref = np.zeros((b, t, n_q), dtype=np.int32)
    for qi in range(n_q):
        d2 = ((r[:, :, None, :] - cbs[qi][None, None]) ** 2).sum(-1)
        idx = d2.argmin(-1)
        codes_ref[:, :, qi] = idx
        r = r - cbs[qi][idx]

    codes = _np(rvq.rvq_encode(jnp.asarray(x), jnp.asarray(cbs)))
    np.testing.assert_array_equal(codes, codes_ref)

    # decode-sum reconstructs x - final residual
    dec = _np(rvq.rvq_decode_sum(jnp.asarray(codes), jnp.asarray(cbs)))
    np.testing.assert_allclose(dec, x - r, rtol=1e-4, atol=1e-4)


def test_rvq_partial_nq_decode():
    rng = np.random.default_rng(10)
    cbs = rng.standard_normal((4, 8, 6)).astype(np.float32)
    codes = rng.integers(0, 8, (1, 5, 4)).astype(np.int32)
    full = _np(rvq.rvq_decode_sum(jnp.asarray(codes), jnp.asarray(cbs), n_q=2))
    want = cbs[0][codes[..., 0]] + cbs[1][codes[..., 1]]
    np.testing.assert_allclose(full, want, rtol=1e-5, atol=1e-5)

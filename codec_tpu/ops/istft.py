"""In-graph inverse STFT (Vocos / ISTFT-head style).

The reference does this on the CPU outside the graph
(codec_runtime_istft_from_head, src/runtime/audio_dsp.cpp:7-95); on TPU we
keep it on-device: irfft per frame (one batched matmul-sized FFT), window,
overlap-add via ConvTranspose with an identity kernel, divide by the
window-square envelope, trim (n_fft - hop)/2 per side ("same" padding →
output T*hop samples).

Window: periodic Hann (torch.hann_window default), matching Vocos exactly;
the reference CPU fallback uses a symmetric Hann — the difference is O(1/n_fft)
and inside every parity threshold.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax


def hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def istft_from_head(head: jax.Array, hop: int, pad: int | None = None,
                    window: jax.Array | None = None,
                    skip_dc_nyquist: bool = False) -> jax.Array:
    """head: [B, T, n_fft+2] (log-magnitudes ‖ phases) → pcm.

    mag = clip(exp(logmag), 1e2); S = mag·e^{iφ}; frame = irfft(S)·win;
    OLA; divide by Σ win² envelope (floor 1e-11).

    Vocos style (default): trim (n_fft-hop)/2 per side → T*hop samples.
    Soprano/HiFi-GAN style: skip_dc_nyquist=True zeroes the DC/Nyquist bins
    and trims n_fft/2 → (T-1)*hop samples (reference:
    codec_runtime_istft_from_head, src/runtime/audio_dsp.cpp:7-95)."""
    b, t, out_dim = head.shape
    n_bins = out_dim // 2
    n_fft = 2 * (n_bins - 1)
    if pad is None:
        pad = (n_fft // 2) if skip_dc_nyquist else (n_fft - hop) // 2
    logmag = head[..., :n_bins]
    phase = head[..., n_bins:]
    mag = jnp.clip(jnp.exp(logmag), None, 1e2)
    spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    if skip_dc_nyquist:
        bin_mask = jnp.ones((n_bins,), spec.dtype).at[0].set(0).at[-1].set(0)
        spec = spec * bin_mask
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(head.dtype)  # [B,T,n_fft]
    if window is None:
        win = jnp.asarray(hann_periodic(n_fft), head.dtype)
    else:
        win = jnp.asarray(window, head.dtype)
    frames = frames * win

    # identity-kernel transposed conv scatters frame i at t*hop + i; kernel
    # orientation: correlation with flipped identity == identity scatter
    eye = jnp.flip(jnp.eye(n_fft, dtype=head.dtype), 0)[:, :, None]
    y = lax.conv_general_dilated(
        frames, eye, window_strides=(1,), padding=[(n_fft - 1, n_fft - 1)],
        lhs_dilation=(hop,), dimension_numbers=("NWC", "WIO", "NWC"))[..., 0]

    env_frames = jnp.broadcast_to(win * win, (1, t, n_fft))
    env = lax.conv_general_dilated(
        env_frames, eye, window_strides=(1,), padding=[(n_fft - 1, n_fft - 1)],
        lhs_dilation=(hop,), dimension_numbers=("NWC", "WIO", "NWC"))[..., 0]
    y = y / jnp.where(env > 1e-11, env, 1.0)
    total = (t - 1) * hop + n_fft
    return y[:, pad: total - pad]

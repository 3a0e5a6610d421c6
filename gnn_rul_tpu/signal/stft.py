"""On-device STFT matching torch.stft semantics.

All bearing front-ends call ``torch.stft(x, n_fft=hop=win=nperseg,
window=hann(periodic), return_complex=True)`` and take the magnitude
(e.g. reference models/STNet/Model.py:93-102). torch defaults that matter:
center=True (reflect-pad n_fft//2 both sides), onesided=True
(n_fft//2+1 bins), num_frames = 1 + L//hop. Output layout (B, bins, frames).

Framing is static-shape: hop == win in every use, so frames are strided
slices of the padded signal — no gathers, XLA fuses the windowing and rFFT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _fft_f32(x: jnp.ndarray) -> jnp.ndarray:
    """FFT inputs must be float32/float64; upcast bf16/fp16 compute dtypes."""
    return x if x.dtype in (jnp.float32, jnp.float64) else x.astype(
        jnp.float32)


def hann_window_periodic(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch.hann_window(n, periodic=True) = 0.5*(1 - cos(2 pi k / n))."""
    k = np.arange(n)
    return jnp.asarray(0.5 * (1.0 - np.cos(2.0 * np.pi * k / n)), dtype=dtype)


def stft_magnitude(x: jnp.ndarray, nperseg: int) -> jnp.ndarray:
    """|STFT| of (B, L) signals -> (B, nperseg//2+1, 1 + L//nperseg).

    Matches torch.stft(n_fft=hop=win=nperseg, hann periodic, center=True,
    pad_mode='reflect', onesided=True).abs().
    """
    b, l = x.shape
    pad = nperseg // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + l // nperseg

    frames = jnp.stack(
        [xp[:, t * nperseg: t * nperseg + nperseg] for t in range(num_frames)],
        axis=1)  # (B, F, nperseg)
    frames = frames * hann_window_periodic(nperseg, dtype=x.dtype)
    # rFFT has no sub-fp32 path (and no MXU benefit from bf16): under
    # mixed precision compute the transform in fp32, return x.dtype.
    spec = jnp.fft.rfft(_fft_f32(frames), axis=-1)  # (B, F, bins)
    mag = jnp.abs(spec).astype(x.dtype)
    return jnp.swapaxes(mag, 1, 2)  # (B, bins, F)

"""Handcrafted statistical / spectral feature stacks (bearing front-ends).

Exact reproductions of:
  - sagcn_features (40-dim):  reference models/SAGCN/Model.py:7-72
    (12 temporal + 8 spectral + 20 cumulative, L2-normalized per sample)
  - st_gcn_features (10-dim): reference models/ST_GCN/Model.py:7-52
  - gat_lstm_features (11-dim): reference models/GAT_LSTM/Model.py:8-72
  - sed_features: reference models/STMSGCN/Model.py:7-31

All are vectorized jnp (the reference's O(L^2) cumulative loop collapses to
one cumsum — position p only ever reads the prefix sum ending at p).
torch.std/var are unbiased (correction=1) — reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .stft import _fft_f32


def _std_unbiased(x, axis=-1):
    n = x.shape[axis]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.sum((x - mean) ** 2, axis=axis) / (n - 1))


def _var_unbiased(x, axis=-1):
    n = x.shape[axis]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    return jnp.sum((x - mean) ** 2, axis=axis) / (n - 1)


def temporal_features_12(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L) -> (B, 12) — reference models/SAGCN/Model.py:21-38."""
    max_v = jnp.max(x, axis=-1)
    min_v = jnp.min(x, axis=-1)
    std_v = _std_unbiased(x)
    rms_v = jnp.sqrt(jnp.mean(x * x, axis=-1))
    mean_v = jnp.mean(x, axis=-1)
    ptp_v = max_v - min_v
    var_v = _var_unbiased(x)
    logp = jax.nn.log_softmax(x, axis=-1)
    entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    asin_v = _std_unbiased(jnp.arcsin(jnp.clip(x, -1 + 1e-7, 1 - 1e-7)))
    atan_v = _std_unbiased(jnp.arctan(x))
    centered = x - mean_v[..., None]
    kurt = jnp.mean(centered ** 4, axis=-1) / (std_v ** 4) - 3.0
    skew = jnp.mean(centered ** 3, axis=-1) / (std_v ** 3)
    return jnp.stack([max_v, min_v, std_v, rms_v, mean_v, ptp_v, var_v,
                      entropy, asin_v, atan_v, kurt, skew], axis=-1)


def frequency_features_8(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L) -> (B, 8) — reference models/SAGCN/Model.py:41-57 (fs=1)."""
    n = x.shape[-1]
    freqs = jnp.asarray(np.fft.fftfreq(n), dtype=x.dtype)
    fft_vals = jnp.fft.fft(_fft_f32(x), axis=-1)
    amp = jnp.abs(fft_vals).astype(x.dtype)
    psd = (amp * amp / n).astype(x.dtype)

    psd_sum = jnp.sum(psd, axis=-1)
    mean_freq = jnp.sum(freqs * psd, axis=-1) / psd_sum
    median_freq = freqs[jnp.argsort(psd, axis=-1)[:, n // 2]]
    band_power = psd_sum
    occupied_bw = jnp.sum(psd * (freqs < 0.5), axis=-1) / psd_sum
    power_bw = jnp.sqrt(jnp.sum(psd * psd, axis=-1) / psd_sum)
    max_psd = jnp.max(psd, axis=-1)
    max_amp = jnp.max(amp, axis=-1)
    freq_max_amp = freqs[jnp.argmax(amp, axis=-1)]
    return jnp.stack([mean_freq, median_freq, band_power, occupied_bw,
                      power_bw, max_psd, max_amp, freq_max_amp], axis=-1)


def cumulative_features(feats: jnp.ndarray) -> jnp.ndarray:
    """(B, L, f) -> (B, L, f): c_p / sqrt(clamp(|c_p|, 1e-12)) with
    c = cumsum over L — single-cumsum form of the reference's O(L^2) loop
    (models/SAGCN/Model.py:7-19)."""
    c = jnp.cumsum(feats, axis=1)
    return c / jnp.sqrt(jnp.clip(jnp.abs(c), 1e-12, None))


def sagcn_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, num_patch, patch_size) -> (B, num_patch, 40), L2-normalized over
    (patch, feature) per sample (models/SAGCN/Model.py:60-72)."""
    b, t, p = x.shape
    flat = x.reshape(b * t, p)
    feats = jnp.concatenate(
        [temporal_features_12(flat), frequency_features_8(flat)], axis=-1)
    feats = feats.reshape(b, t, -1)
    feats = jnp.concatenate([feats, cumulative_features(feats)], axis=-1)
    norm = jnp.sqrt(jnp.sum(feats * feats, axis=(1, 2), keepdims=True))
    return feats / norm


def st_gcn_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L) -> (B, 10) — reference models/ST_GCN/Model.py:7-52."""
    max_v = jnp.max(x, axis=1)
    min_v = jnp.min(x, axis=1)
    ptp_v = max_v - min_v
    var_v = _var_unbiased(x, axis=1)
    std_v = _std_unbiased(x, axis=1)
    mean_v = jnp.mean(x, axis=1)
    rms_v = jnp.sqrt(jnp.mean(x * x, axis=1))
    mean_abs = jnp.mean(jnp.abs(x), axis=1)
    z = (x - mean_v[..., None]) / std_v[..., None]
    skew_v = jnp.mean(z ** 3, axis=1)
    kurt_v = jnp.mean(z ** 4, axis=1) - 3.0
    return jnp.stack([max_v, min_v, ptp_v, var_v, std_v, mean_v, rms_v,
                      mean_abs, skew_v, kurt_v], axis=-1)


def gat_lstm_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, m) -> (B, 11) — reference models/GAT_LSTM/Model.py:8-72
    (including its idiosyncratic skew/kurtosis coefficients)."""
    m = x.shape[-1]
    mean_v = jnp.mean(x, axis=-1)
    std_v = _std_unbiased(x)
    rms_amp = jnp.mean(jnp.sqrt(jnp.abs(x)), axis=-1) ** 2
    rms_v = jnp.sqrt(jnp.mean(x * x, axis=-1))
    ptp_v = 0.5 * (jnp.max(x, axis=-1) - jnp.min(x, axis=-1))
    diff = x - mean_v[..., None]
    skew_c = m / ((m - 1) * (m - 2))
    skew_v = skew_c * jnp.sum(diff ** 3, axis=-1) / (std_v ** 3)
    kurt_c = (m * (m + 1) - 3 * (m - 1) ** 3) / ((m - 1) * (m - 2) * (m - 3))
    kurt_v = kurt_c * jnp.sum(diff ** 4, axis=-1) / (std_v ** 4)
    abs_max = jnp.max(jnp.abs(x), axis=-1)
    mean_abs = jnp.mean(jnp.abs(x), axis=-1)
    crest = abs_max / rms_v
    clearance = abs_max / rms_amp
    shape_f = rms_v / mean_abs
    impulse = abs_max / mean_abs
    return jnp.stack([mean_v, std_v, rms_amp, rms_v, ptp_v, skew_v, kurt_v,
                      crest, clearance, shape_f, impulse], axis=-1)


def sed_features(x: jnp.ndarray, interval: int, band_width: int) -> jnp.ndarray:
    """Spectral energy difference (B, L) -> (B, (L-interval)//band_width)
    — reference models/STMSGCN/Model.py:7-31."""
    b = x.shape[0]
    spec = jnp.fft.fft(_fft_f32(x), axis=-1)
    sd = spec[:, interval:] - spec[:, :-interval]
    sq = (sd.real ** 2 + sd.imag ** 2).astype(x.dtype)
    return jnp.sum(sq.reshape(b, -1, band_width), axis=-1)

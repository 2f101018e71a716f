"""Core DSP primitives in JAX: FFT resampling, framing, RMS energy, dB
conversion, and Savitzky-Golay filtering.

These replace the scipy/librosa calls of the reference audio pipeline
(/root/reference/code/feature_extraction/audio_utils.py) with jit-compilable
ops validated against scipy in tests:

* ``resample_fourier`` == ``scipy.signal.resample`` (FFT method, including the
  optional spectral window and Nyquist-bin handling)
* ``savgol_filter`` == ``scipy.signal.savgol_filter(..., mode='interp')`` —
  interior convolution plus exact polynomial edge fits, built from static
  host-side coefficient matrices
* ``rms_frames`` / ``amplitude_to_db`` == librosa.feature.rms +
  librosa.amplitude_to_db defaults
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Fourier resampling (scipy.signal.resample semantics)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num", "window"))
def resample_fourier(x, num: int, window: str | None = None):
    """Resample real input along axis 0 to ``num`` samples via the FFT method.

    Matches scipy.signal.resample's rfft path exactly: optional spectral
    window (fftshifted symmetric window, folded onto the half spectrum),
    truncate to min(num, nx) bins, double/halve the unpaired Nyquist bin, and
    inverse-FFT scaled by num/nx.
    """
    x = jnp.asarray(x)
    nx = x.shape[0]
    m = min(num, nx)
    m2 = m // 2 + 1
    X = jnp.fft.rfft(x, axis=0)
    n_half = X.shape[0]

    if window is not None:
        w = jnp.fft.fftshift(_get_window(window, nx))
        # fold the two-sided window onto the one-sided spectrum
        w = w.at[1:n_half].set((w[1:n_half] + w[:-n_half:-1]) / 2.0)
        w = w[:n_half]
        if x.ndim > 1:
            w = w.reshape((-1,) + (1,) * (x.ndim - 1))
        X = X * w

    X = X[:m2]
    if m % 2 == 0 and num != nx:
        X = X.at[m // 2].multiply(2.0 if num < nx else 0.5)

    return jnp.fft.irfft(X * (float(num) / float(nx)), n=num, axis=0)


def _get_window(name: str, n: int):
    """Symmetric windows used by the pipeline (host-static)."""
    import scipy.signal

    return jnp.asarray(scipy.signal.get_window(name, n, fftbins=False),
                       jnp.float32)


# ---------------------------------------------------------------------------
# Framing / energy
# ---------------------------------------------------------------------------

def frame_signal(x, frame_length: int, hop_length: int, *, center=True,
                 pad_mode="constant"):
    """[T] -> [n_frames, frame_length]; librosa-style centered framing."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, (pad, pad), mode=pad_mode)
    n_frames = 1 + (x.shape[0] - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return x[idx]


def rms_frames(x, frame_length: int, hop_length: int):
    """librosa.feature.rms defaults: centered frames, constant padding."""
    frames = frame_signal(x, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(frames ** 2, axis=1))


def amplitude_to_db(s, *, ref=1.0, amin=1e-5, top_db=80.0):
    """librosa.amplitude_to_db: 20*log10(max(amin,|s|)) - 20*log10(ref),
    floored at (max - top_db)."""
    magnitude = jnp.abs(s)
    power_db = 20.0 * jnp.log10(jnp.maximum(amin, magnitude))
    power_db = power_db - 20.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        power_db = jnp.maximum(power_db, jnp.max(power_db) - top_db)
    return power_db


# ---------------------------------------------------------------------------
# Savitzky-Golay
# ---------------------------------------------------------------------------

def _savgol_matrices(window_length: int, polyorder: int):
    """Host-side: (conv coefficients [win], edge fit matrix [win, win]).

    The edge matrix maps the first ``win`` samples to the polynomial-fit
    values at positions 0..win-1 (scipy mode='interp' evaluates the LSQ poly
    fitted to the edge window)."""
    import scipy.signal

    # deriv=0 savgol smoothing kernels are symmetric, so correlation and
    # convolution coincide
    coeffs = scipy.signal.savgol_coeffs(window_length, polyorder)
    # LSQ poly fit: x_fit = V (V^T V)^-1 V^T x over the window
    t = np.arange(window_length, dtype=np.float64)
    V = np.vander(t, polyorder + 1, increasing=True)
    proj = V @ np.linalg.pinv(V)
    return (jnp.asarray(coeffs.copy(), jnp.float32),
            jnp.asarray(proj, jnp.float32))


def savgol_filter(x, window_length: int, polyorder: int):
    """scipy.signal.savgol_filter(..., mode='interp') along axis 0.

    x: [T] or [T, D]; T must be >= window_length.
    """
    coeffs, edge_proj = _savgol_matrices(window_length, polyorder)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    t = x.shape[0]
    half = window_length // 2

    # interior via correlation with the (symmetric) savgol kernel
    idx = jnp.arange(t - window_length + 1)[:, None] + jnp.arange(window_length)
    interior = jnp.einsum("w,twd->td", coeffs, x[idx])  # value at window centers

    head = edge_proj[:half] @ x[:window_length]
    tail = edge_proj[window_length - half:] @ x[-window_length:]
    out = jnp.concatenate([head, interior, tail], axis=0)
    return out[:, 0] if squeeze else out

"""MFCC extraction in JAX, formula-compatible with ``python_speech_features``
as the reference uses it (audio_utils.py:209-235: 26 cepstra, 20 ms window,
10 ms step, NFFT 1024, then Fourier-resampled to the video frame count).

python_speech_features defaults replicated: preemphasis 0.97, rectangular
window, power spectrum |FFT|^2/NFFT, 26 triangular mel filters over
[0, fs/2] (HTK mel formula 2595*log10(1+f/700)), log filterbank energies
(eps-floored), orthonormal DCT-II, ceplifter 22, first coefficient replaced
with log total frame energy (appendEnergy=True).

Everything is jit-compiled and batched over frames on the TPU — the whole
utterance is one ``[n_frames, nfft]`` FFT batch instead of a per-frame Python
loop.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


def mel_filterbank(nfilt: int, nfft: int, samplerate: float,
                   lowfreq: float = 0.0, highfreq: float | None = None):
    """[nfilt, nfft//2+1] triangular filters (python_speech_features.get_filterbanks)."""
    highfreq = highfreq or samplerate / 2.0
    mels = np.linspace(hz_to_mel(lowfreq), hz_to_mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel_to_hz(mels) / samplerate).astype(int)

    fbank = np.zeros((nfilt, nfft // 2 + 1), np.float64)
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank


def _lifter_coeffs(numcep: int, ceplifter: int = 22):
    n = np.arange(numcep)
    return 1.0 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter)


def _dct2_ortho_matrix(n_in: int, n_out: int):
    """Orthonormal DCT-II matrix [n_out, n_in] (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    i = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2.0 * n_in))
    m *= np.sqrt(2.0 / n_in)
    m[0] *= 1.0 / math.sqrt(2.0)
    return m


@partial(jax.jit, static_argnames=("samplerate", "winlen", "winstep", "numcep",
                                   "nfilt", "nfft", "preemph", "ceplifter",
                                   "append_energy"))
def mfcc_jax(signal, *, samplerate: int, winlen: float = 0.02,
             winstep: float = 0.01, numcep: int = 26, nfilt: int = 26,
             nfft: int = 1024, preemph: float = 0.97, ceplifter: int = 22,
             append_energy: bool = True):
    """[T] samples -> [n_frames, numcep] MFCCs."""
    signal = jnp.asarray(signal, jnp.float32)

    # preemphasis: y[0]=x[0], y[t]=x[t]-a*x[t-1]
    emph = jnp.concatenate([signal[:1], signal[1:] - preemph * signal[:-1]])

    frame_len = int(round(winlen * samplerate))
    frame_step = int(round(winstep * samplerate))
    slen = emph.shape[0]
    if slen <= frame_len:
        n_frames = 1
    else:
        n_frames = 1 + int(math.ceil((slen - frame_len) / frame_step))
    pad_len = (n_frames - 1) * frame_step + frame_len
    padded = jnp.concatenate([emph, jnp.zeros(pad_len - slen, emph.dtype)])

    idx = (jnp.arange(n_frames)[:, None] * frame_step
           + jnp.arange(frame_len)[None, :])
    frames = padded[idx]                                   # [N, frame_len]

    spec = jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=1))   # [N, nfft//2+1]
    pspec = (1.0 / nfft) * spec ** 2

    energy = jnp.sum(pspec, axis=1)
    energy = jnp.where(energy == 0, np.finfo(np.float32).eps, energy)

    fb = jnp.asarray(mel_filterbank(nfilt, nfft, samplerate), jnp.float32)
    feat = pspec @ fb.T
    feat = jnp.where(feat == 0, np.finfo(np.float32).eps, feat)
    logfeat = jnp.log(feat)

    dct_m = jnp.asarray(_dct2_ortho_matrix(nfilt, nfilt), jnp.float32)
    ceps = (logfeat @ dct_m.T)[:, :numcep]

    lift = jnp.asarray(_lifter_coeffs(numcep, ceplifter), jnp.float32)
    ceps = ceps * lift

    if append_energy:
        ceps = ceps.at[:, 0].set(jnp.log(energy))
    return ceps


def extract_mfcc_to_frames(signal, samplerate: int, nb_frames: int,
                           num_cep: int = 26, window_length: float = 0.02,
                           window_step: float = 0.01, nfft: int = 1024):
    """The reference's extract_mfcc unit (audio_utils.py:209-235): MFCC at
    10 ms hop, then Fourier-resampled to the video frame count."""
    from lets_face_it_tpu.features.dsp import resample_fourier

    feats = mfcc_jax(signal, samplerate=samplerate, winlen=window_length,
                     winstep=window_step, numcep=num_cep, nfft=nfft)
    return resample_fourier(feats, nb_frames)

"""Prosodic features (pitch + intensity) in JAX, replacing the reference's
Praat/parselmouth dependency (audio_utils.py:20-99).

Pitch follows Boersma (1993), the algorithm behind Praat's ``to_pitch``:
per frame, subtract the local mean, apply a Hanning window, estimate the
normalized autocorrelation r_x = r_xw / r_w (dividing out the window's own
autocorrelation), refine each local maximum by band-limited (sinc)
interpolation on a fine lag grid, pick the strongest candidates against a
voicing threshold, then Viterbi path-smooth across frames with octave/jump
costs. Intensity is Praat's ``To Intensity``: dB SPL re 2e-5 of the
mean-square pressure under a Kaiser-20 window of physical duration
6.4/min_pitch (effective 3.2/min_pitch).

Frame layout matches Praat: a comb of ``window_dur``-long frames at
``time_step`` spacing, centered as a whole in the sound; tracks are then
sampled at the reference's query times by linear interpolation (Praat's
``Get value at time``), voiced-aware for pitch. All layout arithmetic is
static (shapes only), so the per-frame analysis is one batched
``[n_frames, window]`` FFT autocorrelation on the TPU and the Viterbi
smoothing a ``lax.scan`` over frames.

Golden-file parity vs an independently written NumPy Praat
re-implementation (tools/praat_golden.py) is asserted in
tests/test_prosody_parity.py; measured residuals are recorded in PARITY.md.

The derivative/stacking/resampling driver matches audio_utils.py:49-99.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.features.dsp import resample_fourier

# Praat-like defaults
PITCH_FLOOR = 75.0
PITCH_CEILING = 600.0
VOICING_THRESHOLD = 0.45
SILENCE_THRESHOLD = 0.03
OCTAVE_COST = 0.01
OCTAVE_JUMP_COST = 0.35
VOICED_UNVOICED_COST = 0.14
N_CANDIDATES = 15

_SINC_HALF_WIDTH = 8    # autocorrelation samples each side of a peak
_SINC_UPSAMPLE = 16     # fine-grid points per lag sample


def praat_frame_layout(n_samples: int, fs: float, window_dur: float,
                       time_step: float):
    """Praat's centered frame layout: as many ``window_dur`` frames as fit at
    ``time_step`` spacing, the whole comb centered in the sound. Returns
    (frame start indices [N] np.int32, frame center times [N] np.float64,
    frame_len) — all static, computed at trace time."""
    duration = n_samples / fs
    frame_len = int(round(window_dur * fs))
    if n_samples < frame_len:
        # Without this guard the clipped start indices would make the JAX
        # gather run past the signal end, silently repeating the final
        # sample (index clamping) — define short-input behavior explicitly
        # instead (Praat likewise reports "sound too short" for the AC
        # method when less than one analysis window fits).
        raise ValueError(
            f"sound too short for the analysis window: {n_samples} samples "
            f"< {frame_len} ({window_dur:.4f}s at fs={fs})")
    n_frames = int(np.floor((duration - window_dur) / time_step)) + 1
    n_frames = max(n_frames, 1)
    t_mid_first = 0.5 * (duration - (n_frames - 1) * time_step)
    centers = t_mid_first + np.arange(n_frames) * time_step
    starts = np.round(centers * fs - frame_len / 2).astype(np.int64)
    starts = np.clip(starts, 0, max(n_samples - frame_len, 0))
    return starts.astype(np.int32), centers, frame_len


@partial(jax.jit, static_argnames=("fs", "time_step", "floor", "ceiling"))
def pitch_candidates(x, *, fs: int, time_step: float = 0.05,
                     floor: float = PITCH_FLOOR, ceiling: float = PITCH_CEILING):
    """Per-frame pitch candidates via windowed autocorrelation with sinc
    peak refinement.

    Returns (freqs [N, C], strengths [N, C], local_peak [N]) where candidate
    0 is "unvoiced". Window = 3 periods of the pitch floor (Boersma's choice
    for the AC method), frames Praat-centered (``pitch_frame_centers`` gives
    their times).
    """
    x = jnp.asarray(x, jnp.float32)
    starts, _, frame_len = praat_frame_layout(
        x.shape[0], fs, 3.0 / floor, time_step)
    n_frames = len(starts)
    nfft = int(2 ** np.ceil(np.log2(frame_len * 2)))

    idx = jnp.asarray(starts)[:, None] + jnp.arange(frame_len)[None, :]
    frames = x[idx]                                    # [N, L]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    # local (frame) peak amplitude relative to global, for the silence test
    global_peak = jnp.max(jnp.abs(x - jnp.mean(x))) + 1e-12
    local_peak = jnp.max(jnp.abs(frames), axis=1)
    local_intensity = local_peak / global_peak

    win = jnp.asarray(np.hanning(frame_len), jnp.float32)
    xw = frames * win

    # normalized autocorrelation r_x(t) = r_xw(t) / r_w(t)
    spec = jnp.fft.rfft(xw, n=nfft, axis=1)
    r_xw = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=1)[:, :frame_len]
    r_xw = r_xw / (r_xw[:, :1] + 1e-12)
    wspec = jnp.fft.rfft(win, n=nfft)
    r_w = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[:frame_len]
    r_w = r_w / r_w[0]
    r = r_xw / (r_w[None, :] + 1e-12)                  # [N, L]

    min_lag = int(np.floor(fs / ceiling))
    max_lag = int(np.ceil(fs / floor))
    max_lag = min(max_lag, frame_len - 1)
    lags = jnp.arange(frame_len)

    # local maxima of r within [min_lag, max_lag]
    is_peak = ((r > jnp.roll(r, 1, axis=1)) & (r >= jnp.roll(r, -1, axis=1))
               & (lags[None, :] >= min_lag) & (lags[None, :] <= max_lag))
    peak_strength = jnp.where(is_peak, r, -jnp.inf)

    # top C-1 voiced candidates per frame (by unrefined peak height)
    top = jax.lax.top_k(peak_strength, N_CANDIDATES - 1)
    found = jnp.isfinite(top[0])                       # [N, C-1]
    lag_int = top[1]                                   # [N, C-1] integer lags

    # band-limited (sinc) refinement: evaluate r on a fine grid spanning
    # lag +- 1 sample from the +-HALF_WIDTH integer-lag neighbourhood. The
    # sinc weight matrix depends only on (fine offset - support offset), so
    # it is one constant [F, S] matmul for every candidate of every frame.
    offsets = np.arange(-_SINC_HALF_WIDTH, _SINC_HALF_WIDTH + 1)
    rel = np.linspace(-1.0, 1.0, 2 * _SINC_UPSAMPLE + 1)
    weights = jnp.asarray(np.sinc(rel[:, None] - offsets[None, :]),
                          jnp.float32)                 # [F, S]
    support = jnp.clip(lag_int[..., None] + jnp.asarray(offsets),
                       0, frame_len - 1)               # [N, C-1, S]
    sup_vals = jnp.take_along_axis(
        jnp.broadcast_to(r[:, None, :], (n_frames,) + support.shape[1:-1]
                         + (frame_len,)),
        support, axis=2)                               # [N, C-1, S]
    fine = jnp.einsum("fs,ncs->ncf", weights, sup_vals)  # [N, C-1, F]
    k_best = jnp.argmax(fine, axis=-1)
    lag_ref = lag_int + jnp.asarray(rel, jnp.float32)[k_best]
    str_ref = jnp.take_along_axis(fine, k_best[..., None], axis=-1)[..., 0]

    cand_freq = jnp.where(found, fs / jnp.maximum(lag_ref, 1e-6), 0.0)
    in_range = (cand_freq >= floor) & (cand_freq <= ceiling) & (str_ref > 0)
    cand_str = jnp.where(
        found & in_range,
        jnp.minimum(str_ref, 1.0) - OCTAVE_COST * jnp.log2(
            jnp.maximum(ceiling / jnp.maximum(cand_freq, 1e-6), 1e-6)),
        -1e30)
    cand_freq = jnp.where(found & in_range, cand_freq, 0.0)

    # unvoiced candidate strength (Boersma eq. 23): the silence term compares
    # local/global peak against silence_threshold / (1 + voicing_threshold)
    unvoiced = (VOICING_THRESHOLD
                + jnp.maximum(0.0, 2.0 - local_intensity
                              * (1.0 + VOICING_THRESHOLD)
                              / SILENCE_THRESHOLD))
    freqs = jnp.concatenate([jnp.zeros((n_frames, 1)), cand_freq], axis=1)
    strengths = jnp.concatenate([unvoiced[:, None], cand_str], axis=1)
    return freqs, strengths, local_peak


def pitch_frame_centers(n_samples: int, fs: float, time_step: float = 0.05,
                        floor: float = PITCH_FLOOR) -> np.ndarray:
    """Center times of ``pitch_candidates``' frames."""
    _, centers, _ = praat_frame_layout(n_samples, fs, 3.0 / floor, time_step)
    return centers


@jax.jit
def viterbi_pitch(freqs, strengths):
    """Path-smoothed pitch track: maximize sum of strengths minus transition
    costs (octave jumps, voiced/unvoiced switches). Returns f0 [N] (0 where
    unvoiced)."""
    n, c = freqs.shape

    def transition_cost(f_prev, f_next):
        both_voiced = (f_prev > 0) & (f_next > 0)
        switch = (f_prev > 0) != (f_next > 0)
        jump = jnp.where(
            both_voiced,
            OCTAVE_JUMP_COST * jnp.abs(jnp.log2(
                jnp.maximum(f_prev, 1e-6) / jnp.maximum(f_next, 1e-6))),
            0.0)
        return jump + jnp.where(switch, VOICED_UNVOICED_COST, 0.0)

    def step(carry, inp):
        score_prev, f_prev = carry
        f_t, s_t = inp
        trans = transition_cost(f_prev[:, None], f_t[None, :])  # [C, C]
        total = score_prev[:, None] - trans + s_t[None, :]
        best_prev = jnp.argmax(total, axis=0)
        score = jnp.max(total, axis=0)
        return (score, f_t), best_prev

    (final_score, _), backptr = jax.lax.scan(
        step, (strengths[0], freqs[0]), (freqs[1:], strengths[1:]))

    # backtrack: backptr[t][j] = best candidate at frame t given candidate j
    # at frame t+1; scanning in reverse emits the index at frame t+1 and the
    # final carry is the index at frame 0
    last = jnp.argmax(final_score)

    def back(carry, bp):
        idx = carry
        prev = bp[idx]
        return prev, idx

    first, tail = jax.lax.scan(back, last, backptr, reverse=True)
    path = jnp.concatenate([first[None], tail])
    return jnp.take_along_axis(freqs, path[:, None], axis=1)[:, 0]


@partial(jax.jit, static_argnames=("fs", "time_step", "min_pitch"))
def intensity_db(x, *, fs: int, time_step: float = 0.05,
                 min_pitch: float = 100.0):
    """Praat's ``To Intensity``: dB re 2e-5 of mean-square amplitude under a
    Kaiser-20 window (beta = 2*pi^2 + 0.5, sidelobes < -190 dB) of physical
    duration 6.4/min_pitch — effective duration 3.2/min_pitch — on
    Praat-centered frames (``intensity_frame_centers``)."""
    x = jnp.asarray(x, jnp.float32)
    starts, _, frame_len = praat_frame_layout(
        x.shape[0], fs, 6.4 / min_pitch, time_step)
    idx = jnp.asarray(starts)[:, None] + jnp.arange(frame_len)[None, :]
    frames = x[idx]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    win = jnp.asarray(np.kaiser(frame_len, 2.0 * np.pi * np.pi + 0.5),
                      jnp.float32)
    power = jnp.sum(frames ** 2 * win, axis=1) / jnp.sum(win)
    return 10.0 * jnp.log10(jnp.maximum(power, 1e-30) / (2e-5 ** 2))


def intensity_frame_centers(n_samples: int, fs: float,
                            time_step: float = 0.05,
                            min_pitch: float = 100.0) -> np.ndarray:
    """Center times of ``intensity_db``'s frames."""
    _, centers, _ = praat_frame_layout(n_samples, fs, 6.4 / min_pitch,
                                       time_step)
    return centers


def _sample_track(centers, values, query, voiced_aware: bool):
    """Praat ``Get value at time``: linear interpolation between frame
    centers, 0 outside the track. For pitch, a query strictly between a
    voiced and an unvoiced frame is unvoiced (interpolating across the
    boundary is meaningless), but a query ON a frame center (0.1 ms
    tolerance, edges included) takes that frame's own value — Praat
    reports the frame, neighbours regardless. The reference then
    nan_to_num's Praat's NaNs to 0 (audio_utils.py:29-35).

    Runs on the HOST in float64: the time grids of an hour-long session
    cannot be represented in float32 at sub-tolerance precision (one f32
    ulp at t = 2000 s is 0.24 ms), and this is trivial [N]-length work —
    only the per-frame analysis above belongs on the accelerator."""
    centers = np.asarray(centers, np.float64)
    values = np.asarray(values, np.float64)
    query = np.asarray(query, np.float64)
    out = np.interp(query, centers, values)
    idx = np.clip(np.searchsorted(centers, query), 1, len(centers) - 1)
    on_left = np.abs(query - centers[idx - 1]) < 1e-4
    on_right = np.abs(query - centers[idx]) < 1e-4
    if voiced_aware:
        either_unvoiced = (values[idx - 1] <= 0) | (values[idx] <= 0)
        out = np.where(
            on_left, values[idx - 1],
            np.where(on_right, values[idx],
                     np.where(either_unvoiced, 0.0, out)))
    else:
        out = np.where(on_left, values[idx - 1],
                       np.where(on_right, values[idx], out))
    inside = ((query >= centers[0]) & (query <= centers[-1])) | on_left | on_right
    return np.where(inside, out, 0.0)


def compute_prosody(x, fs: int, time_step: float = 0.05):
    """Pitch + intensity tracks sampled like the reference's
    ``compute_prosody`` (audio_utils.py:20-46): query times
    arange(0, duration - time_step, time_step), linear interpolation from the
    Praat-centered analysis frames, Chiu'11 log-normalization."""
    n_samples = int(np.asarray(x).shape[0])
    duration = n_samples / fs
    query = np.arange(0, duration - time_step, time_step)

    freqs, strengths, _ = pitch_candidates(x, fs=fs, time_step=time_step)
    f0 = viterbi_pitch(freqs, strengths)
    inten = intensity_db(x, fs=fs, time_step=time_step)

    pitch_values = _sample_track(
        pitch_frame_centers(n_samples, fs, time_step), f0, query,
        voiced_aware=True)
    intensity_values = _sample_track(
        intensity_frame_centers(n_samples, fs, time_step), inten, query,
        voiced_aware=False)

    intensity_values = np.clip(intensity_values, np.finfo(np.float32).eps,
                               None)
    pitch_norm = jnp.asarray(
        np.clip(np.log(pitch_values + 1.0) - 4.0, 0.0, None), jnp.float32)
    intensity_norm = jnp.asarray(
        np.clip(np.log(intensity_values) - 3.0, 0.0, None), jnp.float32)
    return pitch_norm, intensity_norm


def _derivative(f, dx_ms: float):
    """Finite difference as the reference computes it (audio_utils.py:49-69):
    convolve with [1, -1]/dx, first element zeroed."""
    cf = (jnp.concatenate([f, jnp.zeros(1)])
          - jnp.concatenate([jnp.zeros(1), f])) / dx_ms
    der = cf[:-1]
    return der.at[0].set(0.0)


def extract_prosodic_features(x, fs: int, nb_frames: int,
                              time_step: float = 0.02):
    """4-D prosody stacked and resampled to the video frame count
    (audio_utils.py:72-99): [energy, energy', pitch, pitch'] -> [nb_frames, 4]."""
    pitch, energy = compute_prosody(x, fs, time_step)
    dx_ms = time_step * 1000.0
    energy_der = _derivative(energy, dx_ms)
    pitch_der = _derivative(pitch, dx_ms)
    feats = jnp.stack([energy, energy_der, pitch, pitch_der], axis=1)
    return resample_fourier(feats, nb_frames)

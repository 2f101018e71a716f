"""Crosstalk voice-activity detection (reference audio_utils.py:144-188):
per-channel 100 Hz RMS energy in dB; a channel is "active alone" when it is
above an absolute threshold AND above the other channel by a margin; the
boolean track is savgol-smoothed, Fourier-resampled (hamming spectral window)
to the video frame count, and binarized at 0.1."""

from __future__ import annotations

import jax.numpy as jnp

from lets_face_it_tpu.features.dsp import (
    amplitude_to_db,
    resample_fourier,
    rms_frames,
    savgol_filter,
)


def crosstalk_vad(x1, x2, fs: int, frame_count: int, *, tha: float = 30.0,
                  thb: float = 5.0, savgol_win: int = 301,
                  savgol_poly_order: int = 1, sample_scale: float = 32768.0):
    """Returns (s1 [frame_count], s2 [frame_count]) binary activity tracks.

    tha: absolute dB level for channel activity; thb: minimum dB difference
    between channels to attribute speech to one speaker only. The reference's
    30 dB threshold assumes int16-scale samples (it feeds ``wav.read`` output
    straight to librosa, audio_utils.py:158-170); ``sample_scale`` restores
    that scale for callers passing [-1, 1]-normalized audio.
    """
    x1 = jnp.asarray(x1, jnp.float32) * sample_scale
    x2 = jnp.asarray(x2, jnp.float32) * sample_scale

    frame_length = int(fs * 0.02)
    hop_length = int(fs * 0.01)
    e1 = amplitude_to_db(rms_frames(x1, frame_length, hop_length))
    e2 = amplitude_to_db(rms_frames(x2, frame_length, hop_length))

    s1 = ((e1 > tha) & (e1 > e2 + thb)).astype(jnp.float32)
    s2 = ((e2 > tha) & (e2 > e1 + thb)).astype(jnp.float32)

    smooth_s1 = savgol_filter(s1, savgol_win, savgol_poly_order)
    smooth_s2 = savgol_filter(s2, savgol_win, savgol_poly_order)

    s1x = jnp.clip(resample_fourier(smooth_s1, frame_count, window="hamming"),
                   0.0, 1.0)
    s2x = jnp.clip(resample_fourier(smooth_s2, frame_count, window="hamming"),
                   0.0, 1.0)

    s1x = jnp.where(s1x >= 0.1, 1.0, 0.0)
    s2x = jnp.where(s2x >= 0.1, 1.0, 0.0)
    return s1x, s2x

"""Golden-file Praat parity for the JAX prosody path (BASELINE config 2).

The fixture (tests/fixtures/prosody_golden.npz, regenerate with
tools/make_prosody_golden.py) holds a deterministic synthetic speech-like
utterance — three voiced syllables with distinct f0 contours, a fricative,
pauses — plus golden pitch/intensity tracks. Golden provenance is recorded
in the file: real parselmouth/Praat when available, otherwise
tools/praat_golden.py, an independent from-paper (Boersma 1993) NumPy
implementation that shares no code with lets_face_it_tpu/features/prosody.py
(Praat-centered frames, sinc peak refinement, plain-Python Viterbi).

Reference semantics: code/feature_extraction/audio_utils.py:20-99.
Measured deviations are recorded in PARITY.md.
"""

from pathlib import Path

import numpy as np
import pytest

from lets_face_it_tpu.features.prosody import (
    PITCH_FLOOR,
    compute_prosody,
    intensity_db,
    pitch_candidates,
    viterbi_pitch,
)

FIXTURE = Path(__file__).parent / "fixtures" / "prosody_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def _golden_f0_at(times, golden_times, golden_f0):
    """Voiced-aware linear sampling of the golden pitch track: a query
    between a voiced and an unvoiced golden frame is unvoiced."""
    f0 = np.interp(times, golden_times, golden_f0)
    idx = np.searchsorted(golden_times, times).clip(1, len(golden_times) - 1)
    either_unvoiced = (golden_f0[idx - 1] <= 0) | (golden_f0[idx] <= 0)
    return np.where(either_unvoiced, 0.0, f0)


def test_pitch_track_matches_golden(golden):
    x, fs = golden["wav"], int(golden["fs"])
    step = float(golden["time_step"])

    freqs, strengths, _ = pitch_candidates(x, fs=fs, time_step=step)
    f0 = np.asarray(viterbi_pitch(freqs, strengths))
    # our frames start at i*step and span 3 pitch-floor periods; compare at
    # frame centers against the golden (Praat-centered) track
    centers = np.arange(len(f0)) * step + (3.0 / PITCH_FLOOR) / 2
    f0_gold = _golden_f0_at(centers, golden["pitch_times"], golden["f0_hz"])

    voiced, voiced_gold = f0 > 0, f0_gold > 0
    agreement = (voiced == voiced_gold).mean()
    assert agreement >= 0.95, f"voicing agreement {agreement:.3f}"

    both = voiced & voiced_gold
    assert both.sum() > 100, "fixture must contain substantial voiced speech"
    cents = 1200 * np.abs(np.log2(f0[both] / f0_gold[both]))
    # measured on the checked-in fixture: median 1.7 / p95 4.3 / max 8.1
    assert np.median(cents) < 5.0, f"median {np.median(cents):.2f} cents"
    assert np.percentile(cents, 95) < 15.0
    assert cents.max() < 40.0


def test_intensity_matches_golden(golden):
    x, fs = golden["wav"], int(golden["fs"])
    step = float(golden["time_step"])

    inten = np.asarray(intensity_db(x, fs=fs, time_step=step))
    centers = np.arange(len(inten)) * step + (3.2 / 100.0) / 2
    gold = np.interp(centers, golden["intensity_times"],
                     golden["intensity_db"])

    # compare where speech is active; window-support differences dominate at
    # onsets/offsets, so steady-state parity is the meaningful statement
    active = gold > gold.max() - 25.0
    diff = np.abs(inten - gold)[active]
    # measured: median 0.03 / p95 0.41 dB (max ~15 dB at onset edges)
    assert np.median(diff) < 0.5, f"median {np.median(diff):.2f} dB"
    assert np.percentile(diff, 90) < 2.0


def test_normalized_prosody_matches_golden_driver(golden):
    """End-to-end compute_prosody (Chiu'11-normalized pitch+energy) against
    the golden tracks pushed through the same reference driver math."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from praat_golden import compute_prosody_golden

    x, fs = golden["wav"], int(golden["fs"])
    step = float(golden["time_step"])

    pitch_g, inten_g = compute_prosody_golden(np.asarray(x, np.float64),
                                              fs, step)
    pitch_j, inten_j = map(np.asarray, compute_prosody(x, fs, step))

    n = min(len(pitch_g), len(pitch_j))
    assert abs(len(pitch_g) - len(pitch_j)) <= 1
    # boundary frames flip voicing (pitch_norm 0 <-> ~1), so assert on the
    # bulk statistics; measured mean|d| = 0.032 on a ~1.2 scale
    dp = np.abs(pitch_j[:n] - pitch_g[:n])
    di = np.abs(inten_j[:n] - inten_g[:n])
    assert dp.mean() < 0.08, f"pitch_norm mean |diff| {dp.mean():.4f}"
    assert di.mean() < 0.08, f"intensity_norm mean |diff| {di.mean():.4f}"
    assert np.percentile(dp, 90) < 0.1
    assert np.percentile(di, 90) < 0.1

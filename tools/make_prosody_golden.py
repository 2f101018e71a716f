"""Generate the prosody parity golden file (tests/fixtures/prosody_golden.npz).

Synthesizes a deterministic, redistributable speech-like utterance (glottal
pulse train through formant resonators, with f0 contours, jitter, a
fricative, and pauses) and records golden pitch/intensity tracks for it.

Golden source, best available:
  1. parselmouth (real Praat) if importable — the authoritative target
     (reference audio_utils.py:20-46 uses it directly);
  2. otherwise tools/praat_golden.py, an independent from-paper NumPy
     implementation (provenance recorded in the file).

Usage: python tools/make_prosody_golden.py [out.npz]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from scipy.signal import lfilter

sys.path.insert(0, str(Path(__file__).resolve().parent))

FS = 16000
TIME_STEP = 0.02  # the pipeline's extract_prosodic_features step


def _formant_filter(excitation: np.ndarray, fs: float,
                    formants=(800.0, 1150.0, 2900.0),
                    bandwidths=(80.0, 90.0, 120.0)) -> np.ndarray:
    y = excitation
    for f, bw in zip(formants, bandwidths):
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * f / fs
        a = [1.0, -2 * r * np.cos(theta), r * r]
        y = lfilter([1.0 - r], a, y)
    return y


def _voiced(fs: float, duration: float, f0_fn, rng: np.random.Generator,
            jitter: float = 0.005, vibrato_hz: float = 4.5,
            vibrato_depth: float = 0.02) -> np.ndarray:
    """Glottal pulse train with a time-varying f0 contour through formants."""
    n = int(duration * fs)
    t = np.arange(n) / fs
    f0 = f0_fn(t / duration)
    f0 = f0 * (1.0 + vibrato_depth * np.sin(2 * np.pi * vibrato_hz * t))
    f0 = f0 * (1.0 + jitter * rng.standard_normal(n))
    phase = np.cumsum(f0) / fs
    # impulse wherever the phase crosses an integer (one pulse per period)
    pulses = np.zeros(n)
    pulses[np.flatnonzero(np.diff(np.floor(phase)) > 0)] = 1.0
    voiced = _formant_filter(pulses, fs)
    voiced = voiced / (np.max(np.abs(voiced)) + 1e-12)
    # soft attack/release so windows at the edges see a natural envelope
    ramp = min(int(0.04 * fs), n // 4)
    env = np.ones(n)
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    return voiced * env


def synth_utterance(fs: int = FS, seed: int = 1234) -> np.ndarray:
    """~6 s utterance: three voiced 'syllables' with distinct f0 contours,
    one unvoiced fricative, separated by pauses."""
    rng = np.random.default_rng(seed)
    silence = lambda d: np.zeros(int(d * fs))
    parts = [
        silence(0.35),
        _voiced(fs, 1.2, lambda u: 110.0 + 45.0 * u, rng),           # rise
        silence(0.25),
        _voiced(fs, 1.0, lambda u: 185.0 - 60.0 * u, rng),           # fall
        silence(0.20),
        # fricative: high-passed noise (unvoiced, but intense)
        _normed(lfilter(*_highpass(2500.0, fs),
                        x=rng.standard_normal(int(0.6 * fs)))) * 0.35,
        silence(0.20),
        _voiced(fs, 1.3, lambda u: 140.0 + 12.0 * np.sin(2 * np.pi * u), rng)
        * np.linspace(1.0, 0.35, int(1.3 * fs)),                     # decay
        silence(0.45),
    ]
    x = np.concatenate(parts)
    x = x / np.max(np.abs(x)) * 0.3
    # tiny noise floor so "silence" is not digitally zero
    x += 1e-5 * rng.standard_normal(len(x))
    return x.astype(np.float32)


def _highpass(fc: float, fs: float):
    from scipy.signal import butter
    return butter(4, fc / (fs / 2), btype="high")


def _normed(x: np.ndarray) -> np.ndarray:
    return x / (np.max(np.abs(x)) + 1e-12)


def _alternating_pulses(fs: float, duration: float, f0: float, alt: float,
                        rng: np.random.Generator) -> np.ndarray:
    """Pulse train at ``f0`` with every other pulse scaled by ``alt`` — a
    strong subharmonic at f0/2, the classic octave-error trap for the
    Viterbi octave/jump costs."""
    n = int(duration * fs)
    pulses = np.zeros(n)
    positions = (np.arange(int(duration * f0)) * fs / f0).astype(int)
    positions = positions[positions < n]
    amps = np.where(np.arange(len(positions)) % 2 == 0, 1.0, alt)
    pulses[positions] = amps
    y = _normed(_formant_filter(pulses, fs))
    ramp = min(int(0.04 * fs), n // 4)
    env = np.ones(n)
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    return y * env


def synth_battery(fs: int = FS, seed: int = 77) -> dict:
    """Decision-boundary battery (round-4 VERDICT item 4): signals stressing
    the 75/600 Hz pitch bounds, the Viterbi octave/jump costs, the silence
    threshold, and additive-noise robustness. All signals share one length
    so the JAX path compiles once."""
    rng = np.random.default_rng(seed)
    dur = 3.2
    n = int(dur * fs)

    def pad_to(x):
        x = np.asarray(x, np.float64)[:n]
        if len(x) < n:
            x = np.pad(x, (0, n - len(x)))
        return x

    sigs = {}
    # f0 ramps hugging the analysis bounds (floor 75 Hz / ceiling 600 Hz)
    sigs["low_ramp"] = pad_to(_voiced(
        fs, dur, lambda u: 78.0 + 22.0 * u, rng, jitter=0.003)) * 0.3
    sigs["high_ramp"] = pad_to(_voiced(
        fs, dur, lambda u: 470.0 + 110.0 * u, rng, jitter=0.003,
        vibrato_depth=0.01)) * 0.3
    # Octave trap: alternating pulse amplitudes put an f0/2 subharmonic
    # candidate in play. The Viterbi octave-cost decision boundary sits
    # between alt=0.85 and alt=0.9 (measured): at 0.9 the tracker must
    # RESIST the trap (true 180 Hz), at 0.55 the waveform genuinely repeats
    # at f0/2 and subharmonic capture (90 Hz) is the correct reading —
    # parity on both sides pins the cost boundary.
    sigs["octave_trap"] = pad_to(
        _alternating_pulses(fs, dur, 180.0, 0.9, rng)) * 0.3
    sigs["period_doubled"] = pad_to(
        _alternating_pulses(fs, dur, 180.0, 0.55, rng)) * 0.3
    # amplitude fade crossing the silence threshold on a steady 150 Hz voice
    fade = np.linspace(1.0, 0.0, n) ** 2
    sigs["silence_fade"] = pad_to(_voiced(
        fs, dur, lambda u: 150.0 + 0.0 * u, rng, jitter=0.002)) * 0.3 * fade
    # creaky: low f0 near the floor with heavy jitter
    sigs["creaky_low"] = pad_to(_voiced(
        fs, dur, lambda u: 90.0 + 5.0 * u, rng, jitter=0.03,
        vibrato_depth=0.0)) * 0.3
    # additive white noise at 2 SNRs on a modulated mid-range vowel
    clean = pad_to(_voiced(
        fs, dur, lambda u: 160.0 + 30.0 * np.sin(2 * np.pi * 1.5 * u), rng,
        jitter=0.004)) * 0.3
    for snr_db in (10, 0):
        noise = rng.standard_normal(n)
        noise *= np.sqrt(np.mean(clean ** 2) / np.mean(noise ** 2)
                         / 10.0 ** (snr_db / 10.0))
        sigs[f"noisy_snr{snr_db}"] = clean + noise
    # tiny noise floor so "silence" is never digitally zero
    return {k: (v + 1e-5 * rng.standard_normal(n)).astype(np.float32)
            for k, v in sigs.items()}


def make_golden_battery(out_path: Path) -> dict:
    """Per-signal golden pitch/intensity tracks for the battery, same
    dual-source policy as ``make_golden`` (parselmouth when importable,
    otherwise the independent NumPy implementation)."""
    sigs = synth_battery()
    data: dict = {"fs": FS, "time_step": TIME_STEP,
                  "names": np.array(sorted(sigs))}
    try:
        import parselmouth as pm

        for name, x in sigs.items():
            snd = pm.Sound(np.asarray(x, np.float64), sampling_frequency=FS)
            pitch = snd.to_pitch(time_step=TIME_STEP)
            intensity = snd.to_intensity(time_step=TIME_STEP)
            data[f"{name}/wav"] = x
            data[f"{name}/f0_hz"] = np.nan_to_num(
                pitch.selected_array["frequency"])
            data[f"{name}/intensity_db"] = intensity.values[0]
        provenance = f"parselmouth {pm.VERSION}"
    except ImportError:
        from praat_golden import intensity_track, pitch_track

        for name, x in sigs.items():
            _, f0 = pitch_track(np.asarray(x, np.float64), FS, TIME_STEP)
            _, inten = intensity_track(np.asarray(x, np.float64), FS,
                                       TIME_STEP)
            data[f"{name}/wav"] = x
            data[f"{name}/f0_hz"] = np.nan_to_num(f0)
            data[f"{name}/intensity_db"] = inten
        provenance = "tools/praat_golden.py (independent NumPy Boersma-1993)"
    data["provenance"] = provenance
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path} ({len(sigs)} signals, golden source: "
          f"{provenance})")
    return data


def make_golden(out_path: Path) -> dict:
    x = synth_utterance()
    try:
        import parselmouth as pm

        snd = pm.Sound(np.asarray(x, np.float64), sampling_frequency=FS)
        pitch = snd.to_pitch(time_step=TIME_STEP)
        intensity = snd.to_intensity(time_step=TIME_STEP)
        pitch_times = pitch.xs()
        f0 = pitch.selected_array["frequency"]
        intensity_times = intensity.xs()
        inten = intensity.values[0]
        provenance = f"parselmouth {pm.VERSION}"
    except ImportError:
        from praat_golden import intensity_track, pitch_track

        pitch_times, f0 = pitch_track(x, FS, TIME_STEP)
        intensity_times, inten = intensity_track(x, FS, TIME_STEP)
        provenance = "tools/praat_golden.py (independent NumPy Boersma-1993)"

    data = dict(
        wav=x, fs=FS, time_step=TIME_STEP,
        pitch_times=pitch_times, f0_hz=np.nan_to_num(f0),
        intensity_times=intensity_times, intensity_db=inten,
        provenance=provenance,
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path} (golden source: {provenance})")
    return data


if __name__ == "__main__":
    fixtures = (Path(__file__).resolve().parent.parent / "tests"
                / "fixtures")
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        fixtures / "prosody_golden.npz")
    make_golden(out)
    make_golden_battery(out.parent / "prosody_battery.npz")

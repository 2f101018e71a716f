"""DSP parity tests: JAX implementations vs scipy references, plus behavioral
checks for the pieces whose upstreams (librosa, python_speech_features,
parselmouth) aren't installable here."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from lets_face_it_tpu.features import audio_io, dsp, mfcc, prosody, vad

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# resample vs scipy.signal.resample
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nx,num", [(1000, 250), (999, 250), (250, 1000),
                                    (1000, 999), (640, 640)])
def test_resample_matches_scipy(nx, num):
    x = RNG.standard_normal((nx, 3)).astype(np.float32)
    ref = scipy.signal.resample(x, num, axis=0)
    got = dsp.resample_fourier(x, num)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_resample_with_window_matches_scipy():
    x = RNG.standard_normal(1200).astype(np.float32)
    ref = scipy.signal.resample(x, 300, window="hamming")
    got = dsp.resample_fourier(x, 300, window="hamming")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# savgol vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("win,poly", [(9, 3), (301, 1), (5, 2)])
def test_savgol_matches_scipy(win, poly):
    t = max(win + 10, 400)
    x = RNG.standard_normal((t, 4)).astype(np.float32)
    ref = scipy.signal.savgol_filter(x, win, poly, axis=0)
    got = dsp.savgol_filter(jnp.asarray(x), win, poly)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)


def test_savgol_1d():
    x = RNG.standard_normal(500).astype(np.float32)
    ref = scipy.signal.savgol_filter(x, 9, 3)
    got = dsp.savgol_filter(jnp.asarray(x), 9, 3)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)


# ---------------------------------------------------------------------------
# MFCC: structural + energy properties (python_speech_features formulas)
# ---------------------------------------------------------------------------

def _psf_reference_mfcc(signal, fs):
    """Independent numpy implementation of python_speech_features.mfcc with
    the reference's arguments, used as the parity target."""
    import scipy.fftpack

    preemph, winlen, winstep, nfft, nfilt, numcep, ceplifter = (
        0.97, 0.02, 0.01, 1024, 26, 26, 22)
    emph = np.append(signal[0], signal[1:] - preemph * signal[:-1])
    flen, fstep = int(round(winlen * fs)), int(round(winstep * fs))
    slen = len(emph)
    n = 1 if slen <= flen else 1 + int(np.ceil((slen - flen) / fstep))
    pad = np.concatenate([emph, np.zeros((n - 1) * fstep + flen - slen)])
    idx = np.arange(n)[:, None] * fstep + np.arange(flen)[None, :]
    frames = pad[idx]
    pspec = (np.abs(np.fft.rfft(frames, nfft, axis=1)) ** 2) / nfft
    energy = np.maximum(pspec.sum(1), np.finfo(np.float64).eps)
    fb = mfcc.mel_filterbank(nfilt, nfft, fs)
    feat = np.maximum(pspec @ fb.T, np.finfo(np.float64).eps)
    ceps = scipy.fftpack.dct(np.log(feat), type=2, axis=1, norm="ortho")[:, :numcep]
    lift = 1 + (ceplifter / 2.0) * np.sin(np.pi * np.arange(numcep) / ceplifter)
    ceps = ceps * lift
    ceps[:, 0] = np.log(energy)
    return ceps


def test_mfcc_matches_psf_formulas():
    fs = 16000
    t = np.arange(fs)  # 1 s
    signal = (0.5 * np.sin(2 * np.pi * 220 * t / fs)
              + 0.1 * RNG.standard_normal(fs)).astype(np.float32)
    ref = _psf_reference_mfcc(signal.astype(np.float64), fs)
    got = mfcc.mfcc_jax(signal, samplerate=fs)
    assert got.shape == ref.shape == (99, 26)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-2, rtol=1e-3)


def test_mfcc_resampled_to_frames():
    fs = 16000
    signal = RNG.standard_normal(fs * 2).astype(np.float32)
    out = mfcc.extract_mfcc_to_frames(signal, fs, nb_frames=50)
    assert out.shape == (50, 26)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Prosody: pitch tracking accuracy on synthetic tones
# ---------------------------------------------------------------------------

def test_pitch_tracks_synthetic_tone():
    fs = 16000
    dur = 2.0
    t = np.arange(int(fs * dur)) / fs
    f0 = 150.0
    # harmonic-rich voiced signal
    x = sum(0.5 / k * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 5))
    x = (x + 0.01 * RNG.standard_normal(len(t))).astype(np.float32)

    freqs, strengths, _ = prosody.pitch_candidates(x, fs=fs, time_step=0.05)
    track = np.asarray(prosody.viterbi_pitch(freqs, strengths))
    voiced = track[track > 0]
    assert len(voiced) > 0.8 * len(track)
    np.testing.assert_allclose(np.median(voiced), f0, rtol=0.03)


def test_pitch_silence_is_unvoiced():
    fs = 16000
    x = (1e-4 * RNG.standard_normal(fs)).astype(np.float32)
    freqs, strengths, _ = prosody.pitch_candidates(x, fs=fs)
    track = np.asarray(prosody.viterbi_pitch(freqs, strengths))
    assert (track == 0).mean() > 0.9


def test_prosodic_features_shape_and_normalization():
    fs = 16000
    t = np.arange(fs * 2) / fs
    x = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    feats = np.asarray(prosody.extract_prosodic_features(x, fs, nb_frames=50))
    assert feats.shape == (50, 4)
    assert np.isfinite(feats).all()
    # loud 200 Hz tone: pitch channel (idx 2) should be active (log(201)-4 > 0)
    assert feats[:, 2].mean() > 0.5


def test_intensity_db_scale():
    fs = 16000
    x = np.full(fs, 0.1, np.float32) * np.sin(
        2 * np.pi * 1000 * np.arange(fs) / fs).astype(np.float32)
    db = np.asarray(prosody.intensity_db(x, fs=fs))
    # 0.1 amplitude sine: rms ~ 0.0707 -> ~ 20log10(.0707/2e-5) ~ 71 dB
    assert 60 < np.median(db) < 80


# ---------------------------------------------------------------------------
# VAD
# ---------------------------------------------------------------------------

def test_crosstalk_vad_attributes_speech():
    # the savgol smoothing window is 301 samples at 100 Hz (~3 s), so the
    # signal must be long enough that halves aren't smeared into each other
    fs = 8000
    dur = 60.0
    n = int(fs * dur)
    t = np.arange(n) / fs
    tone = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    # speaker 1 talks the first half, speaker 2 the second half
    x1 = tone * (t < dur / 2) + 1e-4 * RNG.standard_normal(n).astype(np.float32)
    x2 = tone * (t >= dur / 2) + 1e-4 * RNG.standard_normal(n).astype(np.float32)
    s1, s2 = vad.crosstalk_vad(x1, x2, fs, frame_count=600)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    # check away from the 3 s transition band around the midpoint
    assert s1[:250].mean() > 0.9 and s1[350:].mean() < 0.1
    assert s2[350:].mean() > 0.9 and s2[:250].mean() < 0.1


# ---------------------------------------------------------------------------
# audio_io
# ---------------------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    fs = 8000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(fs) / fs)).astype(np.float32)
    audio_io.write_wav(tmp_path / "a.wav", x, fs)
    fs2, y = audio_io.read_wav(tmp_path / "a.wav")
    assert fs2 == fs
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_split_channels_and_chunking(tmp_path):
    fs = 8000
    n = fs * 2
    stereo = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / fs),
        0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / fs)], axis=1).astype(np.float32)
    audio_io.write_wav(tmp_path / "sess_c1_c2.wav", stereo, fs)
    written = audio_io.split_audio_channels(tmp_path / "sess_c1_c2.wav",
                                            tmp_path / "out")
    assert len(written) == 2
    # idempotent
    assert audio_io.split_audio_channels(tmp_path / "sess_c1_c2.wav",
                                         tmp_path / "out") == []

    # chunking: silence gap in the middle
    y = np.concatenate([stereo[:fs, 0], np.zeros(fs // 2, np.float32),
                        stereo[:fs, 0]])
    audio_io.write_wav(tmp_path / "mono.wav", y, fs)
    out = audio_io.chunk_audio_file(tmp_path / "mono.wav", tmp_path / "chunks")
    chunks = sorted(out.glob("*.wav"))
    assert len(chunks) >= 2

"""Full-pipeline integration: synthetic raw dyad sessions -> audio DSP ->
FLAME fitting -> combiner -> window dataset -> training -> evaluation ->
generation. Every hop uses the real on-disk interfaces."""

import csv
import json

import h5py
import jax
import numpy as np
import pytest

from lets_face_it_tpu.features import audio_io, combine, flame_fit, mfcc, prosody
from lets_face_it_tpu.hparams import HParams
from lets_face_it_tpu.render import flame

FPS = 25
N_FRAMES = 140
FS = 8000

MODEL = flame.synthetic_flame_model(128, seed=3)
EMB = flame_fit.synthetic_landmark_embedding(MODEL, seed=4)


def _session_audio(rng, n_samples):
    t = np.arange(n_samples) / FS
    f0 = 140 + 40 * np.sin(2 * np.pi * 0.2 * t)
    return (0.3 * np.sin(2 * np.pi * f0 * t)
            + 0.01 * rng.standard_normal(n_samples)).astype(np.float32)


def _write_raw_session(session_dir, rng):
    dur = N_FRAMES / FPS
    n = int(FS * dur)
    stereo = np.stack([_session_audio(rng, n), _session_audio(rng, n)], 1)
    audio_io.write_wav(session_dir / "audio_c1_c2.wav", stereo, FS)

    for part in ("P1", "P2"):
        d = session_dir / part
        d.mkdir(parents=True, exist_ok=True)
        (d / f"frames_{FPS}fps.txt").write_text(str(N_FRAMES))
        # synthetic openface CSV whose landmark targets come from real FLAME
        # evaluations, so the fitter has a consistent target
        exp = 0.3 * rng.standard_normal((N_FRAMES, 100)).astype(np.float32)
        with open(d / f"openface_{FPS}fps.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([f"c{i}" for i in range(436)])
            for ts in range(N_FRAMES):
                p = {"trans": np.zeros(3, np.float32),
                     "rot": np.zeros(3, np.float32),
                     "pose": np.zeros(12, np.float32),
                     "shape": np.zeros(300, np.float32),
                     "exp": exp[ts], "scale": np.float32(700.0)}
                import jax.numpy as jnp

                lmks = flame_fit.model_landmarks(
                    MODEL, EMB, {k: jnp.asarray(v) for k, v in p.items()})
                proj = np.asarray(p["scale"] * lmks[:, :2])
                full = np.zeros((68, 2), np.float32)
                full[17:] = proj
                full[17:, 1] = 1024.0 - full[17:, 1]
                row = (["0", str(ts), str(ts / FPS), "0.99", "1"]
                       + ["0"] * 294
                       + [str(v) for v in full[:, 0]]
                       + [str(v) for v in full[:, 1]] + ["0"])
                w.writerow(row)


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    dataset_dir = tmp_path / "sessions"
    for name in ("S1", "S2"):
        _write_raw_session(dataset_dir / name, rng)

    # --- stage: audio DSP (split, prosody, mfcc) ---
    for name in ("S1", "S2"):
        sess = dataset_dir / name
        audio_io.split_audio_channels(sess / "audio_c1_c2.wav", sess)
        for part in ("P1", "P2"):
            d = sess / part
            fs, samples = audio_io.read_wav(d / "audio.wav")
            np.save(d / f"prosodic_features_{FPS}fps.npy", np.asarray(
                prosody.extract_prosodic_features(samples, fs, N_FRAMES)))
            np.save(d / f"mfcc_{FPS}fps.npy", np.asarray(
                mfcc.extract_mfcc_to_frames(samples * 32768.0, fs, N_FRAMES)))

    # --- stage: RingNet-lite landmark init (ringnet_{fps}fps.h5 seeds the
    # fitter; the external RingNet drop-in would take precedence) ---
    from lets_face_it_tpu.features import ringnet_lite

    for name in ("S1", "S2"):
        for part in ("P1", "P2"):
            out = ringnet_lite.extract_ringnet_lite(
                dataset_dir / name / part, FPS, model=MODEL, emb=EMB,
                shape_frames=4, rigid_steps=10, shape_steps=10)
            assert out.exists()

    # --- stage: FLAME landmark fitting (batched L-BFGS) ---
    for name in ("S1", "S2"):
        for part in ("P1", "P2"):
            out = flame_fit.fit_session_participant(
                dataset_dir / name / part, FPS, model=MODEL, emb=EMB)
            with h5py.File(out) as f:
                assert f["tf_exp"].shape == (N_FRAMES, 100)

    # --- stage: combine -> lets_face_it.h5 ---
    spec = {"train": {"S1": [[200, 5000]], "S2": [[200, 5000]]},
            "val": {"S2": [[200, 3500]]}, "test": {"S1": [[200, 3500]]}}
    h5_path = combine.combine_features(dataset_dir,
                                       tmp_path / "lets_face_it.h5", spec,
                                       fps=FPS)

    # --- stage: train a tiny model one pass ---
    hp = HParams(
        Conditioning={
            "cond_dim": 32,
            "p1_face": {"dropout": 0, "enc": "none", "hidden_dim": 8,
                        "history": 3, "dim": 56},
            "p1_speech": {"dropout": 0.2, "enc": "rnn", "hidden_dim": 8,
                          "history": 2},
            "p2_face": {"dropout": 0.2, "enc": "rnn", "hidden_dim": 8,
                        "history": 4, "dim": 56},
            "p2_speech": {"dropout": 0.2, "enc": "rnn", "hidden_dim": 8,
                          "history": 3},
            "use_frame_nb": False},
        Data={"file_name": "lets_face_it.h5", "expression_dim": 50,
              "jaw_dim": 3, "neck_dim": 3, "speech_dim": 30,
              "use_standardization": True},
        Glow={"K": 2, "L": 1, "LU_decomposed": True, "actnorm_scale": 1.0,
              "flow_coupling": "affine", "flow_permutation": "invconv",
              "hidden_channels": 8, "rnn_type": "gru", "scale_eps": 1e-4},
        Infer={"eps": 1.0, "seq_len": 16},
        Train={"seq_len": 16, "use_negative_nll_loss": False},
        Validation={"check_invertion": False, "inference": True,
                    "render": False, "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": False},
        Optim={"name": "adam", "args": {"adam": {}},
               "Schedule": {"name": None, "args": {}}},
        batch_size=8, lr=1e-3, max_epochs=1, gradient_clip_val=10,
        check_val_every_n_epoch=1, logger=False,
        dataset_root=str(tmp_path),
    )
    hp.config_name = "integration"

    from lets_face_it_tpu.train.loop import train

    state, best_val = train(hp, seed=0, log_dir=None, ckpt_dir=None,
                            max_steps=6, use_mesh=False, verbose=False)
    assert np.isfinite(best_val)

    # --- stage: test-split evaluation + generation ---
    from lets_face_it_tpu.train.evaluate import run_test, summarize

    hp.Test = {"seq_len": 16}
    results = run_test(hp, state.params, max_batches=1, seed=0)
    summary = summarize(results)
    assert "test_loss" in summary and np.isfinite(summary["test_loss"])

    from lets_face_it_tpu.sample import Generator

    gen = Generator(hp, state.params)
    frames = np.random.default_rng(1).standard_normal((20, 273)).astype(np.float32)
    out = gen.generate(frames)
    assert out.shape[2] == 106 and np.isfinite(out).all()

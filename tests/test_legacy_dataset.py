"""Legacy packed-frame dataset round trip."""

import numpy as np

from lets_face_it_tpu.features.legacy_dataset import (
    PackedFrameStore,
    flame2glow,
    pack_rows,
    write_packed_dataset,
)
from lets_face_it_tpu.sample.generate import dictify_frames


def _chunk(rng, n):
    p1 = flame2glow(rng.standard_normal((n, 100)),
                    rng.standard_normal((n, 12)),
                    rng.standard_normal((n, 3)))
    p2 = flame2glow(rng.standard_normal((n, 100)),
                    rng.standard_normal((n, 12)),
                    rng.standard_normal((n, 3)))
    return pack_rows(p1, rng.standard_normal((n, 30)),
                     p2, rng.standard_normal((n, 30)),
                     np.arange(1, 2 * n, 2))


def test_flame2glow_layout():
    exp = np.ones((2, 100))
    pose = np.zeros((2, 12))
    pose[:, 3:6] = 7.0
    neck = np.full((2, 3), 9.0)
    out = flame2glow(exp, pose, neck)
    assert out.shape == (2, 106)
    assert out[0, 99] == 1.0 and out[0, 100] == 7.0 and out[0, 103] == 9.0


def test_write_and_read_packed(tmp_path):
    rng = np.random.default_rng(0)
    splits = {"train": [_chunk(rng, 40), _chunk(rng, 25)],
              "val": [_chunk(rng, 30)],
              "test": [_chunk(rng, 20)]}
    paths = write_packed_dataset(splits, tmp_path)
    store = PackedFrameStore(paths["test"])
    assert list(store.chunk_lengths) == [20]
    frames = store.get_frames(0, 2, 12)
    assert frames.shape == (10, 273)
    # compatible with the generation adapter
    d = dictify_frames(frames, {"expression_dim": 50, "jaw_dim": 3,
                                "neck_dim": 3, "speech_dim": 30})
    assert d["p1_face"].shape == (10, 56)

    # train rows standardized: mean ~ 0, std ~ 1 on the first 136 cols
    train = PackedFrameStore(paths["train"])
    rows = train.get_frames(0)
    assert abs(rows[:, :136].mean()) < 0.3

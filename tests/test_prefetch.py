"""Native gather + async prefetch pipeline tests."""

import numpy as np
import pytest

from lets_face_it_tpu.data.prefetch import NativeGather, prefetch_batches


def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    src = np.ascontiguousarray(rng.standard_normal((500, 23)), np.float32)
    starts = rng.integers(0, 500 - 40, 17)
    got = NativeGather.gather(src, starts, 40)
    idx = starts[:, None] + np.arange(40)[None, :]
    np.testing.assert_array_equal(got, src[idx])
    assert NativeGather.available(), "native loader should build here"


def test_prefetch_preserves_order_and_content():
    items = [{"x": np.full((2, 2), i)} for i in range(20)]
    out = list(prefetch_batches(iter(items), depth=3))
    assert len(out) == 20
    for i, item in enumerate(out):
        np.testing.assert_array_equal(item["x"], np.full((2, 2), i))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch_batches(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)

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


def test_prefetch_transfer_runs_in_worker():
    """``transfer`` is applied to every item, in order, in the worker thread
    (the double-buffered host->device upload path used by the train loop)."""
    import threading

    main = threading.get_ident()
    seen_threads = []

    def transfer(item):
        seen_threads.append(threading.get_ident())
        return {k: v + 1 for k, v in item.items()}

    items = [{"x": np.full((2, 2), i)} for i in range(8)]
    out = list(prefetch_batches(iter(items), depth=2, transfer=transfer))
    assert len(out) == 8
    for i, item in enumerate(out):
        np.testing.assert_array_equal(item["x"], np.full((2, 2), i + 1))
    assert all(t != main for t in seen_threads)


def test_prefetch_transfer_errors_propagate():
    def bad_transfer(item):
        raise RuntimeError("transfer boom")

    with pytest.raises(RuntimeError, match="transfer boom"):
        list(prefetch_batches(iter([{"x": np.zeros(2)}]),
                              transfer=bad_transfer))


def test_prefetch_early_break_releases_worker():
    """An abandoned prefetch generator (the train loop's max_steps break)
    must stop the worker thread and drop queued items — otherwise the worker
    blocks on q.put forever, pinning transferred device batches."""
    import threading
    import time

    produced = []

    def gen():
        i = 0
        while True:
            produced.append(i)
            yield {"x": np.full((2,), i)}
            i += 1

    before = set(threading.enumerate())
    it = prefetch_batches(gen(), depth=2)
    assert next(it) is not None
    it.close()  # what GC does to the abandoned generator

    extra = [t for t in threading.enumerate() if t not in before]
    deadline = time.time() + 6
    while time.time() < deadline and any(t.is_alive() for t in extra):
        time.sleep(0.05)
    assert not any(t.is_alive() for t in extra), "worker thread leaked"
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n, "worker kept producing after close"


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch_batches(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_wire_bf16_training_tracks_f32(tmp_path):
    """wire_dtype=bf16 (bf16 on the wire, f32 on device) trains to within
    bf16-input-rounding of the f32-wire run — the model path is unchanged,
    only the batch values are rounded to the bf16 grid."""
    from conftest import tiny_hparams
    from lets_face_it_tpu.data.synthetic import (tiny_dims,
                                                 write_synthetic_dataset)
    from lets_face_it_tpu.train.loop import train

    write_synthetic_dataset(tmp_path / "synthetic.h5", dims=tiny_dims(),
                            n_train_chunks=2, n_val_chunks=1,
                            n_test_chunks=1, frames_per_chunk=40, seed=0)
    base = dict(
        dataset_root=str(tmp_path), logger=False, max_epochs=2,
        check_val_every_n_epoch=1,
        Validation={"check_invertion": False, "inference": False,
                    "render": False, "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": False},
    )
    vals = {}
    for wire in ("f32", "bf16"):
        hp = tiny_hparams(**base, wire_dtype=wire)
        vals[wire] = []
        train(hp, seed=3, log_dir=None, ckpt_dir=None, use_mesh=False,
              verbose=False,
              val_hook=lambda step, v, *a: vals[wire].append(v))
    assert all(np.isfinite(vals["bf16"]))
    np.testing.assert_allclose(vals["bf16"], vals["f32"], rtol=2e-2)

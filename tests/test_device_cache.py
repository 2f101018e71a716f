"""Device-resident window gathering (data/device_cache.py).

The contract: batches gathered on-device from window-start indices are
bit-equal to the host NativeGather path, single-device and mesh-sharded,
and toggling ``device_data_cache`` never changes a training trajectory.
"""

import jax
import numpy as np
import pytest

from conftest import tiny_hparams
from lets_face_it_tpu.data.device_cache import (AUTO_MAX_BYTES,
                                                DeviceWindowBatcher,
                                                make_device_batcher)
from lets_face_it_tpu.data.synthetic import tiny_dims, write_synthetic_dataset
from lets_face_it_tpu.data.windows import WindowDataset
from lets_face_it_tpu.parallel import mesh as pmesh
from lets_face_it_tpu.train.loop import train


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache")
    write_synthetic_dataset(root / "synthetic.h5", dims=tiny_dims(),
                            n_train_chunks=3, n_val_chunks=1, n_test_chunks=1,
                            frames_per_chunk=40, seed=2)
    hp = tiny_hparams(dataset_root=str(root))
    return WindowDataset(root / "synthetic.h5", "train", hp.Data,
                         hp.Conditioning, hp.Train["seq_len"])


def test_device_gather_matches_host_bitexact(ds):
    batcher = DeviceWindowBatcher(ds)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(ds))[:16]
    host = ds.get_batch(idx)
    dev = batcher.get_batch(idx)
    assert set(host) == set(dev)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k])


def test_device_gather_mesh_sharded_matches_host(ds):
    mesh = pmesh.make_mesh()
    batcher = DeviceWindowBatcher(ds, mesh=mesh)
    idx = np.arange(16)  # 16 % 8 devices == 0
    host = ds.get_batch(idx)
    dev = batcher.get_batch(idx)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k])
    # the gather output is sharded over the batch axis, data replicated
    shardings = {k: v.sharding for k, v in dev.items()}
    for k, s in shardings.items():
        assert not s.is_fully_replicated, (k, s)
    for k, a in batcher.arrays.items():
        assert a.sharding.is_fully_replicated, (k, a.sharding)


def test_index_batches_match_gathered_batches(ds):
    rng1 = np.random.default_rng([7, 0])
    rng2 = np.random.default_rng([7, 0])
    via_idx = [ds.get_batch(sel) for sel in
               ds.epoch_index_batches(8, rng=rng1, shuffle=True,
                                      drop_last=True)]
    direct = list(ds.epoch_batches(8, rng=rng2, shuffle=True, drop_last=True))
    assert len(via_idx) == len(direct)
    for a, b in zip(via_idx, direct):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_auto_policy(ds):
    hp_auto = tiny_hparams()
    # CPU: auto stays on the host path (no transfer to save)
    assert make_device_batcher(ds, hp_auto) is None
    assert make_device_batcher(ds, tiny_hparams(device_data_cache="off")) \
        is None
    on = make_device_batcher(ds, tiny_hparams(device_data_cache="on"))
    assert isinstance(on, DeviceWindowBatcher)
    assert on.total_bytes <= AUTO_MAX_BYTES


def test_auto_policy_budget_and_invalid_mode(ds, monkeypatch):
    # typos must error, not silently force the cache on
    with pytest.raises(ValueError, match="device_data_cache"):
        make_device_batcher(ds, tiny_hparams(device_data_cache="offf"))

    # YAML 1.1 parses bare on/off as booleans; they must keep their meaning
    assert make_device_batcher(ds, tiny_hparams(device_data_cache=False)) \
        is None
    assert isinstance(
        make_device_batcher(ds, tiny_hparams(device_data_cache=True)),
        DeviceWindowBatcher)

    # pretend we're on an accelerator so the auto size gate is reachable
    import lets_face_it_tpu.data.device_cache as dc

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(dc.jax, "devices", lambda: [_Dev()])
    assert make_device_batcher(ds, tiny_hparams()) is not None
    # HBM already claimed by another split shrinks this split's allowance
    assert make_device_batcher(ds, tiny_hparams(),
                               reserved_bytes=AUTO_MAX_BYTES) is None


def test_starts_block_gather_matches_get_batch(ds):
    """The [k, B] starts block + in-jit gather (the k-steps-per-dispatch
    data path) reproduces get_batch's windows bit-exactly, single-device
    and mesh-sharded."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    blocks = [rng.permutation(len(ds))[:8] for _ in range(3)]
    for mesh in (None, pmesh.make_mesh()):
        batcher = DeviceWindowBatcher(ds, mesh=mesh)
        starts_block = batcher.get_starts_block(blocks)
        assert starts_block.shape == (3, 8)
        window = jnp.arange(ds.seq_len)

        @jax.jit
        def gather_i(arrays, starts):
            idx = starts[:, None] + window[None, :]
            return {k: a[idx] for k, a in arrays.items()}

        for i, blk in enumerate(blocks):
            host = ds.get_batch(blk)
            dev = gather_i(batcher.arrays, starts_block[i])
            for k in host:
                np.testing.assert_array_equal(np.asarray(dev[k]), host[k])
        if mesh is not None:
            # block sharded over the batch axis, operands replicated
            assert not starts_block.sharding.is_fully_replicated


def _run(tmp_path, cache_mode, seed=5, max_steps=None, **hp_overrides):
    write_synthetic_dataset(tmp_path / "synthetic.h5", dims=tiny_dims(),
                            n_train_chunks=2, n_val_chunks=1, n_test_chunks=1,
                            frames_per_chunk=40, seed=0)
    hp = tiny_hparams(
        dataset_root=str(tmp_path), logger=False, max_epochs=2,
        check_val_every_n_epoch=1, device_data_cache=cache_mode,
        Validation={"check_invertion": False, "inference": False,
                    "render": False, "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": False},
        **hp_overrides,
    )
    vals = []
    train(hp, seed=seed, log_dir=None, ckpt_dir=None, use_mesh=False,
          verbose=False, max_steps=max_steps,
          val_hook=lambda step, v, *a: vals.append((step, v)))
    return vals


def test_train_trajectory_invariant_to_device_cache(tmp_path):
    """device_data_cache=on reproduces the host-path trajectory bit-for-bit
    (same epoch_index_batches order, same float32 values, deterministic
    CPU XLA)."""
    vals_host = _run(tmp_path / "a", "off")
    vals_dev = _run(tmp_path / "b", "on")
    assert [s for s, _ in vals_host] == [s for s, _ in vals_dev]
    np.testing.assert_array_equal([v for _, v in vals_host],
                                  [v for _, v in vals_dev])


def test_multi_step_matches_single(tmp_path):
    """steps_per_dispatch=k (scan of k optimizer steps per dispatch, batches
    gathered in-jit) consumes the same data order and reproduces the k=1
    trajectory. 12 batches/epoch at k=5 exercises 2 full blocks + 2
    single-step tail batches per epoch, and the max_steps slice stops the
    run at exactly the same step count."""
    vals_single = _run(tmp_path / "a", "on", max_steps=20)
    vals_multi = _run(tmp_path / "b", "on", max_steps=20,
                      steps_per_dispatch=5)
    assert [s for s, _ in vals_single] == [s for s, _ in vals_multi]
    np.testing.assert_allclose([v for _, v in vals_multi],
                               [v for _, v in vals_single],
                               rtol=0, atol=5e-5)


def test_steps_per_dispatch_without_cache_falls_back(tmp_path):
    """steps_per_dispatch without the device cache (device_data_cache=off /
    CPU auto) degrades to one step per dispatch instead of crashing."""
    vals = _run(tmp_path / "c", "off", max_steps=8, steps_per_dispatch=4)
    assert vals and all(np.isfinite(v) for _, v in vals)

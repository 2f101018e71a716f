"""Checkpoint round-trip and kill/resume trajectory continuity.

The reference resumes training via Lightning's ``resume_from_checkpoint``
(final_model.yaml:149, train.py:60-66); the contract worth testing is not
just "a file appears" but that a killed-and-resumed run reproduces the
uninterrupted run's trajectory. Three things make that possible here:

* the per-step PRNG stream rides ``TrainState.rng`` and is checkpointed
  (train/checkpoint.py::to_saveable),
* the shuffle order is a pure function of ``(seed, epoch)``
  (train/loop.py), so a resume at epoch E consumes the same data order the
  uninterrupted run would have, and
* optimizer state (including schedule step counts) round-trips bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_batch, tiny_hparams
from lets_face_it_tpu.data.synthetic import tiny_dims, write_synthetic_dataset
from lets_face_it_tpu.model import FlowSpec
from lets_face_it_tpu.train import state as train_state
from lets_face_it_tpu.train.checkpoint import (CheckpointManager,
                                               to_saveable)
from lets_face_it_tpu.train.loop import train
from lets_face_it_tpu.train.optim import build_optimizer


def _assert_trees_bitequal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_bitexact(tmp_path, hp):
    """Params, opt state, step, last-mismatched-NLL, PRNG key and meta all
    survive save/restore bit-for-bit (after a real optimizer step so the
    Adam moments are non-trivial)."""
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, steps_per_epoch=5)
    st = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    step_fn = train_state.make_train_step(spec, hp, optimizer, mesh=None)
    jb = {k: jnp.asarray(v) for k, v in random_batch(hp).items()}
    st, _ = step_fn(st, jb)
    st = jax.device_get(st)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(1, st, actnorm_inited=True, epoch=3, extra={"val_loss": 1.5})
    assert mgr.latest_step() == 1

    template = train_state.init_train_state(jax.random.PRNGKey(7), spec,
                                            optimizer)
    restored, meta = mgr.restore(template)

    _assert_trees_bitequal(to_saveable(st), to_saveable(restored))
    assert meta["actnorm_inited"] is True
    assert meta["epoch"] == 3
    assert meta["val_loss"] == 1.5


def _fixture_hp(tmp_path, **overrides):
    write_synthetic_dataset(tmp_path / "synthetic.h5", dims=tiny_dims(),
                            n_train_chunks=2, n_val_chunks=1, n_test_chunks=1,
                            frames_per_chunk=40, seed=0)
    base = dict(
        dataset_root=str(tmp_path), logger=False, max_epochs=4,
        check_val_every_n_epoch=1,
        Validation={"check_invertion": False, "inference": False,
                    "render": False, "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": False},
    )
    base.update(overrides)
    return tiny_hparams(**base)


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """Train 4 epochs straight through vs. train 2 epochs, "kill", resume
    from the checkpoint for the remaining 2: the validation trajectory and
    final parameters must match bit-for-bit (deterministic CPU XLA)."""
    seed = 11

    # Uninterrupted run.
    hp_a = _fixture_hp(tmp_path / "data_a")
    vals_a = []
    state_a, best_a = train(
        hp_a, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_a"),
        use_mesh=False, verbose=False,
        val_hook=lambda step, v, *a: vals_a.append((step, v)))
    assert len(vals_a) == 4

    # Same data, killed after the epoch-2 checkpoint...
    hp_b = _fixture_hp(tmp_path / "data_a", max_epochs=2)
    vals_b = []
    train(hp_b, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_b"),
          use_mesh=False, verbose=False,
          val_hook=lambda step, v, *a: vals_b.append((step, v)))

    # ...then resumed for the remaining epochs.
    hp_c = _fixture_hp(tmp_path / "data_a",
                       resume_from_checkpoint=str(tmp_path / "ck_b"))
    state_c, best_c = train(
        hp_c, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_c"),
        use_mesh=False, verbose=False,
        val_hook=lambda step, v, *a: vals_b.append((step, v)))

    assert [s for s, _ in vals_b] == [s for s, _ in vals_a]
    np.testing.assert_array_equal([v for _, v in vals_b],
                                  [v for _, v in vals_a])
    _assert_trees_bitequal(to_saveable(jax.device_get(state_a)),
                           to_saveable(jax.device_get(state_c)))
    assert best_a == min(v for _, v in vals_b)


def test_resume_at_max_steps_terminates_cleanly(tmp_path):
    """A run resumed from a checkpoint taken AT max_steps (stall after the
    final save) must exit immediately instead of looping over empty epochs
    or re-saving the existing orbax step (which raises) — the supervisor
    would read either as a crash. Covers both k=1 and steps_per_dispatch."""
    for k in (1, 3):
        sub = tmp_path / f"k{k}"
        hp = _fixture_hp(sub, max_epochs=4, device_data_cache="on",
                         steps_per_dispatch=k)
        ck = str(sub / "ck")
        train(hp, seed=3, log_dir=None, ckpt_dir=ck, use_mesh=False,
              verbose=False, max_steps=12)
        hp2 = _fixture_hp(sub, max_epochs=4, device_data_cache="on",
                          steps_per_dispatch=k, resume_from_checkpoint=ck)
        vals = []
        state, best = train(hp2, seed=3, log_dir=None, ckpt_dir=ck,
                            use_mesh=False, verbose=False, max_steps=12,
                            val_hook=lambda s, v, *a: vals.append(s))
        assert vals == []          # nothing left to train or validate


@pytest.mark.slow
def test_kill_and_resume_with_steps_per_dispatch(tmp_path):
    """Kill/resume trajectory continuity holds under --steps_per_dispatch:
    2 epochs + resume for 2 more at k=3 reproduces the uninterrupted k=1
    4-epoch run bit-for-bit-close (same (seed, epoch) data order; the
    epoch plan re-blocks from the epoch start on resume)."""
    seed = 13
    common = dict(device_data_cache="on")

    hp_a = _fixture_hp(tmp_path / "data", **common)
    vals_a = []
    state_a, _ = train(
        hp_a, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_a"),
        use_mesh=False, verbose=False,
        val_hook=lambda step, v, *a: vals_a.append((step, v)))

    hp_b = _fixture_hp(tmp_path / "data", max_epochs=2,
                       steps_per_dispatch=3, **common)
    vals_b = []
    train(hp_b, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_b"),
          use_mesh=False, verbose=False,
          val_hook=lambda step, v, *a: vals_b.append((step, v)))

    hp_c = _fixture_hp(tmp_path / "data", steps_per_dispatch=3,
                       resume_from_checkpoint=str(tmp_path / "ck_b"),
                       **common)
    state_c, _ = train(
        hp_c, seed=seed, log_dir=None, ckpt_dir=str(tmp_path / "ck_c"),
        use_mesh=False, verbose=False,
        val_hook=lambda step, v, *a: vals_b.append((step, v)))

    assert [s for s, _ in vals_b] == [s for s, _ in vals_a]
    np.testing.assert_allclose([v for _, v in vals_b],
                               [v for _, v in vals_a], rtol=0, atol=5e-5)
    for a, b in zip(jax.tree.leaves(to_saveable(jax.device_get(state_a))),
                    jax.tree.leaves(to_saveable(jax.device_get(state_c)))):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)

"""Multi-device data-parallel tests on the 8-device virtual CPU mesh — the
TPU substitute for multi-node test infrastructure (SURVEY.md §4)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")  # for __graft_entry__

from lets_face_it_tpu.model import FlowSpec
from lets_face_it_tpu.parallel import mesh as pmesh
from lets_face_it_tpu.train import state as train_state
from lets_face_it_tpu.train.optim import build_optimizer

from conftest import random_batch, tiny_hparams


def test_mesh_has_8_devices():
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8


def test_batch_sharded_across_devices():
    mesh = pmesh.make_mesh()
    batch = {"x": np.zeros((16, 4, 2), np.float32)}
    sharded = pmesh.shard_batch(mesh, batch)
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(2, 4, 2)}  # 16 / 8 devices


def test_data_parallel_step_matches_single_device():
    hp = tiny_hparams(batch_size=16)
    hp.Train["use_negative_nll_loss"] = False
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, 10)
    batch_np = random_batch(hp, batch_size=16)

    # single device
    state1 = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    step1 = train_state.make_train_step(spec, hp, optimizer)
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, jb)

    # 8-device mesh
    mesh = pmesh.make_mesh()
    state8 = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    state8 = pmesh.replicate(mesh, state8)
    step8 = train_state.make_train_step(spec, hp, optimizer)
    sharded = pmesh.shard_batch(mesh, batch_np)
    state8, m8 = step8(state8, sharded)

    assert float(m1["nll"]) == pytest.approx(float(m8["nll"]), rel=1e-5)
    # parameters after the update agree (gradient all-reduce is exact)
    l1 = jax.tree.leaves(jax.device_get(state1.params))
    l8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_pad_batch():
    batch = {"x": np.arange(10, dtype=np.float32)[:, None]}
    padded, real = pmesh.pad_batch(batch, 8)
    assert real == 10
    assert padded["x"].shape[0] == 16
    np.testing.assert_array_equal(
        padded["x"][10:], np.repeat(batch["x"][-1:], 6, axis=0))


def test_graft_entry_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__ as graft

    fn, (params, batch) = graft.entry()
    loss = jax.jit(fn)(params, batch)
    assert np.isfinite(float(loss))


def test_data_parallel_sampling_matches_single_device():
    """Serving scale-out: batched autoregressive sampling with parameters
    replicated and the generation batch sharded over the mesh produces the
    same frames as single-device execution (same PRNG key)."""
    from lets_face_it_tpu.model import init_seqglow, seqglow

    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(1), spec)
    data = random_batch(hp, batch_size=16, seq_len=hp.Infer["seq_len"])
    rng = jax.random.PRNGKey(7)

    single = seqglow.sequence_sample_jit(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()},
        hp.Infer["seq_len"], eps_std=1.0, rng=rng)

    mesh = pmesh.make_mesh()
    sharded_out = seqglow.sequence_sample_jit(
        spec, pmesh.replicate(mesh, params), pmesh.shard_batch(mesh, data),
        hp.Infer["seq_len"], eps_std=1.0, rng=pmesh.replicate(mesh, rng))
    # output stays batch-sharded across the mesh (no gather onto one chip)
    n_shards = len({s.device for s in sharded_out.addressable_shards})
    assert n_shards == 8
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded_out),
                               atol=1e-5)

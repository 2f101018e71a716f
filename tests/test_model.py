"""Model-level tests: frame invertibility, scan-vs-naive-loop equivalence,
sequence round-trips, and sampling autoregression."""

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.core import ops, rnn
from lets_face_it_tpu.model import (
    FlowSpec,
    encoders,
    flow,
    init_seqglow,
    sequence_invert,
    sequence_nll,
    sequence_sample,
)

KEY = jax.random.PRNGKey(42)


def build(hp):
    spec = FlowSpec.build(hp)
    params = init_seqglow(KEY, spec)
    return spec, params


def perturb(params, scale=0.05):
    """Make couplings non-trivial without touching frozen buffers (perturbing
    invconv's P would break its orthogonality and the P^T-based inverse)."""
    mask = flow.trainable_mask(params.flow)
    new_flow = jax.tree.map(
        lambda x, m: x + scale * jax.random.normal(KEY, x.shape) if m else x,
        params.flow, mask)
    return params._replace(flow=new_flow)


def test_frame_roundtrip(hp):
    spec, params = build(hp)
    b, c = 4, spec.channels
    x = jax.random.normal(KEY, (b, c))
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, spec.cond.feature_dim))
    states = flow.init_flow_states(spec, b)

    z, logdet, _ = flow.frame_fwd(spec, params.flow, x, cond, states)
    x2, logdet_rev, _ = flow.frame_rev(spec, params.flow, z, cond, states)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet_rev), -np.asarray(logdet), atol=1e-3)


def test_frame_logdet_vs_jacobian(hp):
    spec, params = build(hp)
    c = spec.channels
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, spec.cond.feature_dim))
    states = flow.init_flow_states(spec, 1)
    # make the coupling non-trivial (zero-init would give identity couplings)
    params = perturb(params, 0.01)

    def f(x_vec):
        z, _, _ = flow.frame_fwd(spec, params.flow, x_vec[None], cond, states)
        return z[0]

    x = jax.random.normal(jax.random.PRNGKey(2), (c,))
    jac = jax.jacfwd(f)(x)
    _, num_logdet = np.linalg.slogdet(np.asarray(jac))
    _, logdet, _ = flow.frame_fwd(spec, params.flow, x[None], cond, states)

    # our logdet differs from the true Jacobian logdet by the reference's
    # x C convention on actnorm+invconv terms: ld_ref = C*(an+inv) + coupling
    an = float(jnp.sum(params.flow["actnorm"]["logs"]))
    inv = float(jnp.sum(params.flow["perm"]["log_s"]))
    true_from_ours = float(logdet[0]) - (c - 1) * (an + inv)
    np.testing.assert_allclose(true_from_ours, num_logdet, rtol=1e-4, atol=1e-4)


def naive_sequence_nll(spec, params, batch):
    """Straightforward per-frame Python-loop evaluation using only core ops —
    structured like the reference's SeqGlow.forward (models.py:534-561) — to
    validate the scan/stacked implementation."""
    x = jnp.asarray(batch["p1_face"])
    b, t, c = x.shape
    start = spec.cond.longest_history
    k_steps = spec.n_steps

    states = [jnp.zeros((b, spec.hidden_channels)) for _ in range(k_steps)]
    losses = []
    for ts in range(start, t):
        # conditioning exactly as create_conditioning (models.py:598-615)
        parts = [x[:, ts - spec.cond.p1_face.history : ts].reshape(b, -1)]
        for name in ("p2_face", "p1_speech", "p2_speech"):
            espec = getattr(spec.cond, name)
            if espec is None:
                continue
            win = jnp.asarray(batch[name])[:, ts - espec.history + 1 : ts + 1]
            _, h_last = rnn.gru_scan(params.encoder[name]["rnn"], win)
            parts.append(jnp.concatenate([h_last, h_last], axis=-1))
        cond = jnp.concatenate(parts, axis=-1)

        z = x[:, ts]
        logdet = jnp.zeros(b)
        for k in range(k_steps):
            p = jax.tree.map(lambda leaf: leaf[k], params.flow)
            z, logdet = ops.actnorm_fwd(p["actnorm"], z, logdet)
            z, logdet = ops.invconv_fwd(p["perm"], z, logdet)
            z1, z2 = ops.split_half(z)
            cond_t = jax.nn.leaky_relu(ops.linear(p["cond_proj"], cond), 0.01)
            states[k] = rnn.gru_cell(
                p["rnn"], jnp.concatenate([z1, cond_t], axis=-1), states[k])
            h = ops.linear_zeros(p["out"], states[k])
            shift, scale_raw = ops.split_cross(h)
            scale = ops.affine_scale(scale_raw, spec.scale_eps)
            z2 = (z2 + shift) * scale
            logdet = logdet + jnp.sum(jnp.log(scale), axis=-1)
            z = ops.cat_half(z1, z2)
        objective = logdet + ops.gaussian_logp(z)
        losses.append(jnp.mean(-objective / ops.LN2))
    return jnp.mean(jnp.asarray(losses))


def test_scan_matches_naive_loop(hp, batch):
    spec, params = build(hp)
    params = perturb(params)
    _, loss_scan, _ = sequence_nll(spec, params, batch)
    loss_naive = naive_sequence_nll(spec, params, batch)
    np.testing.assert_allclose(float(loss_scan), float(loss_naive), rtol=1e-5)


def test_sequence_invert_roundtrip(hp, batch):
    spec, params = build(hp)
    params = perturb(params)
    z_seq, loss, _ = sequence_nll(spec, params, batch)
    recon, backward_loss = sequence_invert(spec, params, z_seq, batch)
    gt = batch["p1_face"][:, spec.cond.longest_history :]
    np.testing.assert_allclose(np.asarray(recon), gt, atol=1e-3)
    # the backward decode accumulates the negated forward logdet, so
    # backward_loss == -loss - 2*E[logp(z)]/ln2 exactly when the flow inverts
    # cleanly (this is what the reference's error_percentage probe measures,
    # mimicry_logger.py:241-251)
    mean_logp = float(jnp.mean(ops.gaussian_logp(z_seq)))
    expected_backward = -float(loss) - 2.0 * mean_logp / ops.LN2
    np.testing.assert_allclose(float(backward_loss), expected_backward, rtol=1e-4)


def test_sample_shapes_and_determinism(hp, batch):
    spec, params = build(hp)
    seq_len = hp.Validation["seq_len"]
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    out1 = sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                           rng=jax.random.PRNGKey(7))
    out2 = sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                           rng=jax.random.PRNGKey(7))
    n = seq_len - spec.cond.longest_history
    assert out1.shape == (4, n, spec.channels)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                           rng=jax.random.PRNGKey(8))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6


def test_sample_zero_eps_decodes_zero_latents(hp, batch):
    """eps_std=0 must equal decoding all-zero latents (mean path)."""
    spec, params = build(hp)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    seq_len = hp.Validation["seq_len"]
    n = seq_len - spec.cond.longest_history
    out_eps0 = sequence_sample(spec, params, data, seq_len, eps_std=0.0,
                               rng=jax.random.PRNGKey(0))
    zeros = jnp.zeros((n, 4, spec.channels))
    out_z0 = sequence_sample(spec, params, data, seq_len, eps_std=1.0,
                             rng=jax.random.PRNGKey(0), z_seq=zeros)
    np.testing.assert_allclose(np.asarray(out_eps0), np.asarray(out_z0), atol=1e-5)


def test_dropout_only_in_training(hp, batch):
    spec, params = build(hp)
    params = perturb(params)  # zero-init couplings ignore conditioning
    r = jax.random.PRNGKey(3)
    _, loss_eval1, _ = sequence_nll(spec, params, batch, rng=r, training=False)
    _, loss_eval2, _ = sequence_nll(spec, params, batch, rng=jax.random.PRNGKey(4),
                                    training=False)
    assert float(loss_eval1) == float(loss_eval2)
    _, loss_train1, _ = sequence_nll(spec, params, batch, rng=r, training=True)
    _, loss_train2, _ = sequence_nll(spec, params, batch, rng=jax.random.PRNGKey(4),
                                     training=True)
    assert float(loss_train1) != float(loss_train2)


def test_actnorm_sequential_init(hp, batch):
    spec, params = build(hp)
    x = jnp.asarray(batch["p1_face"])
    start = spec.cond.longest_history
    times = jnp.arange(start, x.shape[1])
    cond_all = encoders.encode_conditioning(
        spec.cond, params.encoder, batch, x, times)
    new_flow = flow.actnorm_sequential_init(
        spec, params.flow, x[:, start], cond_all[:, 0])
    # after init the first frame must be ~N(0,1) per channel after step 0's
    # actnorm; cheap proxy: step-0 actnorm output on x0 has mean 0, std 1
    p0 = jax.tree.map(lambda leaf: leaf[0], new_flow)
    z, _ = ops.actnorm_fwd(p0["actnorm"], x[:, start], jnp.zeros(x.shape[0]))
    np.testing.assert_allclose(np.mean(np.asarray(z), axis=0), 0.0, atol=1e-4)
    # only actnorm leaves changed
    assert np.allclose(np.asarray(new_flow["perm"]["log_s"]),
                       np.asarray(params.flow["perm"]["log_s"]))


def test_sample_mesh_requires_seq_fused_path(hp, batch):
    """A mesh with the per-frame scan path would be silently ignored
    (pallas_calls exposed to GSPMD on sharded inputs) — it must raise."""
    import pytest

    from lets_face_it_tpu.parallel import mesh as pmesh

    spec, params = build(hp)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    with pytest.raises(ValueError, match="whole-sequence fused"):
        sequence_sample(spec, params, data, hp.Validation["seq_len"],
                        eps_std=1.0, rng=jax.random.PRNGKey(0),
                        use_fused=False, use_seq_fused=False,
                        mesh=pmesh.make_mesh(8))

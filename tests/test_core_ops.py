"""Property tests for the flow primitive ops: exact round-trips, logdet vs.
numerical Jacobian, and torch parity of the recurrent cells.

These are tolerance-asserted versions of the reference's print-based manual
checks (/root/reference/code/glow_pytorch/test_modules.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lets_face_it_tpu.core import ops, rnn

KEY = jax.random.PRNGKey(0)


def test_actnorm_roundtrip_and_logdet():
    params = {"bias": jnp.array([0.5, -1.0, 2.0, 0.1]),
              "logs": jnp.array([0.2, -0.3, 0.0, 1.0])}
    x = jax.random.normal(KEY, (8, 4))
    ld0 = jnp.zeros(8)
    z, ld = ops.actnorm_fwd(params, x, ld0)
    x2, ld2 = ops.actnorm_rev(params, z, ld)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_allclose(ld2, ld0, atol=1e-5)
    # logdet convention: sum(logs) * C (the reference's "per-pixel" quirk)
    expected = jnp.sum(params["logs"]) * 4
    np.testing.assert_allclose(ld, jnp.full(8, expected), rtol=1e-6)


def test_actnorm_data_init_normalizes():
    x = jax.random.normal(KEY, (512, 6)) * 3.0 + 2.0
    params = ops.actnorm_data_init(x)
    z, _ = ops.actnorm_fwd(params, x, jnp.zeros(512))
    np.testing.assert_allclose(np.mean(np.asarray(z), axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.std(np.asarray(z), axis=0), 1.0, atol=1e-3)


def test_invconv_roundtrip():
    params = ops.init_invconv_lu(KEY, 12)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 12))
    ld0 = jnp.zeros(16)
    z, ld = ops.invconv_fwd(params, x, ld0)
    x2, ld2 = ops.invconv_rev(params, z, ld)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_allclose(ld2, ld0, atol=1e-4)


def _perturbed_invconv(key, c):
    """Orthogonal init has logdet ~ 0; perturb so the check is non-trivial."""
    params = ops.init_invconv_lu(key, c)
    jitter = 0.3 * jax.random.normal(jax.random.PRNGKey(99), (c,))
    params["log_s"] = params["log_s"] + jitter
    return params


def test_invconv_logdet_matches_slogdet():
    params = _perturbed_invconv(KEY, 8)
    l, u = ops._lu_factors(params)
    w = params["p"] @ l @ u
    _, ref_logdet = np.linalg.slogdet(np.asarray(w))
    x = jnp.zeros((1, 8))
    _, ld = ops.invconv_fwd(params, x, jnp.zeros(1))
    np.testing.assert_allclose(float(ld[0]), ref_logdet * 8, rtol=1e-5)


def test_invconv_logdet_vs_numerical_jacobian():
    params = _perturbed_invconv(KEY, 6)

    def f(x):
        z, _ = ops.invconv_fwd(params, x[None], jnp.zeros(1))
        return z[0]

    x = jax.random.normal(jax.random.PRNGKey(2), (6,))
    jac = jax.jacfwd(f)(x)
    _, num_logdet = np.linalg.slogdet(np.asarray(jac))
    _, ld = ops.invconv_fwd(params, x[None], jnp.zeros(1))
    np.testing.assert_allclose(float(ld[0]) / 6, num_logdet, rtol=1e-5)


def test_permute_roundtrip():
    for shuffle in (True, False):
        params = ops.init_permute(KEY, 9, shuffle)
        x = jax.random.normal(KEY, (4, 9))
        z, _ = ops.permute_fwd(params, x, jnp.zeros(4))
        x2, _ = ops.permute_rev(params, z, jnp.zeros(4))
        np.testing.assert_allclose(x2, x)


def test_linear_zeros_starts_at_zero():
    params = ops.init_linear_zeros(10, 6)
    x = jax.random.normal(KEY, (3, 10))
    np.testing.assert_array_equal(np.asarray(ops.linear_zeros(params, x)), 0.0)


def test_gaussian_logp():
    x = jnp.zeros((2, 5))
    expected = -0.5 * np.log(2 * np.pi) * 5
    np.testing.assert_allclose(ops.gaussian_logp(x), expected, rtol=1e-6)


def test_split_cross_semantics():
    h = jnp.arange(8.0)[None]
    shift, scale = ops.split_cross(h)
    np.testing.assert_array_equal(np.asarray(shift[0]), [0, 2, 4, 6])
    np.testing.assert_array_equal(np.asarray(scale[0]), [1, 3, 5, 7])


def test_affine_scale_clamp():
    raw = jnp.array([-100.0, 0.0, 100.0])
    scale = ops.affine_scale(raw, 1e-4)
    assert float(scale[0]) == pytest.approx(1e-4)
    assert float(scale[1]) == pytest.approx(1.0 / (1.0 + np.exp(-2.0)), rel=1e-6)
    assert float(scale[2]) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Torch parity of recurrent cells (gate math + layout)
# ---------------------------------------------------------------------------

def _torch_cells():
    torch = pytest.importorskip("torch")
    return torch


def test_gru_cell_matches_torch():
    torch = _torch_cells()
    torch.manual_seed(0)
    cell = torch.nn.GRUCell(5, 7)
    params = {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = np.random.default_rng(0).standard_normal((3, 5)).astype(np.float32)
    h = np.random.default_rng(1).standard_normal((3, 7)).astype(np.float32)
    ref = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    got = rnn.gru_cell(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_lstm_cell_matches_torch():
    torch = _torch_cells()
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(5, 7)
    params = {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = np.random.default_rng(0).standard_normal((3, 5)).astype(np.float32)
    h = np.random.default_rng(1).standard_normal((3, 7)).astype(np.float32)
    c = np.random.default_rng(2).standard_normal((3, 7)).astype(np.float32)
    rh, rc = cell(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))
    gh, gc = rnn.lstm_cell(params, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(gh), rh.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), rc.detach().numpy(), atol=1e-5)


def test_gru_scan_matches_torch_gru():
    torch = _torch_cells()
    torch.manual_seed(1)
    layer = torch.nn.GRU(input_size=4, hidden_size=6, batch_first=True)
    params = {
        "w_ih": jnp.asarray(layer.weight_ih_l0.detach().numpy()),
        "w_hh": jnp.asarray(layer.weight_hh_l0.detach().numpy()),
        "b_ih": jnp.asarray(layer.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(layer.bias_hh_l0.detach().numpy()),
    }
    x = np.random.default_rng(3).standard_normal((2, 9, 4)).astype(np.float32)
    seq, h_n = layer(torch.from_numpy(x))
    ys, h_last = rnn.gru_scan(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ys), seq.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), h_n[0].detach().numpy(), atol=1e-5)
    # the reference's encoder output is concat(seq[:, -1], h_n[0]) — identical
    # tensors for a single-layer GRU (models.py:64)
    np.testing.assert_allclose(seq[:, -1].detach().numpy(), h_n[0].detach().numpy(),
                               atol=1e-6)

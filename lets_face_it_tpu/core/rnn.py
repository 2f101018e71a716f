"""Recurrent cells as pure functions over parameter pytrees.

The gate math and parameter initialisation deliberately match
``torch.nn.GRUCell`` / ``torch.nn.LSTMCell`` / single-layer ``torch.nn.GRU`` so
that (a) checkpoints exported from the PyTorch reference
(/root/reference/code/glow_pytorch/glow/models.py:176-214, 21-34) can be
imported verbatim, and (b) training dynamics from random init are statistically
comparable. All functions are jit/scan/vmap friendly: no Python state, hidden
state is threaded explicitly.

Parameter layout (a dict pytree):
    w_ih: [3H or 4H, in]   gate order GRU: (r, z, n); LSTM: (i, f, g, o)
    w_hh: [3H or 4H, H]
    b_ih, b_hh: [3H or 4H]
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_gru_cell(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """U(-1/sqrt(H), 1/sqrt(H)) for all tensors, as torch does."""
    k = 1.0 / math.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(keys[0], (3 * hidden_size, input_size), k, dtype),
        "w_hh": _uniform(keys[1], (3 * hidden_size, hidden_size), k, dtype),
        "b_ih": _uniform(keys[2], (3 * hidden_size,), k, dtype),
        "b_hh": _uniform(keys[3], (3 * hidden_size,), k, dtype),
    }


def init_lstm_cell(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    k = 1.0 / math.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(keys[0], (4 * hidden_size, input_size), k, dtype),
        "w_hh": _uniform(keys[1], (4 * hidden_size, hidden_size), k, dtype),
        "b_ih": _uniform(keys[2], (4 * hidden_size,), k, dtype),
        "b_hh": _uniform(keys[3], (4 * hidden_size,), k, dtype),
    }


def gru_cell(params, x, h):
    """One GRU step. x: [..., in], h: [..., H] -> new h.

    r = sig(Wr x + br + Ur h + cr)
    z = sig(Wz x + bz + Uz h + cz)
    n = tanh(Wn x + bn + r * (Un h + cn))
    h' = (1 - z) n + z h
    """
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell(params, x, state):
    """One LSTM step. state = (h, c)."""
    h, c = state
    gates = x @ params["w_ih"].T + params["b_ih"] + h @ params["w_hh"].T + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell_precomputed(params, gi, h):
    """GRU step with the input-side projection (gi = x @ W_ih^T + b_ih)
    already computed. Only the recurrent matmul remains sequential."""
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(params, xs, h0=None, *, unroll: int = 1, remat: bool = False):
    """Run a GRU over the time axis. xs: [B, T, in] -> (outputs [B, T, H], h_T).

    Equivalent to a single-layer batch_first ``torch.nn.GRU``. The scan is
    over T with the full batch on the MXU each step. (Hoisting the input-side
    gate projections out of the scan — the cuDNN trick — was measured 2x
    SLOWER here: it
    materializes a [B, T, 3H] gate tensor through HBM that far outweighs the
    recomputed small x-projection; unrolling this scan likewise slowed the
    backward pass. This model is bandwidth-, not FLOP-bound.)

    ``remat=True`` recomputes the gate activations in the backward pass
    instead of saving ~6 [T, B, H] buffers — the conditioning encoders run
    this scan with per-step batch B*N, where those buffers are what OOMs
    the training step at batch 1024 (30.9 GiB requested on a 16 GiB v5e).
    """
    hidden = params["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros(xs.shape[:-2] + (hidden,), xs.dtype)

    def step(h, x_t):
        h_new = gru_cell(params, x_t, h)
        return h_new, h_new

    if remat:
        step = jax.checkpoint(step)
    h_last, ys = jax.lax.scan(step, h0, jnp.moveaxis(xs, -2, 0),
                              unroll=unroll)
    return jnp.moveaxis(ys, 0, -2), h_last


def lstm_scan(params, xs, state0=None, *, unroll: int = 1,
              remat: bool = False):
    """Single-layer LSTM over time. xs: [B, T, in] -> (outputs, (h_T, c_T))."""
    hidden = params["w_hh"].shape[1]
    if state0 is None:
        zeros = jnp.zeros(xs.shape[:-2] + (hidden,), xs.dtype)
        state0 = (zeros, zeros)

    def step(state, x_t):
        h_new, c_new = lstm_cell(params, x_t, state)
        return (h_new, c_new), h_new

    if remat:
        step = jax.checkpoint(step)
    state_last, ys = jax.lax.scan(step, state0, jnp.moveaxis(xs, -2, 0),
                                  unroll=unroll)
    return jnp.moveaxis(ys, 0, -2), state_last

"""Fused Pallas TPU kernels for the training-path flow sequence.

The teacher-forced NLL forward (reference models.py:534-561 runs it as a
per-frame Python loop; our XLA path as ``lax.scan`` over frames of a
``lax.scan`` over the K steps, model/seqglow.py) is here ONE Pallas kernel
for the entire ``[N frames x K steps]`` traversal, and its backward is a
hand-derived VJP running a second, mirror kernel:

* grid = (batch_tiles, frames). Frames iterate sequentially per batch tile
  (TPU grids execute in order) with the K coupling-GRU hidden states carried
  in a VMEM scratch buffer across grid steps — the scan carry never touches
  HBM between frames.
* the large per-step GRU input weights and the per-(frame, step) conditioning
  projections stream HBM -> VMEM with double-buffered async DMA; the
  recurrent/output/actnorm/1x1 weights stay VMEM-resident for the whole call.
* the forward saves exactly two residual stacks: each step's input ``z``
  ([N, K, B, C]) and each step's output hidden state ([N, K, B, H]) — far
  smaller than XLA autodiff's saved gate activations.
* the backward kernel walks frames in reverse, recomputes each step's
  activations from the residuals (remat in VMEM), threads the serial
  cotangent chains (d_z within a frame, d_state across frames), and emits
  per-(frame, step) *local* gate cotangents. All weight gradients then become
  a handful of large MXU einsums outside the kernel — contraction over
  ``N*B`` is exactly what the systolic array wants, and it keeps the kernel
  free of weight-gradient accumulation machinery.

Math matches ``model/flow.py::frame_fwd`` (and therefore the reference's NLL
semantics: ``sigmoid(s+2).clamp(eps)`` coupling scale, x C logdet convention)
bit-for-bit at HIGHEST matmul precision; equivalence of values AND gradients
against the XLA autodiff path is asserted in tests/test_pallas_train.py
(interpret mode) and re-validated compiled on TPU by tools/fused_train_probe.py.

Envelope: GRU + affine + invconv flows with Mosaic-tileable dims (the final
model), batch a multiple of 32 (sublane granularity is 8; 32-row tiles keep
the final model's b256 fused across a v5e-8 data-parallel mesh — 32 rows
per shard). Everything else falls back to the XLA path with a loud warning
(model/seqglow.py gates on ``train_fused_supported``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lets_face_it_tpu.core import ops
from lets_face_it_tpu.model.spec import FlowSpec

# v5e has 128 MiB of physical VMEM; the Mosaic default scoped limit (16 MiB)
# is too small for the backward kernel's working set at batch-tile 64.
_VMEM_LIMIT = 48 * 1024 * 1024

# Tests flip these to exercise the fused path on CPU (interpret mode) or to
# force the XLA path in probes.
INTERPRET = False
ENABLED = True

# When set (e.g. "tpu"), the auto-gate in model/seqglow.py pretends to run on
# this backend — used by __graft_entry__.dryrun_multichip and tests to drive
# the real gate logic on virtual CPU meshes (with INTERPRET standing in for
# Mosaic). None = use jax.default_backend().
GATE_BACKEND_OVERRIDE: str | None = None

# Batch-tile sizes (rows per kernel invocation). Larger tiles mean fewer
# sequential (frame x step) kernel iterations — the serial chain is the cost —
# at the price of VMEM working set (see _VMEM_LIMIT). Swept on a v5e at b256
# in tools/fused_train_probe.py: (128,64) 1.10x, (256,128) 1.12x, (256,256)
# 1.12x over the XLA path. BT_BWD stays at 128: the backward kernel at tile
# 256 needs 48.8 MiB of scoped VMEM, which only fits while the batch-tile
# grid dim is 1 (it blew the limit at b512/b1024); 128 measured identically.
BT_FWD = 256
BT_BWD = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _largest_dividing_tile(b: int, cap: int) -> int:
    """Largest multiple-of-32 batch tile <= cap that divides b (the gate
    guarantees b % 32 == 0, but e.g. b=384 is not divisible by a 256 tile).
    Batches with no such tile — reachable only through an explicit
    ``use_fused`` override, e.g. tiny interpret-mode tests — run as one
    tile."""
    bt = min(b, cap)
    bt -= bt % 32
    while bt >= 32 and b % bt:
        bt -= 32
    return bt if bt >= 32 else b


class TrainWeights(NamedTuple):
    """Flow weights prepared for the fused forward/backward kernels.

    Built by ``prepare_train_weights`` with plain differentiable jnp ops, so
    the custom VJP's cotangents on these arrays chain back to the original
    parameter pytree through ordinary autodiff.
    """
    w: jnp.ndarray          # [K, C, C]   P @ L @ U
    an_bias: jnp.ndarray    # [K, C]
    an_scale: jnp.ndarray   # [K, C]      exp(actnorm logs)
    w_ih_t: jnp.ndarray     # [K, in_pad, 3H] (transposed, zero-padded rows)
    w_hh_t: jnp.ndarray     # [K, H, 3H]
    b_ih: jnp.ndarray       # [K, 3H]
    b_hh: jnp.ndarray       # [K, 3H]
    out_w_t: jnp.ndarray    # [K, H, Cout] rows permuted: [shift | scale]
    out_b: jnp.ndarray      # [K, Cout]   permuted + logscale folded


def train_fused_spec_supported(spec: FlowSpec) -> bool:
    """Configuration half of the kernel envelope: GRU + affine + invconv
    flows with lane-tileable weight shapes (the final model: H=128,
    cond=512). Batch legality is checked separately so callers can warn
    loudly when the *sharded* batch — not the model — disengages the fused
    path (VERDICT r2 weak #2)."""
    return (ENABLED
            and spec.rnn_type == "gru" and spec.coupling == "affine"
            and spec.permutation == "invconv"
            and spec.channels % 2 == 0
            and (3 * spec.hidden_channels) % 128 == 0
            and spec.cond.cond_dim % 128 == 0)


def train_fused_supported(spec: FlowSpec, batch_size: int) -> bool:
    """Full kernel envelope. The (per-shard) batch must divide into
    multiple-of-32-row tiles — sublane granularity is 8, and 32-row tiles
    are Mosaic-legal and validated compiled on a v5e by
    tools/fused_train_probe.py — so the final model's batch 256 stays fused
    on a v5e-8 data-parallel mesh (32 rows per shard)."""
    return (train_fused_spec_supported(spec)
            and batch_size >= 32 and batch_size % 32 == 0)


def prepare_train_weights(spec: FlowSpec, flow_params) -> TrainWeights:
    assert spec.rnn_type == "gru" and spec.coupling == "affine"
    assert spec.permutation == "invconv"
    cout = spec.coupling_out_dim

    # materialize W = P L U once per call (the XLA path re-forms it every
    # frame inside the scan; it is loop-invariant)
    def materialize(p):
        eye = jnp.eye(spec.channels, dtype=p["l"].dtype)
        w, _ = ops.invconv_fwd(p, eye, jnp.zeros((), eye.dtype))
        return w

    with jax.default_matmul_precision("highest"):
        w = jax.vmap(materialize)(flow_params["perm"])

    from lets_face_it_tpu.ops.pallas_flow import fold_output_head, pad_w_ih_t

    out_w, out_b = fold_output_head(flow_params["out"], cout)

    return TrainWeights(
        w=w,
        an_bias=flow_params["actnorm"]["bias"],
        an_scale=jnp.exp(flow_params["actnorm"]["logs"]),
        w_ih_t=pad_w_ih_t(flow_params["rnn"]["w_ih"]),
        w_hh_t=jnp.swapaxes(flow_params["rnn"]["w_hh"], 1, 2),
        b_ih=flow_params["rnn"]["b_ih"],
        b_hh=flow_params["rnn"]["b_hh"],
        out_w_t=jnp.swapaxes(out_w, 1, 2),
        out_b=out_b,
    )


def logdet_const(spec: FlowSpec, flow_params) -> jnp.ndarray:
    """Data-independent logdet per frame: (sum(actnorm logs) + sum(log|s|))
    * C summed over the K steps (modules.py:62,171 x-C convention)."""
    c = spec.channels
    return (jnp.sum(flow_params["actnorm"]["logs"])
            + jnp.sum(flow_params["perm"]["log_s"])) * c


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(spec: FlowSpec, precision,
                xs_ref, states0_ref,                  # VMEM blocks
                cond_hbm, w_ih_hbm,                   # streamed
                w_ref, an_bias_ref, an_scale_ref,
                w_hh_ref, b_ih_ref, b_hh_ref,
                out_w_ref, out_b_ref,
                z_out, scales_out, zs_out, st_out,    # outputs
                states_scr, w_buf, cond_buf,          # scratch
                w_sems, c_sems):
    k_steps = spec.n_steps
    z1d = spec.z1_dim
    half = spec.coupling_out_dim // 2
    hdim = spec.hidden_channels
    bt = xs_ref.shape[1]

    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        states_scr[:] = states0_ref[:]

    def w_dma(slot, k):
        return pltpu.make_async_copy(w_ih_hbm.at[k], w_buf.at[slot],
                                     w_sems.at[slot])

    def c_dma(slot, k):
        return pltpu.make_async_copy(
            cond_hbm.at[it, k, pl.ds(ib * bt, bt), :], cond_buf.at[slot],
            c_sems.at[slot])

    w_dma(0, 0).start()
    c_dma(0, 0).start()

    def body(k, z):
        slot = k % 2

        @pl.when(k + 1 < k_steps)
        def _():
            w_dma((k + 1) % 2, k + 1).start()
            c_dma((k + 1) % 2, k + 1).start()

        w_dma(slot, k).wait()
        c_dma(slot, k).wait()

        zs_out[0, k] = z                                   # residual
        za = (z + an_bias_ref[k]) * an_scale_ref[k]
        zb = jnp.dot(za, w_ref[k], preferred_element_type=jnp.float32,
                     precision=precision)
        z1 = zb[:, :z1d]
        z2 = zb[:, z1d:]

        cond_t = jax.nn.leaky_relu(cond_buf[slot], 0.01)
        rnn_in = jnp.concatenate([z1, cond_t], axis=-1)
        in_pad = w_buf.shape[1] - rnn_in.shape[-1]
        if in_pad:
            rnn_in = jnp.concatenate(
                [rnn_in, jnp.zeros((bt, in_pad), rnn_in.dtype)], axis=-1)

        gi = jnp.dot(rnn_in, w_buf[slot], preferred_element_type=jnp.float32,
                     precision=precision) + b_ih_ref[k]
        h_prev = states_scr[k]
        gh = jnp.dot(h_prev, w_hh_ref[k], preferred_element_type=jnp.float32,
                     precision=precision) + b_hh_ref[k]
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        u = jax.nn.sigmoid(gi[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        h_new = (1.0 - u) * n + u * h_prev
        states_scr[k] = h_new
        st_out[0, k] = h_new                               # residual

        hout = jnp.dot(h_new, out_w_ref[k], preferred_element_type=jnp.float32,
                       precision=precision) + out_b_ref[k]
        shift = hout[:, :half]
        scale = jnp.maximum(jax.nn.sigmoid(hout[:, half:] + 2.0),
                            spec.scale_eps)
        scales_out[0, k] = scale
        z2 = (z2 + shift) * scale
        return jnp.concatenate([z1, z2], axis=-1)

    z_out[0] = jax.lax.fori_loop(0, k_steps, body, xs_ref[0])


def _seq_fwd_call(spec: FlowSpec, bt: int, interpret: bool, precision,
                  tw: TrainWeights, xs, cond_seq, states0):
    n, b, c = xs.shape
    k = spec.n_steps
    h = spec.hidden_channels
    half = spec.coupling_out_dim // 2
    bt = min(bt, b)
    assert b % bt == 0, (b, bt)
    grid = (b // bt, n)

    kernel = partial(_fwd_kernel, spec, precision)
    z_seq, scales_seq, zs_res, states_res = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n, b, c), xs.dtype),
            jax.ShapeDtypeStruct((n, k, b, half), xs.dtype),
            jax.ShapeDtypeStruct((n, k, b, c), xs.dtype),
            jax.ShapeDtypeStruct((n, k, b, h), xs.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),            # xs
            pl.BlockSpec((k, bt, h), lambda ib, it: (0, ib, 0),
                         memory_space=pltpu.VMEM),            # states0
            pl.BlockSpec(memory_space=pl.ANY),                # cond (streamed)
            pl.BlockSpec(memory_space=pl.ANY),                # w_ih (streamed)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w
            pl.BlockSpec(memory_space=pltpu.VMEM),            # an_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),            # an_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),            # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),            # out_b
        ],
        out_specs=(
            pl.BlockSpec((1, bt, c), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, half), lambda ib, it: (it, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, c), lambda ib, it: (it, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, h), lambda ib, it: (it, 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, bt, h), jnp.float32),
            pltpu.VMEM((2,) + tw.w_ih_t.shape[1:], jnp.float32),
            pltpu.VMEM((2, bt, spec.cond.cond_dim), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xs, states0, cond_seq, tw.w_ih_t, tw.w, tw.an_bias, tw.an_scale,
      tw.w_hh_t, tw.b_ih, tw.b_hh, tw.out_w_t, tw.out_b)
    return z_seq, scales_seq, zs_res, states_res


# ---------------------------------------------------------------------------
# Backward kernel (serial chains only; weight grads are einsums outside)
# ---------------------------------------------------------------------------

def _bwd_kernel(spec: FlowSpec, nframes: int, precision,
                dz_ref, dscales_ref, zs_ref, hprev_ref, dnew_states_ref,
                cond_hbm, w_ih_hbm,
                w_ref, an_bias_ref, an_scale_ref,
                w_hh_ref, b_ih_ref, b_hh_ref,
                out_w_ref, out_b_ref,
                dx_out, dstates0_out, dgi_out, dghn_out, dhout_out, dzb_out,
                dstates_scr, w_buf, cond_buf,
                w_sems, c_sems):
    k_steps = spec.n_steps
    z1d = spec.z1_dim
    z1up = min(_round_up(z1d, 8), w_buf.shape[1])
    half = spec.coupling_out_dim // 2
    hdim = spec.hidden_channels
    bt = dz_ref.shape[1]

    ib = pl.program_id(0)
    it = pl.program_id(1)
    t = nframes - 1 - it                       # actual frame index

    @pl.when(it == 0)
    def _():
        dstates_scr[:] = dnew_states_ref[:]

    def w_dma(slot, k):
        return pltpu.make_async_copy(w_ih_hbm.at[k], w_buf.at[slot],
                                     w_sems.at[slot])

    def c_dma(slot, k):
        return pltpu.make_async_copy(
            cond_hbm.at[t, k, pl.ds(ib * bt, bt), :], cond_buf.at[slot],
            c_sems.at[slot])

    w_dma(0, k_steps - 1).start()
    c_dma(0, k_steps - 1).start()

    def body(i, dz):
        k = k_steps - 1 - i
        slot = i % 2

        @pl.when(i + 1 < k_steps)
        def _():
            w_dma((i + 1) % 2, k - 1).start()
            c_dma((i + 1) % 2, k - 1).start()

        w_dma(slot, k).wait()
        c_dma(slot, k).wait()

        # ---- recompute the forward step k from the residuals
        z_in = zs_ref[0, k]
        za = (z_in + an_bias_ref[k]) * an_scale_ref[k]
        zb = jnp.dot(za, w_ref[k], preferred_element_type=jnp.float32,
                     precision=precision)
        z2 = zb[:, z1d:]
        cond_t = jax.nn.leaky_relu(cond_buf[slot], 0.01)
        rnn_in = jnp.concatenate([zb[:, :z1d], cond_t], axis=-1)
        in_pad = w_buf.shape[1] - rnn_in.shape[-1]
        if in_pad:
            rnn_in = jnp.concatenate(
                [rnn_in, jnp.zeros((bt, in_pad), rnn_in.dtype)], axis=-1)
        gi = jnp.dot(rnn_in, w_buf[slot], preferred_element_type=jnp.float32,
                     precision=precision) + b_ih_ref[k]
        h_prev = hprev_ref[0, k]
        gh = jnp.dot(h_prev, w_hh_ref[k], preferred_element_type=jnp.float32,
                     precision=precision) + b_hh_ref[k]
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        u = jax.nn.sigmoid(gi[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        h_new = (1.0 - u) * n + u * h_prev
        hout = jnp.dot(h_new, out_w_ref[k], preferred_element_type=jnp.float32,
                       precision=precision) + out_b_ref[k]
        shift = hout[:, :half]
        sig = jax.nn.sigmoid(hout[:, half:] + 2.0)
        scale = jnp.maximum(sig, spec.scale_eps)

        # ---- backward through the step
        dz1 = dz[:, :z1d]
        dz2p = dz[:, z1d:]
        dscale = dz2p * (z2 + shift) + dscales_ref[0, k]
        dshift = dz2p * scale
        dz2 = dz2p * scale
        dsig = jnp.where(sig > spec.scale_eps, dscale, 0.0)
        dsraw = dsig * sig * (1.0 - sig)
        dhout = jnp.concatenate([dshift, dsraw], axis=-1)
        dhout_out[0, k] = dhout

        dh_new = jax.lax.dot_general(
            dhout, out_w_ref[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dh_new = dh_new + dstates_scr[k]

        du = dh_new * (h_prev - n)
        dn = dh_new * (1.0 - u)
        dh_prev = dh_new * u
        dgn = dn * (1.0 - n * n)
        dr = dgn * gh[:, 2 * hdim:]
        dghn = dgn * r
        dgr = dr * r * (1.0 - r)
        dgu = du * u * (1.0 - u)
        dgi = jnp.concatenate([dgr, dgu, dgn], axis=-1)
        dgh = jnp.concatenate([dgr, dgu, dghn], axis=-1)
        dgi_out[0, k] = dgi
        dghn_out[0, k] = dghn

        dh_prev = dh_prev + jax.lax.dot_general(
            dgh, w_hh_ref[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dstates_scr[k] = dh_prev

        # z1 feeds both the passthrough and the coupling net input
        dz1_rnn = jax.lax.dot_general(
            dgi, w_buf[slot][:z1up, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dz1 = dz1 + dz1_rnn[:, :z1d]

        dzb = jnp.concatenate([dz1, dz2], axis=-1)
        dzb_out[0, k] = dzb
        dza = jax.lax.dot_general(
            dzb, w_ref[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return dza * an_scale_ref[k]

    dx_out[0] = jax.lax.fori_loop(0, k_steps, body, dz_ref[0])

    @pl.when(it == nframes - 1)
    def _():
        dstates0_out[:] = dstates_scr[:]


def _seq_bwd_call(spec: FlowSpec, bt: int, interpret: bool, precision,
                  tw: TrainWeights, cond_seq, zs_res, hprev_all,
                  dz_seq, dscales_seq, dnew_states):
    n, b, c = dz_seq.shape
    k = spec.n_steps
    h = spec.hidden_channels
    h3 = 3 * h
    half = spec.coupling_out_dim // 2
    cout = spec.coupling_out_dim
    bt = min(bt, b)
    assert b % bt == 0, (b, bt)
    grid = (b // bt, n)

    def rev(ib, it):
        return (n - 1 - it, ib, 0)

    def rev4(ib, it):
        return (n - 1 - it, 0, ib, 0)

    kernel = partial(_bwd_kernel, spec, n, precision)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n, b, c), jnp.float32),       # dx
            jax.ShapeDtypeStruct((k, b, h), jnp.float32),       # dstates0
            jax.ShapeDtypeStruct((n, k, b, h3), jnp.float32),   # dgi
            jax.ShapeDtypeStruct((n, k, b, h), jnp.float32),    # dghn
            jax.ShapeDtypeStruct((n, k, b, cout), jnp.float32), # dhout
            jax.ShapeDtypeStruct((n, k, b, c), jnp.float32),    # dzb
        ),
        in_specs=[
            pl.BlockSpec((1, bt, c), rev, memory_space=pltpu.VMEM),      # dz
            pl.BlockSpec((1, k, bt, half), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, c), rev4, memory_space=pltpu.VMEM),  # zs
            pl.BlockSpec((1, k, bt, h), rev4, memory_space=pltpu.VMEM),  # hprev
            pl.BlockSpec((k, bt, h), lambda ib, it: (0, ib, 0),
                         memory_space=pltpu.VMEM),               # dnew_states
            pl.BlockSpec(memory_space=pl.ANY),                   # cond
            pl.BlockSpec(memory_space=pl.ANY),                   # w_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),               # w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # an_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),               # an_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),               # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),               # b_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),               # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),               # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),               # out_b
        ],
        out_specs=(
            pl.BlockSpec((1, bt, c), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bt, h), lambda ib, it: (0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, h3), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, h), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, cout), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bt, c), rev4, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, bt, h), jnp.float32),
            pltpu.VMEM((2,) + tw.w_ih_t.shape[1:], jnp.float32),
            pltpu.VMEM((2, bt, spec.cond.cond_dim), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dz_seq, dscales_seq, zs_res, hprev_all, dnew_states, cond_seq,
      tw.w_ih_t, tw.w, tw.an_bias, tw.an_scale, tw.w_hh_t, tw.b_ih, tw.b_hh,
      tw.out_w_t, tw.out_b)
    return outs


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flow_seq_fused(spec: FlowSpec, bt_fwd: int, bt_bwd: int, interpret: bool,
                    precision, tw: TrainWeights, xs, cond_seq, states0):
    out, _ = _flow_seq_fwd(spec, bt_fwd, bt_bwd, interpret, precision, tw,
                           xs, cond_seq, states0)
    return out


def _flow_seq_fwd(spec, bt_fwd, bt_bwd, interpret, precision, tw, xs,
                  cond_seq, states0):
    z_seq, scales_seq, zs_res, states_res = _seq_fwd_call(
        spec, bt_fwd, interpret, precision, tw, xs, cond_seq, states0)
    new_states = states_res[-1]
    return ((z_seq, scales_seq, new_states),
            (tw, cond_seq, states0, zs_res, states_res))


def _flow_seq_bwd(spec, bt_fwd, bt_bwd, interpret, precision, res, cot):
    tw, cond_seq, states0, zs_res, states_res = res
    dz_seq, dscales_seq, dnew_states = cot
    z1d = spec.z1_dim
    cdim = spec.cond.cond_dim
    h = spec.hidden_channels

    hprev_all = jnp.concatenate([states0[None], states_res[:-1]], axis=0)
    dx, dstates0, dgi, dghn, dhout, dzb = _seq_bwd_call(
        spec, bt_bwd, interpret, precision, tw, cond_seq, zs_res, hprev_all,
        dz_seq, dscales_seq, dnew_states)

    # ---- weight gradients: large MXU contractions over (frames x batch)
    ein = partial(jnp.einsum, precision=precision)
    za = (zs_res + tw.an_bias[None, :, None, :]) * tw.an_scale[None, :, None, :]
    zb = ein("nkbc,kcd->nkbd", za, tw.w)
    z1 = zb[..., :z1d]
    cond_t = jax.nn.leaky_relu(cond_seq, 0.01)
    dgh = jnp.concatenate([dgi[..., :2 * h], dghn], axis=-1)

    dza = ein("nkbd,kcd->nkbc", dzb, tw.w)
    d_w = ein("nkbc,nkbd->kcd", za, dzb)
    d_an_bias = jnp.sum(dza * tw.an_scale[None, :, None, :], axis=(0, 2))
    d_an_scale = jnp.sum(dza * (zs_res + tw.an_bias[None, :, None, :]),
                         axis=(0, 2))
    d_wih = jnp.concatenate([
        ein("nkbi,nkbg->kig", z1, dgi),
        ein("nkbi,nkbg->kig", cond_t, dgi),
    ], axis=1)
    pad = tw.w_ih_t.shape[1] - d_wih.shape[1]
    if pad:
        d_wih = jnp.pad(d_wih, ((0, 0), (0, pad), (0, 0)))
    d_whh = ein("nkbh,nkbg->khg", hprev_all, dgh)
    d_outw = ein("nkbh,nkbo->kho", states_res, dhout)

    dtw = TrainWeights(
        w=d_w,
        an_bias=d_an_bias,
        an_scale=d_an_scale,
        w_ih_t=d_wih,
        w_hh_t=d_whh,
        b_ih=jnp.sum(dgi, axis=(0, 2)),
        b_hh=jnp.sum(dgh, axis=(0, 2)),
        out_w_t=d_outw,
        out_b=jnp.sum(dhout, axis=(0, 2)),
    )
    dcond = ein("nkbg,kig->nkbi", dgi, tw.w_ih_t[:, z1d:z1d + cdim, :])
    dcond = dcond * jnp.where(cond_seq > 0, 1.0, 0.01)
    return dtw, dx, dcond, dstates0


_flow_seq_fused.defvjp(_flow_seq_fwd, _flow_seq_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def flow_sequence_fused(spec: FlowSpec, flow_params, xs, cond_seq, states0, *,
                        bt_fwd: int | None = None, bt_bwd: int | None = None,
                        interpret: bool | None = None, precision=None):
    """Fused teacher-forced flow traversal over a whole sequence.

    xs: [N, B, C] frames; cond_seq: [N, K, B, cond_dim] pre-projected
    conditioning (``flow.project_cond_frames``); states0: [K, B, H].

    Returns (z_seq [N, B, C], logdet [N, B], new_states, scales [N, K, B,
    half]) — drop-in for the XLA frame scan in ``seqglow.sequence_nll``, with
    a hand-derived VJP.
    """
    if interpret is None:
        interpret = INTERPRET
    b = xs.shape[1]
    if not interpret and b % 32:
        # The auto-gate (seqglow._auto_use_fused) never routes such batches
        # here, but an explicit use_fused override could: a non-multiple-of-32
        # batch tile is an illegal Mosaic sublane tiling, so fail loudly
        # before the compiler does (interpret mode has no such constraint).
        raise ValueError(
            f"fused training kernels require batch % 32 == 0 when compiled "
            f"on TPU (got b={b}); use the XLA path or pad the batch")
    if bt_fwd is None:
        bt_fwd = _largest_dividing_tile(b, BT_FWD)
    if bt_bwd is None:
        bt_bwd = _largest_dividing_tile(b, BT_BWD)
    if precision is None:
        from lets_face_it_tpu.ops.pallas_flow import ambient_matmul_precision

        precision = ambient_matmul_precision()
    tw = prepare_train_weights(spec, flow_params)
    z_seq, scales_seq, new_states = _flow_seq_fused(
        spec, bt_fwd, bt_bwd, bool(interpret), precision, tw, xs, cond_seq,
        states0)
    logdet = (jnp.sum(jnp.log(scales_seq), axis=(1, 3))
              + logdet_const(spec, flow_params))
    return z_seq, logdet, new_states, scales_seq

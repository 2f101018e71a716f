"""Fused Pallas TPU kernel for the sampling-path flow frame step.

One kernel inverts a frame through all K flow steps (coupling -> 1x1 ->
actnorm, reverse order) with the coupling-GRU states updated in place:

* the large per-step GRU input weights stream HBM -> VMEM with double-buffered
  async DMA (prefetch step k+1 during step k's compute);
* recurrent/output/actnorm/1x1 weights stay VMEM-resident across all K steps;
* the LU 1x1 inverse is pre-materialized outside the kernel (triangular
  solves once per sampling call), so the in-kernel inverse is one matmul;
* the coupling head's even/odd shift/scale interleave (thops.py:36-44) is
  pre-permuted into contiguous halves by reordering the output-projection
  rows, so the kernel slices contiguously along lanes.

Used by ``seqglow.sequence_sample`` on TPU (inference path only — training
uses the autodiff-friendly XLA path). Equivalence to the XLA path is asserted
in tests (interpret mode on CPU) and at import-choice time the caller can
force either path.
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


def ambient_matmul_precision() -> jax.lax.Precision:
    """The Precision matching the ambient ``jax_default_matmul_precision``
    at trace time, so the in-kernel dots follow the caller's f32/bf16 choice
    (HIGHEST costs 6 bf16 MXU passes per f32 matmul; DEFAULT costs 1)."""
    v = jax.config.jax_default_matmul_precision
    if v in ("highest", "float32"):
        return jax.lax.Precision.HIGHEST
    if v in ("high", "bfloat16_3x", "tensorfloat32"):
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def fold_output_head(out_params, cout: int):
    """Fold the linear-zeros learned logscale (core/ops.py::linear_zeros,
    factor 3.0) into weight+bias and permute rows so that ``h @ W^T`` yields
    ``[shift(0::2) | scale_raw(1::2)]`` as contiguous lane halves — shared by
    the sampling and training kernel preps so the coupling-head math cannot
    drift between them."""
    out_scale = jnp.exp(out_params["logs"] * 3.0)
    out_w = out_params["w"] * out_scale[..., None]
    out_b = out_params["b"] * out_scale
    perm = jnp.concatenate([jnp.arange(0, cout, 2), jnp.arange(1, cout, 2)])
    return out_w[:, perm, :], out_b[:, perm]


def pad_w_ih_t(w_ih):
    """[K, 3H, in] -> transposed [K, in_pad, 3H] with the sublane dim padded
    to the (8, 128) f32 tiling; zero rows match zero-padded rnn_in columns
    exactly."""
    w_ih_t = jnp.swapaxes(w_ih, 1, 2)
    pad = (-w_ih_t.shape[1]) % 8
    if pad:
        w_ih_t = jnp.pad(w_ih_t, ((0, 0), (0, pad), (0, 0)))
    return w_ih_t


class SamplingWeights(NamedTuple):
    """Flow weights prepared for the fused reverse kernel."""
    w_ih_t: jnp.ndarray    # [K, Z1+cond, 3H]  (pre-transposed GRU input weights)
    w_hh_t: jnp.ndarray    # [K, H, 3H]
    b_ih: jnp.ndarray      # [K, 3H]
    b_hh: jnp.ndarray      # [K, 3H]
    out_w_t: jnp.ndarray   # [K, H, Cout] rows permuted: [shift | scale] halves
    out_b: jnp.ndarray     # [K, Cout] permuted + logscale folded
    w_inv: jnp.ndarray     # [K, C, C]  right-inverse of P L U
    an_bias: jnp.ndarray   # [K, C]
    an_neg_logs_exp: jnp.ndarray  # [K, C] = exp(-logs)


def prepare_sampling_weights(spec: FlowSpec, flow_params) -> SamplingWeights:
    assert spec.rnn_type == "gru" and spec.coupling == "affine"
    assert spec.permutation == "invconv"
    c = spec.channels
    cout = spec.coupling_out_dim

    # pre-materialize the 1x1 inverses once per call: triangular solves at
    # pinned-HIGHEST matmul precision, then one Newton-Schulz refinement step
    # X <- X (2I - W X) to squeeze the residual toward f32 rounding (the
    # reference reaches the same accuracy by inverting in float64,
    # modules.py:175-177 — unavailable on TPU).
    def invert_one(p):
        eye = jnp.eye(c, dtype=p["l"].dtype)
        x0, _ = ops.invconv_rev(p, eye, jnp.zeros(c))
        w, _ = ops.invconv_fwd(p, eye, jnp.zeros(c))  # rows i: e_i @ W == W
        hi = jax.lax.Precision.HIGHEST
        wx = jnp.dot(w, x0, precision=hi)
        return jnp.dot(x0, 2.0 * eye - wx, precision=hi)

    with jax.default_matmul_precision("highest"):
        w_inv = jax.vmap(invert_one)(flow_params["perm"])

    out_w, out_b = fold_output_head(flow_params["out"], cout)

    return SamplingWeights(
        w_ih_t=pad_w_ih_t(flow_params["rnn"]["w_ih"]),
        w_hh_t=jnp.swapaxes(flow_params["rnn"]["w_hh"], 1, 2),
        b_ih=flow_params["rnn"]["b_ih"],
        b_hh=flow_params["rnn"]["b_hh"],
        out_w_t=jnp.swapaxes(out_w, 1, 2),
        out_b=out_b,
        w_inv=w_inv,
        an_bias=flow_params["actnorm"]["bias"],
        an_neg_logs_exp=jnp.exp(-flow_params["actnorm"]["logs"]),
    )


# Mosaic's default scoped-VMEM budget is 16 MB; the per-frame kernel keeps
# the [K, B, cond] conditioning projections, all K GRU states and its batch-
# wide temporaries on that stack, which OOMs at 512 rows (18.29 MB measured,
# tools/chunked_frame_probe.py). Raise the cap to 48 MiB like the training
# and whole-sequence kernels (v5e has 128 MiB physical VMEM) so 512-row
# calls — the FRAME_FUSED_MAX_BATCH envelope — fit in ONE call.
_FRAME_VMEM_LIMIT = 48 * 1024 * 1024


def _kernel(spec: FlowSpec, precision,
            z_ref, cond_ref, states_ref,            # VMEM inputs
            w_ih_hbm,                               # HBM (streamed)
            w_hh_ref, b_ih_ref, b_hh_ref,
            out_w_ref, out_b_ref, w_inv_ref,
            an_bias_ref, an_neg_ref,
            x_out_ref, states_out_ref,              # outputs
            w_buf, dma_sems):                       # scratch
    k_steps = spec.n_steps
    z1d = spec.z1_dim
    c = spec.channels
    half = spec.coupling_out_dim // 2

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            w_ih_hbm.at[k], w_buf.at[slot], dma_sems.at[slot])

    # reverse order: step K-1 first
    get_dma(0, k_steps - 1).start()

    z = z_ref[:]                                   # [B, C]

    def body(i, z):
        k = k_steps - 1 - i
        slot = i % 2

        @pl.when(i + 1 < k_steps)
        def _():
            get_dma((i + 1) % 2, k - 1).start()

        get_dma(slot, k).wait()

        z1 = z[:, :z1d]
        z2 = z[:, z1d:]
        cond_t = jax.nn.leaky_relu(cond_ref[k], 0.01)
        rnn_in = jnp.concatenate([z1, cond_t], axis=-1)
        in_pad = w_buf.shape[1] - rnn_in.shape[-1]
        if in_pad:
            rnn_in = jnp.concatenate(
                [rnn_in, jnp.zeros((rnn_in.shape[0], in_pad), rnn_in.dtype)],
                axis=-1)

        gi = jnp.dot(rnn_in, w_buf[slot], preferred_element_type=jnp.float32,
                     precision=precision) + b_ih_ref[k]
        h_prev = states_ref[k]
        gh = jnp.dot(h_prev, w_hh_ref[k], preferred_element_type=jnp.float32,
                     precision=precision) + b_hh_ref[k]
        hdim = h_prev.shape[-1]
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        zz = jax.nn.sigmoid(gi[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        h_new = (1.0 - zz) * n + zz * h_prev
        states_out_ref[k] = h_new

        hout = jnp.dot(h_new, out_w_ref[k], preferred_element_type=jnp.float32,
                       precision=precision) + out_b_ref[k]
        shift = hout[:, :half]
        scale = jnp.maximum(jax.nn.sigmoid(hout[:, half:] + 2.0),
                            spec.scale_eps)
        z2 = z2 / scale - shift
        z = jnp.concatenate([z1, z2], axis=-1)

        z = jnp.dot(z, w_inv_ref[k], preferred_element_type=jnp.float32,
                    precision=precision)
        z = z * an_neg_ref[k] - an_bias_ref[k]
        return z

    x_out_ref[:] = jax.lax.fori_loop(0, k_steps, body, z)


@partial(jax.jit, static_argnames=("spec", "interpret", "precision"))
def frame_rev_fused(spec: FlowSpec, weights: SamplingWeights, z, cond_projs,
                    states, *, interpret: bool = False, precision=None):
    """Fused reverse frame step: z [B, C], cond_projs [K, B, cond],
    states [K, B, H] -> (x [B, C], new_states)."""
    b, c = z.shape
    k, _, h3 = weights.w_ih_t.shape[0], None, weights.w_ih_t.shape[2]

    if precision is None:
        precision = ambient_matmul_precision()
    kernel = partial(_kernel, spec, precision)
    x, new_states = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, c), z.dtype),
            jax.ShapeDtypeStruct(states.shape, states.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cond_projs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # states
            pl.BlockSpec(memory_space=pl.ANY),       # w_ih_t (streamed)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_hh_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out_w_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out_b
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_inv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # an_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # an_neg
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2,) + weights.w_ih_t.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FRAME_VMEM_LIMIT),
        interpret=interpret,
    )(z, cond_projs, states, weights.w_ih_t, weights.w_hh_t, weights.b_ih,
      weights.b_hh, weights.out_w_t, weights.out_b, weights.w_inv,
      weights.an_bias, weights.an_neg_logs_exp)
    return x, new_states


def pallas_supported(spec: FlowSpec) -> bool:
    """The fused kernel's envelope: GRU + affine + invconv flows with
    Mosaic-tileable weight shapes — the VMEM-resident per-step slices index
    the lane dimension, so 3H and cond_dim must be multiples of 128 (the
    final model: H=128, cond=512). Anything else falls back to the XLA path."""
    return (spec.rnn_type == "gru" and spec.coupling == "affine"
            and spec.permutation == "invconv"
            and spec.channels % 2 == 0
            and (3 * spec.hidden_channels) % 128 == 0
            and spec.cond.cond_dim % 128 == 0)


# The per-frame kernel has no batch grid: all K GRU states, the [K, B, cond]
# conditioning projections and the working tiles live on the VMEM stack for
# the WHOLE batch. Envelope measured compiled on the v5e (round 5,
# tools/chunked_frame_probe.py --envelope): under Mosaic's DEFAULT 16 MB
# scoped-VMEM budget 512 rows already OOM (18.29 MB); with the cap raised
# to _FRAME_VMEM_LIMIT (48 MiB, like the training kernels) 512 rows compile
# and run, while b1024+ crashes the Mosaic compiler outright (tpu_compile
# helper abort — not a clean OOM message). Larger batches go through
# ``frame_rev_fused_chunked`` (one kernel call per 512-row segment inside
# the same jit).
FRAME_FUSED_MAX_BATCH = 512


def frame_fused_batch_ok(batch_size: int) -> bool:
    """Whether ONE per-frame kernel call's VMEM stack fits this batch
    (larger batches are served by the chunked wrapper)."""
    return batch_size <= FRAME_FUSED_MAX_BATCH


# Each 512-row segment re-streams all K GRU input weights HBM->VMEM
# (~13 MB/call on the final model), so the chunked kernel's lead over the
# XLA step shrinks as segments multiply — measured chained ms/frame on the
# v5e (tools/chunked_frame_probe.py): 2.26x at 2 segments (b1024), 1.07x at
# 8 (b4096); the trend crosses 1x around 16 segments, where the 16-call jit
# also pays a very long Mosaic compile. The AUTO gates therefore stop
# picking the fused path past 8 segments; explicit use_fused=True is
# unrestricted.
FRAME_FUSED_MAX_SEGMENTS = 8


def frame_fused_auto_ok(batch_size: int) -> bool:
    """Whether the auto-gates should serve this batch through the fused
    per-frame kernel (single call or <=FRAME_FUSED_MAX_SEGMENTS chunked
    segments) rather than the XLA step."""
    return batch_size <= FRAME_FUSED_MAX_BATCH * FRAME_FUSED_MAX_SEGMENTS


def frame_rev_fused_chunked(spec: FlowSpec, weights: SamplingWeights, z,
                            cond_projs, states, *, interpret: bool = False,
                            precision=None, chunk: int | None = None):
    """``frame_rev_fused`` for any batch size: rows are processed in
    ``chunk``-row segments (default FRAME_FUSED_MAX_BATCH, resolved at call
    time so tests can shrink it), one kernel call each, inside the same
    compiled step (static Python loop — batch sizes are compile-time
    constants). Values are identical to the unchunked kernel on each
    segment: the batch rows of z/cond_projs/states are independent."""
    if chunk is None:
        chunk = FRAME_FUSED_MAX_BATCH
    b = z.shape[0]
    if b <= chunk:
        return frame_rev_fused(spec, weights, z, cond_projs, states,
                               interpret=interpret, precision=precision)
    xs, sts = [], []
    for i in range(0, b, chunk):
        x_i, st_i = frame_rev_fused(
            spec, weights, z[i:i + chunk], cond_projs[:, i:i + chunk],
            states[:, i:i + chunk], interpret=interpret, precision=precision)
        xs.append(x_i)
        sts.append(st_i)
    return jnp.concatenate(xs, axis=0), jnp.concatenate(sts, axis=1)


# ---------------------------------------------------------------------------
# Whole-sequence fused sampling: the ENTIRE autoregressive generation loop
# (N frames x K reversed steps) as one kernel
# ---------------------------------------------------------------------------

# Tests flip this to exercise the sequence kernel on CPU (interpret mode).
INTERPRET = False

# v5e has 128 MiB physical VMEM; the resident own-face projection slice
# w_p1 (9.2 MB on the final model) plus the streamed buffers exceed the
# 16 MiB Mosaic default.
_SEQ_VMEM_LIMIT = 48 * 1024 * 1024


def sampling_seq_supported(spec: FlowSpec) -> bool:
    """Envelope of the whole-sequence kernel: the frame kernel's envelope
    plus an own-face conditioning that is either absent or the final model's
    'none' encoder (a flat window the kernel maintains as a ring buffer;
    rnn own-face encoders keep the per-frame kernel + XLA scan)."""
    p1 = spec.cond.p1_face
    p1_ok = p1.out_dim == 0 or (p1.enc == "none" and p1.out_dim % 8 == 0)
    return pallas_supported(spec) and p1_ok


def _seq_rev_kernel(spec: FlowSpec, precision, p1_dim: int,
                    zs_ref, hist0_ref, states0_ref, fixed_ref,
                    w_ih_ref, w_p1_ref,
                    w_hh_ref, b_ih_ref, b_hh_ref,
                    out_w_ref, out_b_ref, w_inv_ref,
                    an_bias_ref, an_neg_ref,
                    xs_out,                             # output blocks
                    states_scr, hist_scr):
    """No DMA: the raised VMEM budget (v5e: 128 MiB physical) keeps ALL
    weights resident — incl. the 13.4 MB GRU input stack that the per-frame
    kernel streams once per frame (1.3 GB/call at batch 1, the measured
    bottleneck there) — and the per-frame conditioning arrives as a
    pipelined input block."""
    k_steps = spec.n_steps
    z1d = spec.z1_dim
    c = spec.channels
    half = spec.coupling_out_dim // 2
    bt = zs_ref.shape[1]

    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        states_scr[:] = states0_ref[:]
        if p1_dim:
            hist_scr[:] = hist0_ref[:]

    if p1_dim:
        p1 = hist_scr[:]                               # constant this frame

    def body(i, z):
        k = k_steps - 1 - i

        proj = fixed_ref[0, k]
        if p1_dim:
            proj = proj + jnp.dot(p1, w_p1_ref[k],
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
        z1 = z[:, :z1d]
        z2 = z[:, z1d:]
        cond_t = jax.nn.leaky_relu(proj, 0.01)
        rnn_in = jnp.concatenate([z1, cond_t], axis=-1)
        in_pad = w_ih_ref.shape[1] - rnn_in.shape[-1]
        if in_pad:
            rnn_in = jnp.concatenate(
                [rnn_in, jnp.zeros((bt, in_pad), rnn_in.dtype)], axis=-1)

        gi = jnp.dot(rnn_in, w_ih_ref[k], preferred_element_type=jnp.float32,
                     precision=precision) + b_ih_ref[k]
        h_prev = states_scr[k]
        gh = jnp.dot(h_prev, w_hh_ref[k], preferred_element_type=jnp.float32,
                     precision=precision) + b_hh_ref[k]
        hdim = h_prev.shape[-1]
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        zz = jax.nn.sigmoid(gi[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        h_new = (1.0 - zz) * n + zz * h_prev
        states_scr[k] = h_new

        hout = jnp.dot(h_new, out_w_ref[k], preferred_element_type=jnp.float32,
                       precision=precision) + out_b_ref[k]
        shift = hout[:, :half]
        scale = jnp.maximum(jax.nn.sigmoid(hout[:, half:] + 2.0),
                            spec.scale_eps)
        z2 = z2 / scale - shift
        z = jnp.concatenate([z1, z2], axis=-1)
        z = jnp.dot(z, w_inv_ref[k], preferred_element_type=jnp.float32,
                    precision=precision)
        return z * an_neg_ref[k] - an_bias_ref[k]

    x = jax.lax.fori_loop(0, k_steps, body, zs_ref[0])
    xs_out[0] = x

    if p1_dim:
        # autoregressive ring buffer: drop the oldest frame, append x
        flat = hist_scr[:]
        if p1_dim > c:
            hist_scr[:, : p1_dim - c] = flat[:, c:]
        hist_scr[:, p1_dim - c:] = x


@partial(jax.jit, static_argnames=("spec", "interpret", "precision", "bt"))
def sequence_rev_fused(spec: FlowSpec, weights: SamplingWeights, w_p1_t,
                       zs, fixed_projs, hist0, states0, *,
                       bt: int | None = None, interpret: bool = False,
                       precision=None):
    """Generate a whole sequence in one kernel: zs [N, B, C] latents,
    fixed_projs [N, K, B, cond] (non-autoregressive conditioning slice,
    ``flow.project_cond_split``), hist0 [B, p1_dim] flattened own-face
    history window, w_p1_t [K, p1_dim, cond] own-face projection slice,
    states0 [K, B, H] -> xs [N, B, C].

    The XLA scan this replaces dispatches one fused frame kernel + one
    projection einsum + a ring-buffer update per frame; here the whole
    autoregressive loop (face-history ring buffer and GRU states live in
    VMEM scratch across grid steps) runs without leaving the kernel.
    """
    n, b, c = zs.shape
    k = spec.n_steps
    h = weights.w_hh_t.shape[1]
    if precision is None:
        precision = ambient_matmul_precision()
    if bt is None:
        bt = min(b, 128)
    assert b % bt == 0, (b, bt)
    p1_dim = spec.cond.p1_face.out_dim
    p1w = hist0.shape[-1]
    grid = (b // bt, n)

    kernel = partial(_seq_rev_kernel, spec, precision, p1_dim)
    xs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, b, c), zs.dtype),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),             # zs
            pl.BlockSpec((bt, p1w), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),             # hist0
            pl.BlockSpec((k, bt, h), lambda ib, it: (0, ib, 0),
                         memory_space=pltpu.VMEM),             # states0
            pl.BlockSpec((1, k, bt, spec.cond.cond_dim),
                         lambda ib, it: (it, 0, ib, 0),
                         memory_space=pltpu.VMEM),             # fixed_projs
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_p1
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),             # b_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),             # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),             # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),             # out_b
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_inv
            pl.BlockSpec(memory_space=pltpu.VMEM),             # an_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),             # an_neg
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda ib, it: (it, ib, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, bt, h), jnp.float32),
            pltpu.VMEM((bt, p1w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SEQ_VMEM_LIMIT),
        interpret=interpret,
    )(zs, hist0, states0, fixed_projs, weights.w_ih_t, w_p1_t,
      weights.w_hh_t, weights.b_ih, weights.b_hh, weights.out_w_t,
      weights.out_b, weights.w_inv, weights.an_bias,
      weights.an_neg_logs_exp)
    return xs

"""Sequence-level model: teacher-forced NLL, autoregressive sampling, inversion.

The reference runs per-frame Python loops (models.py:534-561, 567-596,
617-645); here every loop is a ``jax.lax.scan`` whose carry holds the K
coupling-RNN states (and, when sampling, the autoregressive own-face ring
buffer plus the PRNG key). Conditioning for all frames is encoded in one
batched pass *before* the scan — during training it is fully known (teacher
forcing); during sampling everything except the agent's own face encoding is
precomputed and only that one small encoder runs inside the scan.

Loss convention (models.py:563-565): total bits per frame,
``-(logdet + logp(z)) / ln 2``, mean over batch then mean over frames — NOT
divided by the 56 channel dims.
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lets_face_it_tpu.core import ops
from lets_face_it_tpu.model import encoders, flow
from lets_face_it_tpu.model.spec import FlowSpec

logger = logging.getLogger(__name__)

# Trace-time record of the path sequence_nll last dispatched to ("fused" or
# "xla") — lets the multichip dryrun and tests assert the AUTO gate (not a
# use_fused override) actually engaged the Pallas kernels.
LAST_NLL_DISPATCH: str | None = None


def _auto_use_fused(spec: FlowSpec, batch_size: int, mesh) -> bool:
    """The fused-training-kernel auto-gate. Engages on TPU when the flow
    configuration and the PER-SHARD batch are inside the kernel envelope
    (ops/pallas_train.py). Warns loudly — once per trace — when the model
    would fuse but the batch/sharding disengages it, so a silent XLA
    fallback can't eat the measured 1.12-1.26x step speedup unnoticed."""
    from lets_face_it_tpu.ops import pallas_train

    backend = pallas_train.GATE_BACKEND_OVERRIDE or jax.default_backend()
    if backend != "tpu" or not pallas_train.train_fused_spec_supported(spec):
        return False
    n_shards = mesh.devices.size if mesh is not None else 1
    batch_ok = (batch_size % n_shards == 0
                and pallas_train.train_fused_supported(
                    spec, batch_size // n_shards))
    mesh_ok = mesh is not None or jax.device_count() == 1
    if batch_ok and mesh_ok:
        return True
    if not batch_ok:
        logger.warning(
            "fused training kernels DISENGAGED: global batch %d over %d "
            "shard(s) is outside the kernel envelope (the per-shard batch "
            "must be a whole multiple of 32) — falling back to the XLA "
            "scan path", batch_size, n_shards)
    else:
        logger.warning(
            "fused training kernels DISENGAGED: %d devices visible but no "
            "mesh given (pallas_call has no GSPMD rule; pass mesh= for "
            "shard_map dispatch) — falling back to the XLA scan path",
            jax.device_count())
    return False


class SeqGlowParams(NamedTuple):
    encoder: dict
    flow: dict


def init_seqglow(key, spec: FlowSpec, dtype=jnp.float32) -> SeqGlowParams:
    k_enc, k_flow = jax.random.split(key)
    return SeqGlowParams(
        encoder=encoders.init_feature_encoder(k_enc, spec.cond, dtype),
        flow=flow.init_flow(k_flow, spec, dtype),
    )


def nll_from_objective(objective):
    """Bits: -(logdet + logp) / ln 2 (models.py:563-565)."""
    return -objective / ops.LN2


def _frame_numbers(spec: FlowSpec, batch, n_frames: int):
    """[B, N, 1] frame-number conditioning, stepping by 2 per frame and offset
    by 2*start (models.py:540-542,557-558)."""
    start = spec.cond.longest_history
    base = batch["frame_nb"] + 2.0 * start                       # [B, 1]
    steps = 2.0 * jnp.arange(n_frames, dtype=base.dtype)         # [N]
    return base[:, None, :] + steps[None, :, None]


def sequence_nll(spec: FlowSpec, params: SeqGlowParams, batch, *, rng=None,
                 training=False, collect_scales=False, use_fused=None,
                 mesh=None):
    """Teacher-forced NLL over a [B, T, C] sequence.

    Returns (z_seq [N, B, C], loss scalar, per-frame per-sample losses [N, B]).

    ``use_fused``: run the whole [N-frame x K-step] flow traversal as the
    fused Pallas training kernel pair (ops/pallas_train.py, hand-derived
    VJP); auto-enabled on TPU when the flow configuration and batch size are
    inside the kernel envelope. The conditioning encoders stay on the XLA
    path either way.

    ``mesh``: a data-parallel ``jax.sharding.Mesh``. Pallas kernels have no
    GSPMD partitioning rule, so under a mesh the fused traversal runs inside
    ``shard_map`` — weights replicated, batch axis sharded, each device
    running the kernels on its local shard; gradient psums come from
    shard_map's autodiff. Without a mesh the fused path only auto-engages
    on a single device.
    """
    x = batch["p1_face"]
    b, t, _ = x.shape
    start = spec.cond.longest_history
    n = t - start
    times = jnp.arange(start, t)

    frame_nbs = _frame_numbers(spec, batch, n) if spec.cond.use_frame_nb else None
    cond_all = encoders.encode_conditioning(
        spec.cond, params.encoder, batch, x, times,
        frame_nbs=frame_nbs, rng=rng, training=training)          # [B, N, F]

    xs = jnp.moveaxis(x[:, start:], 1, 0)                         # [N, B, C]
    # hoist all K x N conditioning projections out of the time scan into one
    # MXU-shaped contraction
    cond_projs = flow.project_cond_frames(params.flow, cond_all)  # [N, K, B, c]
    states0 = flow.init_flow_states(spec, b, x.dtype)

    if use_fused is None:
        use_fused = _auto_use_fused(spec, b, mesh)
    global LAST_NLL_DISPATCH
    LAST_NLL_DISPATCH = "fused" if use_fused else "xla"
    if use_fused:
        from lets_face_it_tpu.ops import pallas_train

        def run_fused(flow_params, xs, cond_projs, states0):
            return pallas_train.flow_sequence_fused(
                spec, flow_params, xs, cond_projs, states0)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            ax = mesh.axis_names[0]
            # check_vma=False: pallas_call outputs carry no varying-mesh-axes
            # annotation; the specs below are the full story (batch sharded,
            # everything else replicated)
            run_fused = jax.shard_map(
                run_fused, mesh=mesh,
                in_specs=(P(), P(None, ax), P(None, None, ax), P(None, ax)),
                out_specs=(P(None, ax), P(None, ax), P(None, ax),
                           P(None, None, ax)),
                check_vma=False)
        z_seq, logdet, _, scales = run_fused(params.flow, xs, cond_projs,
                                             states0)
        losses = nll_from_objective(logdet + ops.gaussian_logp(z_seq))
        loss = jnp.mean(losses)
        if collect_scales:
            return z_seq, loss, losses, scales
        return z_seq, loss, losses

    def step(states, inp):
        x_t, proj_t = inp
        if collect_scales:
            z, logdet, states, scales = flow.frame_fwd(
                spec, params.flow, x_t, None, states, collect_scales=True,
                cond_projs=proj_t)
        else:
            z, logdet, states = flow.frame_fwd(spec, params.flow, x_t, None,
                                               states, cond_projs=proj_t)
            scales = jnp.zeros((0,), x_t.dtype)
        objective = logdet + ops.gaussian_logp(z)
        nll = nll_from_objective(objective)                       # [B]
        return states, (z, nll, scales)

    if spec.remat:
        step = jax.checkpoint(step)
    _, (z_seq, losses, scales) = jax.lax.scan(step, states0, (xs, cond_projs))
    loss = jnp.mean(losses)
    if collect_scales:
        return z_seq, loss, losses, scales
    return z_seq, loss, losses


def sequence_sample(spec: FlowSpec, params: SeqGlowParams, data, seq_len: int,
                    *, eps_std: float = 1.0, rng, z_seq=None,
                    use_fused: bool | None = None,
                    use_seq_fused: bool | None = None, mesh=None):
    """Autoregressive generation (models.py:567-596).

    ``data`` seeds the own-face history (``p1_face[:, :start]``) and provides
    interlocutor/speech conditioning for ``seq_len`` frames. If ``z_seq``
    [N, B, C] is given, those latents are decoded instead of fresh samples
    (used by ``sequence_invert``). Returns generated frames [B, N, C] where
    N = seq_len - longest_history.

    ``use_fused``: run the frame step as the fused Pallas TPU kernel
    (ops/pallas_flow.py) — ~4-5x faster than the XLA path; auto-enabled on
    TPU when the flow configuration supports it. ``use_seq_fused``: go
    further and run the ENTIRE autoregressive loop as one kernel
    (``sequence_rev_fused``: ring buffer + GRU states in VMEM scratch);
    auto-enabled when the own-face conditioning is absent or 'none'-encoded.
    """
    x_seed = data["p1_face"]
    b = x_seed.shape[0]
    c = spec.channels
    start = spec.cond.longest_history
    n = seq_len - start
    times = jnp.arange(start, seq_len)

    if spec.cond.use_frame_nb:
        if "frame_nb" in data:
            frame_nbs = _frame_numbers(spec, data, n)
        else:
            base = jnp.ones((b, 1), x_seed.dtype)
            steps = 2.0 * jnp.arange(n, dtype=x_seed.dtype)
            frame_nbs = base[:, None, :] + steps[None, :, None]
    else:
        frame_nbs = None

    fixed = encoders.encode_fixed_conditioning(
        spec.cond, params.encoder, data, times, frame_nbs=frame_nbs)  # [B, N, F']

    # precompute the non-autoregressive slice of every step's conditioning
    # projection for all frames; only the own-face contribution (a small
    # [B, p1_dim] @ [p1_dim, K*c] matmul) remains inside the scan
    p1_dim = spec.cond.p1_face.out_dim
    fixed_projs, w_p1 = flow.project_cond_split(params.flow, p1_dim, fixed)

    h1 = spec.cond.p1_face.history
    face_hist0 = x_seed[:, start - h1 : start]                        # [B, h1, C]
    states0 = flow.init_flow_states(spec, b, x_seed.dtype)

    if z_seq is None:
        zs = jax.random.normal(rng, (n, b, c), x_seed.dtype) * eps_std
    else:
        zs = z_seq

    if use_fused is None:
        from lets_face_it_tpu.ops import pallas_flow

        # single-chip only, as for the training kernels (no GSPMD rule);
        # beyond FRAME_FUSED_MAX_BATCH the scan body runs the kernel per
        # 512-row segment (frame_rev_fused_chunked), auto up to
        # FRAME_FUSED_MAX_SEGMENTS segments (measured crossover vs XLA)
        use_fused = (pallas_flow.pallas_supported(spec)
                     and pallas_flow.frame_fused_auto_ok(b)
                     and jax.default_backend() == "tpu"
                     and jax.device_count() == 1)
    fused_weights = None
    if use_fused:
        from lets_face_it_tpu.ops import pallas_flow

        fused_weights = pallas_flow.prepare_sampling_weights(spec, params.flow)

    if use_seq_fused is None:
        from lets_face_it_tpu.ops import pallas_flow

        n_shards = mesh.devices.size if mesh is not None else 1
        b_local = b // n_shards if b % n_shards == 0 else 0
        use_seq_fused = (bool(use_fused)
                         and pallas_flow.sampling_seq_supported(spec)
                         and b_local > 0
                         and (b_local <= 128 or b_local % 128 == 0))
    if use_seq_fused:
        from lets_face_it_tpu.ops import pallas_flow

        if fused_weights is None:
            fused_weights = pallas_flow.prepare_sampling_weights(
                spec, params.flow)
        if p1_dim > 0:
            hist0 = face_hist0.reshape(b, p1_dim)
            w_p1_t = jnp.swapaxes(w_p1, 1, 2)
        else:
            hist0 = jnp.zeros((b, 8), x_seed.dtype)
            w_p1_t = jnp.zeros((spec.n_steps, 8, spec.cond.cond_dim),
                               x_seed.dtype)

        def run_seq(weights, w_p1_t, zs, fixed_projs, hist0, states0):
            return pallas_flow.sequence_rev_fused(
                spec, weights, w_p1_t, zs, fixed_projs, hist0, states0,
                interpret=pallas_flow.INTERPRET)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            ax = mesh.axis_names[0]
            run_seq = jax.shard_map(
                run_seq, mesh=mesh,
                in_specs=(P(), P(), P(None, ax), P(None, None, ax), P(ax),
                          P(None, ax)),
                out_specs=P(None, ax), check_vma=False)
        xs = run_seq(fused_weights, w_p1_t, zs, fixed_projs, hist0, states0)
        return jnp.moveaxis(xs, 0, 1)

    if mesh is not None:
        # only the whole-sequence kernel has a shard_map dispatch; the
        # per-frame scan (XLA or frame_rev_fused) has no mesh handling and
        # would silently ignore the argument, leaving pallas_calls exposed to
        # GSPMD on sharded inputs
        raise ValueError(
            "sequence_sample with mesh= requires the whole-sequence fused "
            "path (use_seq_fused); the per-frame scan path does not shard")

    def step(carry, inp):
        face_hist, states = carry
        z_t, fixed_proj = inp
        if p1_dim > 0:
            p1_enc = encoders.encode_p1_face_single(
                spec.cond, params.encoder, face_hist)
            proj_t = fixed_proj + jnp.einsum("bd,kcd->kbc", p1_enc, w_p1)
        else:
            proj_t = fixed_proj
        if fused_weights is not None:
            from lets_face_it_tpu.ops import pallas_flow

            x_t, states = pallas_flow.frame_rev_fused_chunked(
                spec, fused_weights, z_t, proj_t, states,
                interpret=pallas_flow.INTERPRET)
            logdet = jnp.zeros(z_t.shape[:-1], z_t.dtype)
        else:
            x_t, logdet, states = flow.frame_rev(spec, params.flow, z_t, None,
                                                 states, cond_projs=proj_t)
        face_hist = jnp.concatenate([face_hist[:, 1:], x_t[:, None]], axis=1)
        return (face_hist, states), (x_t, logdet)

    _, (xs, logdets) = jax.lax.scan(step, (face_hist0, states0),
                                    (zs, fixed_projs))
    return jnp.moveaxis(xs, 0, 1)                                     # [B, N, C]


def sequence_invert(spec: FlowSpec, params: SeqGlowParams, z_seq, data):
    """Teacher-forced decode of stored latents (models.py:617-645): conditioning
    comes from the ground-truth ``data['p1_face']`` history, not the decoded
    output. Returns (reconstruction [B, N, C], backward_loss scalar)."""
    x = data["p1_face"]
    b, t, _ = x.shape
    start = spec.cond.longest_history
    n = z_seq.shape[0]
    times = jnp.arange(start, start + n)

    frame_nbs = _frame_numbers(spec, data, n) if spec.cond.use_frame_nb else None
    cond_all = encoders.encode_conditioning(
        spec.cond, params.encoder, data, x, times, frame_nbs=frame_nbs)
    cond_projs = flow.project_cond_frames(params.flow, cond_all)
    states0 = flow.init_flow_states(spec, b, x.dtype)

    def step(states, inp):
        z_t, proj_t = inp
        x_t, logdet, states = flow.frame_rev(spec, params.flow, z_t, None,
                                             states, cond_projs=proj_t)
        objective = logdet + ops.gaussian_logp(z_t)
        return states, (x_t, jnp.mean(nll_from_objective(objective)))

    _, (xs, losses) = jax.lax.scan(step, states0, (z_seq, cond_projs))
    return jnp.moveaxis(xs, 0, 1), jnp.mean(losses)


# jitted entry points for the evaluation/validation paths (training builds its
# own jitted step; calling these un-jitted executes op-by-op — catastrophic
# over a remote-device transport and wasteful everywhere)
sequence_nll_jit = jax.jit(
    sequence_nll,
    static_argnames=("spec", "training", "collect_scales", "use_fused",
                     "mesh"))
sequence_sample_jit = jax.jit(
    sequence_sample,
    static_argnames=("spec", "seq_len", "eps_std", "use_fused",
                     "use_seq_fused", "mesh"))
sequence_invert_jit = jax.jit(sequence_invert, static_argnames=("spec",))

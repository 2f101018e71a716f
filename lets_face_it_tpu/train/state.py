"""Train state and the jitted train/eval steps.

The negative-NLL "derangement" branch (lets_face_it_glow.py:39-54) is folded
into a single compiled step: both the matched and deranged batches are
materialised, one is selected by a traced bernoulli draw, and the loss factor
flips to -0.1 — identical semantics (10% of steps do gradient *ascent* on
mismatched conditioning, gated on the last mismatched NLL still being
positive) with no recompilation and no control-flow divergence across a mesh.

ActNorm data-dependent init runs once, eagerly, on the first (non-deranged)
training batch before stepping (see model/flow.py:actnorm_sequential_init);
the ``actnorm_inited`` flag lives in the checkpoint exactly because resumed
models must not re-initialise (reference models.py:515-518).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from lets_face_it_tpu.model import FlowSpec, SeqGlowParams, flow, seqglow
from lets_face_it_tpu.model.encoders import encode_conditioning
from lets_face_it_tpu.train import derange


class TrainState(NamedTuple):
    params: SeqGlowParams
    opt_state: Any
    step: jnp.ndarray                 # int32 scalar
    last_mismatched_nll: jnp.ndarray  # f32 scalar, +inf before first probe
    rng: jnp.ndarray                  # PRNG key threaded through steps


def init_train_state(key, spec: FlowSpec, optimizer, dtype=jnp.float32) -> TrainState:
    k_init, k_state = jax.random.split(key)
    params = seqglow.init_seqglow(k_init, spec, dtype)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        last_mismatched_nll=jnp.asarray(jnp.inf, jnp.float32),
        rng=k_state,
    )


def run_actnorm_init(spec: FlowSpec, state: TrainState, batch) -> TrainState:
    """Data-dependent actnorm init from the first batch's first conditioned
    frame. Conditioning-independent in practice (zero-init couplings) but we
    thread the real conditioning anyway."""
    x = jnp.asarray(batch["p1_face"])
    start = spec.cond.longest_history
    times = jnp.arange(start, start + 1)
    cond = encode_conditioning(spec.cond, state.params.encoder, batch, x, times)
    new_flow = flow.actnorm_sequential_init(
        spec, state.params.flow, x[:, start], cond[:, 0])
    return state._replace(params=state.params._replace(flow=new_flow))


def _masked_grads(grads: SeqGlowParams) -> SeqGlowParams:
    """Zero gradients of frozen buffers (invconv P, sign_s)."""
    mask = flow.trainable_mask(grads.flow)
    new_flow = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                            grads.flow, mask)
    return grads._replace(flow=new_flow)


def _make_step_body(spec: FlowSpec, hp, optimizer, mesh=None,
                    use_fused=None):
    """The un-jitted ``(state, batch) -> (state, metrics)`` step function —
    shared verbatim by the single-step jit (``make_train_step``) and the
    k-steps-per-dispatch scan (``make_multi_train_step``) so the two paths
    cannot drift semantically."""
    use_negative = bool(hp.Train.get("use_negative_nll_loss", False))
    neg_modalities, _ = derange.mismatched_modalities(hp.Conditioning)

    def train_step(state: TrainState, batch):
        rng, k_choice, k_derange, k_dropout = jax.random.split(state.rng, 4)

        if use_negative and neg_modalities:
            deranged = derange.derange_batch(k_derange, batch, neg_modalities)
            coin = jax.random.uniform(k_choice) < 0.1
            use_deranged = jnp.logical_and(coin, state.last_mismatched_nll > 0)
            chosen = derange.select_batch(use_deranged, deranged, batch)
            factor = jnp.where(use_deranged, -0.1, 1.0)
        else:
            chosen = batch
            use_deranged = jnp.asarray(False)
            factor = jnp.asarray(1.0)

        def loss_fn(params):
            _, nll, _ = seqglow.sequence_nll(
                spec, params, chosen, rng=k_dropout, training=True,
                mesh=mesh, use_fused=use_fused)
            return factor * nll, nll

        (loss, raw_nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = _masked_grads(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        new_last = jnp.where(use_deranged, -raw_nll, state.last_mismatched_nll)
        metrics = {
            "loss": loss,
            "nll": raw_nll,
            "deranged": use_deranged.astype(jnp.float32),
            "grad_norm": optax_global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1, new_last, rng), metrics

    return train_step


def make_train_step(spec: FlowSpec, hp, optimizer, mesh=None,
                    use_fused=None):
    """``mesh``: data-parallel mesh, forwarded to sequence_nll so the fused
    Pallas traversal runs per-shard under shard_map (GSPMD cannot partition
    a pallas_call). ``use_fused`` forces the kernel choice (None = auto)."""
    body = _make_step_body(spec, hp, optimizer, mesh=mesh, use_fused=use_fused)
    return partial(jax.jit, donate_argnums=0)(body)


def make_multi_train_step(spec: FlowSpec, hp, optimizer, seq_len: int,
                          mesh=None, use_fused=None):
    """k training steps per dispatch: ``lax.scan`` over a ``[k, B]`` block of
    window starts, gathering each batch on-device from the HBM-resident
    modality arrays (data/device_cache.py) inside the compiled region.

    One dispatch then carries k full optimizer steps, so end-to-end
    throughput is pinned to device speed even when the host->device
    transport degrades (the remote-TPU tunnel's dispatch RTT is the one
    measured end-to-end tax left — docs/PERF.md). The step math is the
    single-step body verbatim; only the batch materialisation moves inside
    the scan. The reference has no analogue (one Python-side step per
    optimizer update, lets_face_it_glow.py:39-54).

    Returns ``multi_step(state, arrays, starts_block)`` with metrics stacked
    ``[k]`` per key; ``k`` is ``starts_block.shape[0]`` (static per compile).
    """
    from lets_face_it_tpu.data.device_cache import gather_windows

    body = _make_step_body(spec, hp, optimizer, mesh=mesh, use_fused=use_fused)

    @partial(jax.jit, donate_argnums=0)
    def multi_step(state: TrainState, arrays, starts_block):
        def scan_body(st, starts):
            return body(st, gather_windows(arrays, starts, seq_len))

        return jax.lax.scan(scan_body, state, starts_block)

    return multi_step


def make_eval_step(spec: FlowSpec, mesh=None):
    @jax.jit
    def eval_step(params: SeqGlowParams, batch):
        z_seq, loss, losses = seqglow.sequence_nll(spec, params, batch,
                                                   mesh=mesh)
        return z_seq, loss, losses

    return eval_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))

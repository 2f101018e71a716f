"""Training-time self-checks — the reference's de-facto test suite
(mimicry_logger.py): jerk statistics, invertibility error, and
matched-vs-deranged NLL probes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lets_face_it_tpu.model import seqglow
from lets_face_it_tpu.train import derange


def calc_jerk(x):
    """Mean |third difference| over time (glow/utils.py:53-58). x: [B, T, C]."""
    d1 = x[:, 1:] - x[:, :-1]
    d2 = d1[:, 1:] - d1[:, :-1]
    d3 = d2[:, 1:] - d2[:, :-1]
    return jnp.mean(jnp.abs(d3))


def jerk_metrics(gt_seq, generated_seq):
    """gt / generated / ratio triplet (mimicry_logger.py:175-184)."""
    gt = calc_jerk(gt_seq)
    gen = calc_jerk(generated_seq)
    return {"jerk/gt_jerk": gt, "jerk/generated_jerk": gen,
            "jerk/generated_jerk_ratio": gen / gt}


def invertibility_error(spec, params, batch, z_seq, loss):
    """Percentage disagreement between forward NLL and backward decode NLL
    (mimicry_logger.py:241-251)."""
    _, backward_loss = seqglow.sequence_invert_jit(spec, params, z_seq, batch)
    return jnp.abs((backward_loss + loss) / loss) * 100.0


def wrong_context_probes(spec, params, batch, base_loss, mismatch_cfg, rng):
    """NLL deltas for each configured derangement group
    (mimicry_logger.py:199-238): positive delta => the model prefers matched
    conditioning. Returns {metric_name: value}."""
    out = {}
    for shuffle_time, groups in (
        (False, mismatch_cfg.get("shuffle_batch", {})),
        (True, mismatch_cfg.get("shuffle_time", {})),
    ):
        for group_name, modalities in groups.items():
            rng, sub = jax.random.split(rng)
            deranged = derange.derange_batch(sub, batch, modalities,
                                             shuffle_time=shuffle_time)
            _, mismatched_loss, _ = seqglow.sequence_nll_jit(spec, params, deranged)
            kind = "shuffled_time" if shuffle_time else "shuffled_batch"
            out[f"mismatched_nll/{kind}/{group_name}"] = base_loss - mismatched_loss
    return out

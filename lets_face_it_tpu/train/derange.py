"""Batch derangement for negative-NLL training and mismatched-conditioning
probes (reference glow/utils.py:85-113).

Shuffles the chosen modalities across the batch dimension (optionally across
time) so the conditioning no longer matches the target motion — used both as a
training signal (gradient *ascent* on mismatched data, lets_face_it_glow.py:39-54)
and as an "is the model listening" evaluation probe (mimicry_logger.py:199-238).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ALL_MODALITIES = ("p1_face", "p2_face", "p1_speech", "p2_speech")


def derange_batch(rng, batch, modalities, shuffle_time: bool = False):
    """Permute ``modalities`` across the batch dim; others pass through."""
    b = batch["p1_face"].shape[0]
    k_batch, k_time = jax.random.split(rng)
    perm = jax.random.permutation(k_batch, b)

    out = {}
    for name in ALL_MODALITIES:
        if name not in batch:
            continue
        if name in modalities:
            x = batch[name][perm]
            if shuffle_time:
                t_perm = jax.random.permutation(k_time, x.shape[1])
                x = x[:, t_perm]
            out[name] = x
        else:
            out[name] = batch[name]
    for name in batch:
        if name not in out:
            out[name] = batch[name]
    return out


def mismatched_modalities(conditioning: dict):
    """The p2 modalities being conditioned on, and the metric-name suffix
    (glow/utils.py:103-113)."""
    modalities = []
    if conditioning["p2_face"]["history"] > 0:
        modalities.append("p2_face")
    if conditioning["p2_speech"]["history"] > 0:
        modalities.append("p2_speech")
    if not modalities:
        return [], None
    name = "p2" if len(modalities) == 2 else modalities[0]
    return modalities, name


def select_batch(use_deranged, deranged, original):
    """Pick between two same-shaped batches under jit (both already built)."""
    return jax.tree.map(
        lambda a, b: jnp.where(use_deranged, a, b), deranged, original)

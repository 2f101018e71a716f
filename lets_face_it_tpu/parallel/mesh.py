"""Device mesh and sharding layout.

The model is small (~10 M params) and the batch is large (256 windows), so the
right TPU scaling strategy is pure data parallelism over a 1-D ``data`` mesh
axis: parameters replicated on every chip, the batch sharded on axis 0, and
gradient all-reduce riding ICI — XLA inserts the psum from the sharding
annotations; no hand-written collectives needed. (The reference has no
exercised distributed path at all: ``distributed_backend: null``,
final_model.yaml:123.)

TP/PP/EP are consciously N/A for this model family (SURVEY.md §2.3): there is
no dimension worth splitting below batch. Sequence parallelism is likewise
N/A — time is carried by a ``lax.scan`` whose state is inherently serial; long
corpora scale by sharding the *batch of windows*, never one sequence.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Host arrays -> device-sharded arrays, batch axis split over the mesh."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def pad_batch(batch: dict, multiple: int):
    """Pad the batch dim up to a multiple (for even sharding of last batches).
    Returns (padded_batch, real_count)."""
    b = next(iter(batch.values())).shape[0]
    rem = b % multiple
    if rem == 0:
        return batch, b
    pad = multiple - rem
    padded = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
              for k, v in batch.items()}
    return padded, b

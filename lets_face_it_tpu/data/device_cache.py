"""Device-resident window gathering: ship indices, not windows.

The host-side ``WindowDataset`` gathers each batch into fresh numpy arrays
that the train loop uploads every step (~14 MB at b256 T80). On a TPU that
design is wrong twice over:

* **throughput** — the per-step upload rides the host->device link (on the
  remote-TPU tunnel it limited end-to-end training to 2.8 steps/s vs the
  8.7 steps/s device-side ceiling, docs/PERF.md), while the standardized
  corpus (~1 GB at 25 fps, windows.py module docstring) fits in a corner
  of HBM;
* **durability** — the remote-TPU client pins a host-side copy of every
  upload for the life of the process (``tools/leak_probe.py``: exactly
  14.00 MB of RSS leaked per b256 step; fresh vs reused host buffers and
  explicit ``Array.delete()`` make no difference, device-resident data
  leaks nothing). A 60k-step production run was OOM-killed at step ~9,300
  with 130 GB pinned.

``DeviceWindowBatcher`` uploads the split's concatenated modality arrays
ONCE (replicated over the mesh when one is given) and gathers windows
on-device from a ``[B]`` vector of frame starts — the per-step upload drops
to ~1 KB of int32 indices, and the gather itself is an XLA gather reading
batch-bytes from HBM (microseconds). Values are bit-identical to the host
gather: same float32 arrays, same slices.

The reference streams batches from worker processes re-reading HDF5
(mimicry_data_module.py:44-108) — correct for a CUDA box with host-pinned
staging, wrong for an accelerator whose HBM dwarfs the corpus.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Per-device copy budget for the auto policy: the corpus must fit next to
# params + optimizer + b1024-remat activations (~4 GB peak measured) in a
# 16 GB v5e HBM.
AUTO_MAX_BYTES = 6 * 1024**3


def gather_windows(arrays: dict, starts, seq_len: int) -> dict:
    """In-jit sliding-window gather: ``{mod: [T, D]}`` + ``[B]`` starts ->
    ``{mod: [B, seq_len, D]}``. The single definition of the on-device
    window semantics — the batcher's per-step gather and the
    k-steps-per-dispatch scan body (train/state.py:make_multi_train_step)
    both call it, so they cannot drift."""
    idx = starts[:, None] + jnp.arange(seq_len)[None, :]
    return {k: a[idx] for k, a in arrays.items()}


class DeviceWindowBatcher:
    """On-device sliding-window gather over a ``WindowDataset``'s arrays.

    With ``mesh``, the modality arrays are replicated across it and the
    per-batch starts are sharded over the batch axis, so each device
    gathers only its own shard's windows (no collectives: replicated
    operand, sharded indices).
    """

    def __init__(self, ds, mesh=None):
        self.seq_len = int(ds.seq_len)
        self.window_starts = np.asarray(ds.window_starts, np.int64)
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            replicated = NamedSharding(mesh, P())
            self._starts_sharding = NamedSharding(mesh, P(axis))
            self._block_sharding = NamedSharding(mesh, P(None, axis))
            put = lambda a: jax.device_put(a, replicated)  # noqa: E731
        else:
            self._starts_sharding = None
            self._block_sharding = None
            put = jnp.asarray
        self.arrays = {k: put(v) for k, v in ds.arrays.items()}
        self.total_bytes = int(sum(v.nbytes for v in ds.arrays.values()))

        seq_len = self.seq_len
        self._gather = jax.jit(
            lambda arrays, starts: gather_windows(arrays, starts, seq_len))

    def get_starts_block(self, index_batches) -> jnp.ndarray:
        """Device ``[k, B]`` int32 window starts for k index batches — the
        per-dispatch upload of the k-steps-per-dispatch training path
        (train/state.py:make_multi_train_step), ~k KB on the wire. Under a
        mesh the block is sharded over the batch axis (replicated operand,
        sharded indices — same layout as ``get_batch``'s starts)."""
        blk = np.stack([self.window_starts[np.asarray(ix)]
                        for ix in index_batches]).astype(np.int32)
        if self._block_sharding is not None:
            return jax.device_put(blk, self._block_sharding)
        return jnp.asarray(blk)

    def get_batch(self, indices) -> dict:
        """Gather the windows at ``window_starts[indices]`` on-device.

        Returns the same {modality: [B, seq_len, D]} dict as
        ``WindowDataset.get_batch`` — as device arrays, bit-equal values.
        """
        starts = self.window_starts[np.asarray(indices)].astype(np.int32)
        if self._starts_sharding is not None:
            starts = jax.device_put(starts, self._starts_sharding)
        else:
            starts = jnp.asarray(starts)
        return self._gather(self.arrays, starts)


def make_device_batcher(ds, hp, mesh=None, reserved_bytes: int = 0):
    """Policy: ``hp.device_data_cache`` = auto (default) | on | off.

    auto: engage on accelerator platforms when the split fits
    ``AUTO_MAX_BYTES`` per device; stay on the host-gather path on CPU
    (where there is no transfer to save) and for corpora that don't fit
    (those stream, with the documented leak caveat — docs/PERF.md).

    ``reserved_bytes``: HBM already claimed by other cached splits — the
    auto budget applies to the sum, so caching the train split shrinks the
    val split's allowance.
    """
    raw = getattr(hp, "device_data_cache", "auto")
    if isinstance(raw, bool):
        # YAML 1.1 parses bare `on`/`off` as booleans — the documented
        # spellings must keep meaning on/off, and False must NOT fall
        # through an `or "auto"` default
        mode = "on" if raw else "off"
    else:
        mode = str(raw or "auto").lower()
    if mode == "off":
        return None
    if mode not in ("auto", "on"):
        raise ValueError(f"device_data_cache={mode!r}: expected auto|on|off")
    total = int(sum(v.nbytes for v in ds.arrays.values()))
    if mode == "auto":
        if jax.devices()[0].platform == "cpu":
            return None
        if total + reserved_bytes > AUTO_MAX_BYTES:
            print(f"device_data_cache=auto: split is {total / 1e9:.1f} GB "
                  f"(+{reserved_bytes / 1e9:.1f} GB already cached) "
                  f"> {AUTO_MAX_BYTES / 1e9:.0f} GB budget; streaming from "
                  "host (bounded-lifetime processes recommended, see "
                  "docs/PERF.md)", flush=True)
            return None
    return DeviceWindowBatcher(ds, mesh=mesh)

"""Sliding-window dataset over the ``lets_face_it.h5`` feature store.

HDF5 schema (written by the reference combiner, combine_features.py:172-216,
and by ``lets_face_it_tpu.features.combine``):

    /{train,val,test}/{kind}/{chunk_i}/{agent,interlocutor}
    /means/{kind}, /stds/{kind}           (train-agent statistics)

kinds: flame_expression [T,50], flame_jaw [T,3], flame_neck [T,3],
mfcc [T,26], prosody [T,4] (face kinds stored standardized, audio raw).

TPU-first design: instead of a worker-pool DataLoader re-opening the HDF5 per
item (reference mimicry_data_module.py:44-78), all chunks are loaded once into
contiguous host arrays per modality; a window is then a zero-copy slice-gather
``big[starts[i] : starts[i]+seq_len]``, batched with one fancy-index per batch.
The whole corpus at 25 fps fits comfortably in host RAM (~1 GB), and batch
assembly is a memcpy — fast enough to keep a v5e slice fed at batch 256.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import h5py
import numpy as np


class WindowDataset:
    """All sliding windows of ``seq_len`` (stride 1) over every chunk of a split.

    Produces batches shaped like the reference's ``MimicryDataset`` items
    (mimicry_data_module.py:44-78):
      p1_face   [B, T, exp_dim+3+3]   agent  expression‖jaw‖neck
      p2_face   [B, T, ...]           interlocutor (if conditioned on)
      p1_speech [B, T, 30]            agent  mfcc‖prosody (if conditioned on)
      p2_speech [B, T, 30]            interlocutor mfcc‖prosody (if conditioned on)
    """

    def __init__(self, file_name, split: str, data_hparams: dict,
                 conditioning_hparams: dict, seq_len: int):
        self.seq_len = seq_len
        self.split = split
        exp_dim = data_hparams["expression_dim"]

        self.with_p1_speech = bool(conditioning_hparams["p1_speech"]["history"])
        self.with_p2_speech = bool(conditioning_hparams["p2_speech"]["history"])
        self.with_p2_face = bool(conditioning_hparams["p2_face"]["history"])

        modalities: dict[str, list[np.ndarray]] = {}
        chunk_lengths: list[int] = []

        with h5py.File(Path(file_name), "r") as f:
            grp = f[split]
            chunk_keys = sorted(grp["prosody"].keys(), key=lambda k: int(k))

            def face(key: str, who: str) -> np.ndarray:
                return np.concatenate([
                    grp["flame_expression"][key][who][:, :exp_dim],
                    grp["flame_jaw"][key][who][()],
                    grp["flame_neck"][key][who][()],
                ], axis=1).astype(np.float32)

            def speech(key: str, who: str) -> np.ndarray:
                return np.concatenate([
                    grp["mfcc"][key][who][()],
                    grp["prosody"][key][who][()],
                ], axis=1).astype(np.float32)

            for key in chunk_keys:
                n = grp["prosody"][key]["agent"].shape[0]
                chunk_lengths.append(n)
                modalities.setdefault("p1_face", []).append(face(key, "agent"))
                if self.with_p2_face:
                    modalities.setdefault("p2_face", []).append(
                        face(key, "interlocutor"))
                if self.with_p1_speech:
                    modalities.setdefault("p1_speech", []).append(
                        speech(key, "agent"))
                if self.with_p2_speech:
                    modalities.setdefault("p2_speech", []).append(
                        speech(key, "interlocutor"))

            self.means, self.stds = load_standardization(f)

        self.arrays = {k: np.concatenate(v, axis=0) for k, v in modalities.items()}

        starts = []
        offset = 0
        for n in chunk_lengths:
            if n >= seq_len:
                starts.append(offset + np.arange(n - seq_len + 1))
            offset += n
        self.window_starts = (np.concatenate(starts) if starts
                              else np.zeros((0,), np.int64))

    def __len__(self) -> int:
        return len(self.window_starts)

    @property
    def modality_names(self) -> tuple[str, ...]:
        return tuple(self.arrays.keys())

    def get_batch(self, indices: np.ndarray) -> dict[str, np.ndarray]:
        from lets_face_it_tpu.data.prefetch import NativeGather

        starts = self.window_starts[indices]
        return {name: NativeGather.gather(arr, starts, self.seq_len)
                for name, arr in self.arrays.items()}

    def epoch_index_batches(self, batch_size: int, *,
                            rng: np.random.Generator | None = None,
                            shuffle: bool = True, drop_last: bool = False,
                            ) -> Iterator[np.ndarray]:
        """The epoch's window-index batches, in the exact order
        ``epoch_batches`` would gather them — the device-resident path
        (data/device_cache.py) consumes these so host and device gathers
        see identical data order for a given (rng, batch_size)."""
        order = np.arange(len(self))
        if shuffle:
            assert rng is not None
            order = rng.permutation(order)
        for i in range(0, len(order), batch_size):
            sel = order[i : i + batch_size]
            if drop_last and len(sel) < batch_size:
                break
            yield sel

    def epoch_batches(self, batch_size: int, *, rng: np.random.Generator | None = None,
                      shuffle: bool = True, drop_last: bool = False,
                      ) -> Iterator[dict[str, np.ndarray]]:
        for sel in self.epoch_index_batches(batch_size, rng=rng,
                                            shuffle=shuffle,
                                            drop_last=drop_last):
            yield self.get_batch(sel)

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        if drop_last:
            return len(self) // batch_size
        return -(-len(self) // batch_size)


def load_standardization(f: h5py.File) -> tuple[dict, dict]:
    """Read /means and /stds groups (present once training data was combined)."""
    means, stds = {}, {}
    if "means" in f:
        for k in f["means"]:
            means[k] = f["means"][k][()]
            stds[k] = f["stds"][k][()]
    return means, stds


def face_means_stds(means: dict, stds: dict, expression_dim: int):
    """Concatenated mean/std vectors for the packed face layout
    expression[:exp_dim]‖jaw‖neck (mimicry_logger.py:49-63)."""
    mean = np.concatenate([
        means["flame_expression"][:expression_dim],
        means["flame_jaw"], means["flame_neck"]])
    std = np.concatenate([
        stds["flame_expression"][:expression_dim],
        stds["flame_jaw"], stds["flame_neck"]])
    return mean.astype(np.float32), std.astype(np.float32)


def de_standardize(face_seq: np.ndarray, mean: np.ndarray, std: np.ndarray):
    return face_seq * std + mean

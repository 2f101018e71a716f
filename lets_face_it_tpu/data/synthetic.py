"""Synthetic dyadic feature fixture: a tiny ``lets_face_it.h5`` with the
reference schema, for tests and end-to-end smoke training (BASELINE config 1).

Generates smooth, correlated motion so the flow has structure to learn:
each chunk is a sum of low-frequency sinusoids plus noise, the interlocutor's
face lags/mirrors the agent's (a crude "mimicry" signal), and speech features
are band-limited noise correlated with jaw motion.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

KINDS = ("flame_expression", "flame_jaw", "flame_neck", "mfcc", "prosody", "openface")
DIMS = {"flame_expression": 50, "flame_jaw": 3, "flame_neck": 3,
        "mfcc": 26, "prosody": 4, "openface": 136}


def _smooth_signal(rng, n_frames, dim, n_waves=4, noise=0.05):
    t = np.arange(n_frames)[:, None]
    freqs = rng.uniform(0.002, 0.08, (n_waves, dim))
    phases = rng.uniform(0, 2 * np.pi, (n_waves, dim))
    amps = rng.uniform(0.2, 1.0, (n_waves, dim))
    sig = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in zip(amps, freqs, phases))
    return (sig + noise * rng.standard_normal((n_frames, dim))).astype(np.float32)


def _make_chunk(rng, n_frames, dims):
    agent = {k: _smooth_signal(rng, n_frames, d) for k, d in dims.items()}
    inter = {}
    lag = 8
    for k, d in dims.items():
        mirrored = np.roll(agent[k], lag, axis=0) * 0.6
        inter[k] = (mirrored + 0.4 * _smooth_signal(rng, n_frames, d)).astype(np.float32)
    # crude audio/jaw correlation
    agent["mfcc"][:, 0] += 0.5 * agent["flame_jaw"][:, 0]
    inter["mfcc"][:, 0] += 0.5 * inter["flame_jaw"][:, 0]
    return agent, inter


def write_synthetic_dataset(path, *, n_train_chunks=4, n_val_chunks=2,
                            n_test_chunks=2, frames_per_chunk=160, seed=0,
                            dims: dict | None = None):
    """Write a reference-schema HDF5 fixture; returns the path."""
    dims = dims or DIMS
    rng = np.random.default_rng(seed)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    splits = {"train": n_train_chunks, "val": n_val_chunks, "test": n_test_chunks}
    chunks = {s: [_make_chunk(rng, frames_per_chunk, dims) for _ in range(n)]
              for s, n in splits.items()}

    # train-agent statistics, as the combiner computes them
    # (combine_features.py:197-204)
    means, stds = {}, {}
    for kind in dims:
        rows = np.concatenate([agent[kind] for agent, _ in chunks["train"]], axis=0)
        means[kind] = rows.mean(axis=0)
        stds[kind] = rows.std(axis=0) + 1e-6

    with h5py.File(path, "w") as f:
        for kind in dims:
            f.create_dataset(f"/means/{kind}", data=means[kind])
            f.create_dataset(f"/stds/{kind}", data=stds[kind])
        for split, split_chunks in chunks.items():
            for i, (agent, inter) in enumerate(split_chunks):
                for kind in dims:
                    for who, data in (("agent", agent), ("interlocutor", inter)):
                        arr = data[kind]
                        if kind not in ("mfcc", "prosody"):
                            # face kinds are stored standardized
                            arr = (arr - means[kind]) / stds[kind]
                        f.create_dataset(f"/{split}/{kind}/{i}/{who}",
                                         data=arr.astype(np.float32))
    return path


def tiny_dims(expression_dim=6, speech_mfcc=4, prosody=3):
    """Smaller dims for fast unit tests."""
    return {"flame_expression": expression_dim, "flame_jaw": 3, "flame_neck": 3,
            "mfcc": speech_mfcc, "prosody": prosody, "openface": 8}

"""RingNet-lite: an in-framework, landmark-driven FLAME initialisation stage.

The reference seeds its expensive per-frame FLAME landmark fit with RingNet —
a licensed TF1 image-regression network run frame-by-frame
(/root/reference/code/feature_extraction/ringnet.py:96-158). The network
itself cannot be redistributed, so this module provides the same *pipeline
role* (a ``ringnet_{fps}fps.h5`` initialisation consumed by
``flame_fit.fit_session_participant``) from data the pipeline already has:
the OpenFace 2-D landmarks.

Two batched XLA solves, both tiny next to the main fit:

1. **Per-frame rigid init** — L-BFGS on (scale, trans, rot) of the *neutral*
   face against each frame's 51 landmarks, all frames vmapped at once
   (the same stage-1 objective as flame_fit, fewer steps).
2. **Session-level shared shape** — one L-BFGS solve of a single 300-D shape
   vector against a subsample of frames (rigid params frozen), exploiting
   what RingNet cannot: a participant has ONE face, so shape evidence
   accumulates across frames instead of being re-regressed per frame.

Output layout matches the reference RingNet HDF5 exactly —
``flame_params/{cam, pose, shape, expression}`` with pose = [global-rot(3),
jaw(3)] — so the true RingNet remains a drop-in replacement
(features/external.py documents that contract).
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.features import flame_fit


def estimate_init(model, emb, targets, *, rigid_steps: int = 25,
                  shape_steps: int = 40, shape_frames: int = 32,
                  shape_dims: int = 100, batch_frames: int = 256):
    """Landmark-driven FLAME init for [N, 51, 2] targets.

    Returns a dict: scale [N], trans [N, 3], rot [N, 3], shape [N,
    shape_dims] (the shared session shape broadcast per frame, RingNet
    file-layout style), exp [N, 50] zeros.
    """
    targets = jnp.asarray(targets, jnp.float32)
    n = targets.shape[0]
    # landmark-anchor-restricted evaluation: same objective, ~30x smaller
    # tensors (see flame_fit.RestrictedFlame)
    if not isinstance(model, flame_fit.RestrictedFlame):
        model, emb = flame_fit.restrict_to_landmarks(model, emb)

    @jax.jit
    def rigid_fit(targets):
        def fit_one(target):
            base = {
                "trans": jnp.zeros(3), "rot": jnp.zeros(3),
                "pose": jnp.zeros(12), "shape": jnp.zeros(300),
                "exp": jnp.zeros(model.shapedirs.shape[-1] - 300),
            }
            base["scale"] = flame_fit.init_scale(model, emb, base, target)

            def loss(p_rigid):
                return flame_fit._lmk_dist(model, emb, {**base, **p_rigid},
                                           target)

            p_rigid = {k: base[k] for k in ("scale", "trans", "rot")}
            p_rigid, final = flame_fit._lbfgs_solve(loss, p_rigid, rigid_steps)
            return p_rigid, final

        return jax.vmap(fit_one)(targets)

    # chunk the vmapped solve like flame_fit.fit_session_participant — a
    # real session has tens of thousands of frames, and each L-BFGS step
    # materialises per-frame FLAME vertex intermediates
    chunks = [rigid_fit(targets[lo:lo + batch_frames])[0]
              for lo in range(0, n, batch_frames)]
    rigid = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)

    # shared shape over an even subsample of frames
    idx = np.unique(np.linspace(0, n - 1, min(shape_frames, n)).astype(int))
    sub_t = targets[idx]
    sub_rigid = {k: v[idx] for k, v in rigid.items()}
    n_expr = model.shapedirs.shape[-1] - 300

    @jax.jit
    def shape_fit(sub_t, sub_rigid):
        def loss(p):
            shape = jnp.zeros(300).at[:shape_dims].set(p["shape"])

            def frame_loss(target, rig):
                merged = {**rig, "pose": jnp.zeros(12), "shape": shape,
                          "exp": jnp.zeros(n_expr)}
                return flame_fit._lmk_dist(model, emb, merged, target)

            data = jnp.mean(jax.vmap(frame_loss)(sub_t, sub_rigid))
            return data + flame_fit.WEIGHTS["shape"] * jnp.sum(p["shape"] ** 2)

        p, final = flame_fit._lbfgs_solve(
            loss, {"shape": jnp.zeros(shape_dims)}, shape_steps)
        return p["shape"], final

    shape, _ = shape_fit(sub_t, sub_rigid)

    return {
        "scale": np.asarray(rigid["scale"]),
        "trans": np.asarray(rigid["trans"]),
        "rot": np.asarray(rigid["rot"]),
        "shape": np.tile(np.asarray(shape)[None], (n, 1)),
        "exp": np.zeros((n, 50), np.float32),
    }


def write_ringnet_h5(path, est) -> Path:
    """Write the reference RingNet HDF5 layout (ringnet.py:141-158):
    flame_params/{cam, pose, shape, expression}; pose = [rot | jaw]."""
    path = Path(path)
    n = est["rot"].shape[0]
    pose = np.concatenate([est["rot"], np.zeros((n, 3), np.float32)], axis=1)
    cam = np.stack([est["scale"], est["trans"][:, 0], est["trans"][:, 1]],
                   axis=1).astype(np.float32)
    with h5py.File(path, "w") as f:
        f["flame_params/cam"] = cam
        f["flame_params/pose"] = pose.astype(np.float32)
        f["flame_params/shape"] = est["shape"].astype(np.float32)
        f["flame_params/expression"] = est["exp"].astype(np.float32)
    return path


def extract_ringnet_lite(part_dir, fps: int, *, model=None, emb=None,
                         flame_model_path=None, landmark_embedding_path=None,
                         **estimate_kwargs) -> Path:
    """Idempotent per-participant driver: openface_{fps}fps.csv ->
    ringnet_{fps}fps.h5 (skipped if present, like every reference feature
    stage — e.g. ringnet.py:104-107)."""
    import csv

    from lets_face_it_tpu.render.flame import load_flame

    part_dir = Path(part_dir)
    out = part_dir / f"ringnet_{fps}fps.h5"
    if out.exists():
        return out
    if model is None:
        model = load_flame(flame_model_path)
    if emb is None:
        emb = flame_fit.load_landmark_embedding(landmark_embedding_path,
                                                model.faces)
    with open(part_dir / f"openface_{fps}fps.csv") as f:
        rows = list(csv.reader(f))[1:]
    targets = flame_fit.openface_targets(rows)
    est = estimate_init(model, emb, targets, **estimate_kwargs)
    return write_ringnet_h5(out, est)

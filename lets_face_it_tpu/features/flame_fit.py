"""FLAME landmark fitting: per-frame 2-stage L-BFGS, batched across frames
on the accelerator.

The reference fits one frame at a time inside a Ray actor pool of 8 TF1
sessions (flame.py:28-29, 266-291) — the "CPU+GPU months" stage. Here the
same two-stage optimization runs as a ``vmap`` of an L-BFGS solve
(optax.lbfgs with zoom linesearch) over ALL frames at once: thousands of
independent 500-dimensional problems become one batched XLA program.

Objective per frame (flame.py:85-159):
  stage 1  (scale, trans, rot):           lmk_dist
  stage 2  (scale, trans_xy, rot, pose, shape, exp): lmk_dist + regularizers
with
  lmk_dist = ||s * lmks3d_xy - target||^2 / factor^2,
  factor   = max spread of the target landmarks,
  regs     = 1e-3 shape + 1e-3 expr + 100 neck + 1e-3 jaw + 10 eyeballs,
  target   = OpenFace landmarks 17..67 (jaw contour dropped), y flipped to
             1024 - y (flame.py:51-53, 284).

The landmark embedding (51 barycentric anchors on the FLAME surface) comes
from the official ``flame_static_embedding.pkl``; tests use a synthetic one.
"""

from __future__ import annotations

import pickle
from functools import partial
from pathlib import Path
from typing import NamedTuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lets_face_it_tpu.render.flame import (FlameModel, flame_vertices,
                                           pose_and_skin)

WEIGHTS = {"lmk": 1.0, "shape": 1e-3, "expr": 1e-3, "neck_pose": 100.0,
           "jaw_pose": 1e-3, "eyeballs_pose": 10.0}
IMAGE_HEIGHT = 1024.0


class LandmarkEmbedding(NamedTuple):
    vertex_ids: np.ndarray   # [L, 3] vertex indices of the anchor triangle
    bary: jnp.ndarray        # [L, 3] barycentric weights


class RestrictedFlame(NamedTuple):
    """FLAME restricted to the landmark-anchor vertices.

    The fit objective reads only the 51 barycentric landmarks — i.e. ~150
    unique anchor vertices of the 5,023 — but evaluating them through the
    full model drags every [N, V, ...] blendshape/skinning tensor through
    HBM per L-BFGS evaluation. Blendshapes, pose correctives, and LBS are
    per-vertex independent, so gathering the anchor rows gives bit-for-bit
    the same landmark math ~30x smaller. The one cross-vertex coupling is
    the joint regressor (joints = J @ v_shaped over ALL vertices); its
    template/shapedirs contractions are precomputed so that
    joints = j_template + betas @ j_shapedirs — the same value up to float
    reassociation (~1 ulp)."""
    v_template: jnp.ndarray   # [U, 3]
    shapedirs: jnp.ndarray    # [U, 3, 400]
    posedirs: jnp.ndarray     # [U, 3, 36]
    lbs_weights: jnp.ndarray  # [U, 5]
    j_template: jnp.ndarray   # [5, 3]
    j_shapedirs: jnp.ndarray  # [5, 3, 400]


def restrict_to_landmarks(model: FlameModel, emb: LandmarkEmbedding):
    """-> (RestrictedFlame, LandmarkEmbedding with vertex_ids remapped to
    positions in the gathered anchor-vertex array)."""
    ids = np.asarray(emb.vertex_ids)
    uniq, inv = np.unique(ids.ravel(), return_inverse=True)
    uniq_j = jnp.asarray(uniq)
    restricted = RestrictedFlame(
        v_template=model.v_template[uniq_j],
        shapedirs=model.shapedirs[uniq_j],
        posedirs=model.posedirs[uniq_j],
        lbs_weights=model.lbs_weights[uniq_j],
        j_template=model.j_regressor @ model.v_template,
        j_shapedirs=jnp.einsum("jv,vck->jck", model.j_regressor,
                               model.shapedirs),
    )
    remapped = LandmarkEmbedding(
        vertex_ids=inv.reshape(ids.shape).astype(ids.dtype), bary=emb.bary)
    return restricted, remapped


def load_landmark_embedding(path, faces: np.ndarray) -> LandmarkEmbedding:
    """Official flame_static_embedding.pkl: lmk_face_idx + lmk_b_coords;
    anchored triangles resolved against the model's topology."""
    with open(Path(path), "rb") as f:
        data = pickle.load(f, encoding="latin1")
    face_idx = np.asarray(data["lmk_face_idx"], np.int64)
    bary = np.asarray(data["lmk_b_coords"], np.float64)
    return LandmarkEmbedding(vertex_ids=faces[face_idx],
                             bary=jnp.asarray(bary, jnp.float32))


def synthetic_landmark_embedding(model: FlameModel, n_landmarks: int = 51,
                                 seed: int = 0) -> LandmarkEmbedding:
    rng = np.random.default_rng(seed)
    face_idx = rng.integers(0, model.faces.shape[0], n_landmarks)
    bary = rng.dirichlet(np.ones(3), n_landmarks)
    return LandmarkEmbedding(vertex_ids=model.faces[face_idx],
                             bary=jnp.asarray(bary, jnp.float32))


def model_landmarks(model, emb: LandmarkEmbedding, params):
    """3-D landmark positions for one frame's params.

    ``model`` is a FlameModel or a RestrictedFlame (whose ``emb`` must be the
    matching remapped embedding from ``restrict_to_landmarks``)."""
    if isinstance(model, RestrictedFlame):
        from lets_face_it_tpu.render.flame import _pad_to

        shape = _pad_to(params["shape"][None], 300)
        exp = _pad_to(params["exp"][None],
                      model.shapedirs.shape[-1] - 300)
        betas = jnp.concatenate([shape, exp], axis=-1)          # [1, 400]
        v_shaped = (model.v_template[None]
                    + jnp.einsum("nk,vck->nvc", betas, model.shapedirs))
        joints = (model.j_template[None]
                  + jnp.einsum("nk,jck->njc", betas, model.j_shapedirs))
        verts = pose_and_skin(
            model.posedirs, model.lbs_weights, v_shaped, joints,
            jaw=params["pose"][None, 3:6], neck=params["pose"][None, :3],
            eyes=params["pose"][None, 6:12], global_rot=params["rot"][None],
        )[0] + params["trans"]
    else:
        verts = flame_vertices(
            model,
            params["shape"][None], params["exp"][None],
            jaw=params["pose"][None, 3:6], neck=params["pose"][None, :3],
            eyes=params["pose"][None, 6:12], global_rot=params["rot"][None],
        )[0] + params["trans"]
    tri = verts[jnp.asarray(emb.vertex_ids)]          # [L, 3, 3]
    return jnp.einsum("lvc,lv->lc", tri, emb.bary)    # [L, 3]


def _lmk_dist(model, emb, params, target):
    lmks = model_landmarks(model, emb, params)
    proj = params["scale"] * lmks[:, :2]
    factor = jnp.maximum(target[:, 0].max() - target[:, 0].min(),
                         target[:, 1].max() - target[:, 1].min())
    return WEIGHTS["lmk"] * jnp.sum((proj - target) ** 2) / (factor ** 2)


def _regularizers(params):
    pose = params["pose"]
    return (WEIGHTS["neck_pose"] * jnp.sum(pose[:3] ** 2)
            + WEIGHTS["jaw_pose"] * jnp.sum(pose[3:6] ** 2)
            + WEIGHTS["eyeballs_pose"] * jnp.sum(pose[6:12] ** 2)
            + WEIGHTS["shape"] * jnp.sum(params["shape"] ** 2)
            + WEIGHTS["expr"] * jnp.sum(params["exp"] ** 2))


def _lbfgs_solve(loss_fn, params, n_steps: int):
    opt = optax.lbfgs()

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(
            grads, state, params, value=loss, grad=grads, value_fn=loss_fn)
        params = optax.apply_updates(params, updates)
        return (params, state), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt.init(params)), None, length=n_steps)
    return params, losses[-1]


def init_scale(model, emb, params, target):
    """Praat of the fit: scale init = 2-D spread / 3-D xy spread
    (flame.py:85-100)."""
    lmks = model_landmarks(model, emb, params)
    s2d = jnp.mean(jnp.linalg.norm(target - target.mean(0), axis=1))
    s3d = jnp.mean(jnp.sqrt(jnp.sum(
        (lmks - lmks.mean(0))[:, :2] ** 2, axis=1)))
    return s2d / jnp.maximum(s3d, 1e-9)


@partial(jax.jit, static_argnames=("stage1_steps", "stage2_steps"))
def _fit_batch_impl(model, emb, targets, init, stage1_steps, stage2_steps):

    def fit_one(target, init_one):
        params = dict(init_one)
        params["scale"] = init_scale(model, emb, params, target)

        # stage 1: rigid alignment (scale, trans, rot)
        rigid_keys = ("scale", "trans", "rot")

        def loss1(p_rigid):
            merged = {**params, **p_rigid}
            return _lmk_dist(model, emb, merged, target)

        p_rigid = {k: params[k] for k in rigid_keys}
        p_rigid, _ = _lbfgs_solve(loss1, p_rigid, stage1_steps)
        params.update(p_rigid)

        # stage 2: everything (trans constrained to xy — flame.py:151)
        trans_z = params["trans"][2]

        def loss2(p_all):
            merged = dict(p_all)
            merged["trans"] = jnp.concatenate(
                [p_all["trans"][:2], trans_z[None]])
            return (_lmk_dist(model, emb, merged, target)
                    + _regularizers(merged))

        params, final_loss = _lbfgs_solve(loss2, params, stage2_steps)
        params["trans"] = jnp.concatenate([params["trans"][:2], trans_z[None]])
        return params, final_loss

    return jax.vmap(fit_one)(targets, init)


def fit_batch(model: FlameModel, emb: LandmarkEmbedding, targets,
              init=None, *, stage1_steps: int = 30, stage2_steps: int = 60,
              mesh=None, restrict: bool = True):
    """Fit FLAME to [N, 51, 2] target landmarks; all N frames in parallel.

    init: optional dict of [N, ...] arrays {trans, rot, pose, shape, exp}
    (e.g. from RingNet). Returns (params dict of [N, ...], losses [N]).

    ``mesh``: optional 1-axis ``jax.sharding.Mesh`` — the frame axis is
    sharded across its devices (the fit is frame-independent, so GSPMD
    splits the vmapped solve with zero collectives; the reference used a
    Ray actor pool over GPUs for this role, flame.py:266-291). Requires
    N % mesh.devices.size == 0.

    ``restrict``: evaluate the objective through the landmark-anchor-only
    model (``restrict_to_landmarks``) — the same math on ~150 of the 5,023
    vertices. ``False`` forces the full-model evaluation (measurement /
    debugging; tests pin the two paths equal).
    """
    if restrict and not isinstance(model, RestrictedFlame):
        model, emb = restrict_to_landmarks(model, emb)
    targets = jnp.asarray(targets, jnp.float32)
    n = targets.shape[0]
    sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if n % mesh.devices.size:
            raise ValueError(
                f"frame count {n} not divisible over {mesh.devices.size} "
                f"devices; pad the chunk (fit_session_participant does)")
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        targets = jax.device_put(targets, sh)
    n_expr = model.shapedirs.shape[-1] - 300
    zeros = {
        "trans": jnp.zeros((n, 3)),
        "rot": jnp.zeros((n, 3)),
        "pose": jnp.zeros((n, 12)),
        "shape": jnp.zeros((n, 300)),
        "exp": jnp.zeros((n, n_expr)),
    }
    if init:
        for k, v in init.items():
            v = jnp.asarray(v, jnp.float32)
            zeros[k] = zeros[k].at[:, : v.shape[1]].set(v)
    if sh is not None:
        zeros = {k: jax.device_put(v, sh) for k, v in zeros.items()}
    return _fit_batch_impl(model, emb, targets, zeros,
                           stage1_steps, stage2_steps)


def fit_to_vertices(model: FlameModel, target_vertices, *, n_steps: int = 80,
                    weights: dict | None = None):
    """Fit FLAME params to target meshes (all frames batched): the role of the
    reference's VOCA ``MeshFitter`` (voca.py:27-123) and of the missing
    ``feature_extraction.mesh_utils.get_flame_parameters_for_objs`` used by
    the segment tooling (get_data_segments.py:28-36) — converting e.g. VOCA
    lipsync vertex sequences into FLAME parameter sequences.

    target_vertices: [N, V, 3]. Returns (params dict of [N, ...], losses [N]).
    """
    from lets_face_it_tpu.render.flame import flame_vertices

    w = {"expr": 1e-4, "jaw": 1e-4, "neck": 1e-3, "shape": 1e-4}
    if weights:
        w.update(weights)
    targets = jnp.asarray(target_vertices, jnp.float32)
    n = targets.shape[0]
    n_expr = model.shapedirs.shape[-1] - 300

    def fit_one(target):
        params = {
            "shape": jnp.zeros(300), "exp": jnp.zeros(n_expr),
            "jaw": jnp.zeros(3), "neck": jnp.zeros(3), "trans": jnp.zeros(3),
        }

        def loss_fn(p):
            verts = flame_vertices(
                model, p["shape"][None], p["exp"][None], p["jaw"][None],
                p["neck"][None])[0] + p["trans"]
            data = jnp.mean(jnp.sum((verts - target) ** 2, axis=-1))
            reg = (w["expr"] * jnp.sum(p["exp"] ** 2)
                   + w["jaw"] * jnp.sum(p["jaw"] ** 2)
                   + w["neck"] * jnp.sum(p["neck"] ** 2)
                   + w["shape"] * jnp.sum(p["shape"] ** 2))
            return data + reg

        return _lbfgs_solve(loss_fn, params, n_steps)

    return jax.vmap(fit_one)(targets)


def openface_targets(csv_rows) -> np.ndarray:
    """OpenFace rows -> [N, 51, 2] targets: cols 299:435 reshaped (2, 68),
    transposed, jaw contour (first 17) dropped, y flipped to 1024 - y
    (flame.py:51-53, 282-284)."""
    out = []
    for row in csv_rows:
        lm = np.array([float(x) for x in row[299:435]]).reshape(2, -1).T[17:]
        lm[:, 1] = IMAGE_HEIGHT - lm[:, 1]
        out.append(lm)
    return np.asarray(out, np.float32)


def fit_session_participant(part_dir, fps: int, *, model=None, emb=None,
                            flame_model_path=None,
                            landmark_embedding_path=None,
                            batch_frames: int = 256,
                            stage1_steps: int = 30, stage2_steps: int = 60,
                            mesh=None, restrict: bool = True):
    """Produce ``flame_{fps}fps.h5`` for one participant directory from its
    OpenFace CSV (+ optional RingNet init), the batched-XLA replacement for
    the reference's extract_flame (flame.py:244-303).

    ``mesh``: optional 1-axis device mesh; chunks are padded to a per-device
    multiple and the frame axis sharded across it (the reference distributed
    sessions over a Ray GPU actor pool, flame.py:266-291 — here one sharded
    dispatch covers n_devices× the frames). Results are identical to the
    single-device driver (tests/test_flame_fit.py pins equality)."""
    import csv

    from lets_face_it_tpu.render.flame import load_flame

    part_dir = Path(part_dir)
    if model is None:
        model = load_flame(flame_model_path)
    if emb is None:
        emb = load_landmark_embedding(landmark_embedding_path, model.faces)
    if restrict and not isinstance(model, RestrictedFlame):
        # hoist the anchor-vertex gather out of the chunk loop
        model, emb = restrict_to_landmarks(model, emb)

    with open(part_dir / f"openface_{fps}fps.csv") as f:
        rows = list(csv.reader(f))[1:]
    targets = openface_targets(rows)
    n = targets.shape[0]

    init = None
    ringnet_file = part_dir / f"ringnet_{fps}fps.h5"
    if ringnet_file.exists():
        with h5py.File(ringnet_file, "r") as f:
            fp = f["flame_params"]
            init = {"rot": fp["pose"][:, :3], "pose": np.pad(
                        fp["pose"][:, 3:6], ((0, 0), (3, 6))),
                    "shape": fp["shape"][()], "exp": fp["expression"][()]}

    quantum = min(batch_frames, 32)
    if mesh is not None:
        # equal per-device shards: quantize to a multiple of the device
        # count too (32 already covers the common 2/4/8/16/32 meshes), and
        # keep the chunk stride a quantum multiple
        import math

        quantum = math.lcm(quantum, mesh.devices.size)
        batch_frames = max(batch_frames // quantum * quantum, quantum)

    results = {k: [] for k in ("tf_trans", "tf_rot", "tf_pose", "tf_shape",
                               "tf_exp")}
    for lo in range(0, n, batch_frames):
        hi = min(lo + batch_frames, n)
        chunk_init = ({k: v[lo:hi] for k, v in init.items()}
                      if init else None)
        # pad ragged chunks up to a quantized shape: the batched two-stage
        # solve compiles in ~minutes at real FLAME size and the jit cache is
        # shape-keyed, so a distinct shape per session remainder (or per
        # short clip) would recompile every time. Quantizing to multiples
        # of 32 bounds the number of compiled shapes while keeping short
        # clips cheap (edge targets repeat the last frame; padded rows are
        # sliced off)
        keep = hi - lo
        padded = min(batch_frames, -(-keep // quantum) * quantum)
        pad = padded - keep
        chunk_targets = targets[lo:hi]
        if pad:
            chunk_targets = np.concatenate(
                [chunk_targets, np.repeat(chunk_targets[-1:], pad, axis=0)])
            if chunk_init:
                chunk_init = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)])
                    for k, v in chunk_init.items()}
        params, _ = fit_batch(model, emb, chunk_targets, chunk_init,
                              stage1_steps=stage1_steps,
                              stage2_steps=stage2_steps, mesh=mesh,
                              restrict=restrict)
        results["tf_trans"].append(np.asarray(params["trans"])[:keep])
        results["tf_rot"].append(np.asarray(params["rot"])[:keep])
        results["tf_pose"].append(np.asarray(params["pose"])[:keep])
        results["tf_shape"].append(np.asarray(params["shape"])[:keep])
        results["tf_exp"].append(np.asarray(params["exp"])[:keep])

    out_file = part_dir / f"flame_{fps}fps.h5"
    with h5py.File(out_file, "w") as f:
        for key, chunks in results.items():
            f.create_dataset(key, data=np.concatenate(chunks, axis=0))
    return out_file

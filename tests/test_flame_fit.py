"""Batched FLAME landmark fitting: recover known parameters from projected
landmarks on the synthetic model."""

import csv

import h5py
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.features import flame_fit
from lets_face_it_tpu.render import flame

MODEL = flame.synthetic_flame_model(160, seed=1)
EMB = flame_fit.synthetic_landmark_embedding(MODEL, seed=2)


def _targets_from_params(params_list):
    outs = []
    for p in params_list:
        lmks = flame_fit.model_landmarks(MODEL, EMB, p)
        outs.append(np.asarray(p["scale"] * lmks[:, :2]))
    return np.asarray(outs, np.float32)


def test_fit_recovers_rigid_pose():
    rng = np.random.default_rng(0)
    n = 4
    true = []
    for _ in range(n):
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.2, 0.2, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(900.0),
        })
    targets = _targets_from_params(true)

    params, losses = flame_fit.fit_batch(MODEL, EMB, targets,
                                         stage1_steps=40, stage2_steps=80)
    assert np.asarray(losses).max() < 1e-3, np.asarray(losses)

    # reprojected landmarks match the targets closely
    for i in range(n):
        p = {k: jnp.asarray(v[i]) for k, v in params.items()}
        lmks = flame_fit.model_landmarks(MODEL, EMB, p)
        proj = np.asarray(p["scale"] * lmks[:, :2])
        err = np.abs(proj - targets[i]).max() / (np.ptp(targets[i]) + 1e-9)
        assert err < 0.02, err


def test_restricted_landmarks_match_full_model():
    """The landmark-anchor-restricted evaluation (restrict_to_landmarks) is
    the same landmark math as the full model — per-vertex blendshapes/LBS
    gathered, joint regression reassociated (ulp-level)."""
    rng = np.random.default_rng(5)
    rmodel, remb = flame_fit.restrict_to_landmarks(MODEL, EMB)
    # every anchor vertex appears exactly once in the gathered set
    assert rmodel.v_template.shape[0] == np.unique(
        np.asarray(EMB.vertex_ids)).size
    assert rmodel.j_shapedirs.shape == (5, 3, 400)
    for _ in range(3):
        p = {
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32),
            "pose": jnp.asarray(rng.uniform(-0.2, 0.2, 12), jnp.float32),
            "shape": jnp.asarray(rng.normal(0, 0.5, 300), jnp.float32),
            "exp": jnp.asarray(rng.normal(0, 0.5, 100), jnp.float32),
        }
        full = np.asarray(flame_fit.model_landmarks(MODEL, EMB, p))
        rest = np.asarray(flame_fit.model_landmarks(rmodel, remb, p))
        np.testing.assert_allclose(rest, full, atol=2e-6)


def test_fit_batch_restricted_matches_full():
    """The restricted objective is the same function as the full one: its
    VALUE AND GRADIENT match at arbitrary points (the optimizer sees the
    same landscape), and the fit converges to the same quality. Step-k
    trajectory equality is deliberately NOT asserted — the joint-regression
    reassociation is ~1 ulp, and the zoom linesearch's branches amplify
    that chaotically mid-convergence (measured: one of four frames takes a
    different, equally-converging path by step 10)."""
    import jax

    rng = np.random.default_rng(6)
    rmodel, remb = flame_fit.restrict_to_landmarks(MODEL, EMB)
    target = jnp.asarray(rng.uniform(0, 900, (51, 2)), jnp.float32)

    def loss(model, emb, p):
        return (flame_fit._lmk_dist(model, emb, p, target)
                + flame_fit._regularizers(p))

    for _ in range(3):
        p = {
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32),
            "pose": jnp.asarray(rng.uniform(-0.2, 0.2, 12), jnp.float32),
            "shape": jnp.asarray(rng.normal(0, 0.5, 300), jnp.float32),
            "exp": jnp.asarray(rng.normal(0, 0.5, 100), jnp.float32),
            "scale": jnp.asarray(700.0),
        }
        v_f, g_f = jax.value_and_grad(lambda q: loss(MODEL, EMB, q))(p)
        v_r, g_r = jax.value_and_grad(lambda q: loss(rmodel, remb, q))(p)
        np.testing.assert_allclose(float(v_r), float(v_f), rtol=1e-5)
        for k in g_f:
            np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_f[k]),
                                       rtol=1e-4, atol=1e-5)

    # both paths converge to the same fit quality on rigid-pose recovery
    n = 4
    true = []
    for _ in range(n):
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.2, 0.2, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(900.0),
        })
    targets = _targets_from_params(true)
    steps = dict(stage1_steps=40, stage2_steps=80)
    _, losses_r = flame_fit.fit_batch(MODEL, EMB, targets, **steps)
    _, losses_f = flame_fit.fit_batch(MODEL, EMB, targets, restrict=False,
                                      **steps)
    assert np.asarray(losses_r).max() < 1e-3, np.asarray(losses_r)
    assert np.asarray(losses_f).max() < 1e-3, np.asarray(losses_f)


def test_fit_batch_sharded_matches_single_device():
    """Frame-axis sharding over the 8-device mesh (the reference's Ray GPU
    actor-pool role) must return the same fit as the single-device path —
    the solve is frame-independent, so GSPMD splits it with no collectives."""
    import jax

    from lets_face_it_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(11)
    n = 16
    true = []
    for _ in range(n):
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.2, 0.2, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(900.0),
        })
    targets = _targets_from_params(true)
    steps = dict(stage1_steps=10, stage2_steps=10)

    params_1, losses_1 = flame_fit.fit_batch(MODEL, EMB, targets, **steps)
    mesh = pmesh.make_mesh()
    params_8, losses_8 = flame_fit.fit_batch(MODEL, EMB, targets, mesh=mesh,
                                             **steps)
    # the fit stays sharded across the mesh (no gather onto one device)
    assert len({s.device for s in losses_8.addressable_shards}) == 8
    # Sharding changes XLA reduction order; 20 L-BFGS iterations amplify
    # the ulp-level differences chaotically. Measured: losses within 2e-6
    # absolute (scale 6e-4), params within 2e-4 — the same converged fit.
    np.testing.assert_allclose(np.asarray(losses_8), np.asarray(losses_1),
                               atol=1e-5)
    for k in params_1:
        np.testing.assert_allclose(np.asarray(params_8[k]),
                                   np.asarray(params_1[k]), atol=1e-3)

    # non-divisible frame counts are rejected loudly (the session driver
    # pads chunks to a per-device multiple instead)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        flame_fit.fit_batch(MODEL, EMB, targets[:6], mesh=mesh, **steps)


def test_fit_session_sharded_matches_single_device(tmp_path):
    """End-to-end session driver equality: the mesh-sharded driver writes
    the same flame h5 as the single-device one (ragged final chunk padded
    to a per-device multiple)."""
    import shutil

    from lets_face_it_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(12)
    n_frames = 40  # not a multiple of 8: exercises the lcm padding
    true = []
    for _ in range(n_frames):
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.03, 0.03, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.1, 0.1, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(900.0),
        })
    targets = _targets_from_params(true)

    def write_part(d):
        d.mkdir(parents=True)
        with open(d / "openface_25fps.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([f"c{i}" for i in range(436)])
            for ts in range(n_frames):
                full = np.zeros((68, 2), np.float32)
                full[17:] = targets[ts]
                full[17:, 1] = 1024.0 - full[17:, 1]
                w.writerow(["0", str(ts), str(ts / 25), "0.99", "1"]
                           + ["0"] * 294
                           + [str(v) for v in full[:, 0]]
                           + [str(v) for v in full[:, 1]] + ["0"])

    part_a, part_b = tmp_path / "single" / "P1", tmp_path / "sharded" / "P1"
    write_part(part_a)
    write_part(part_b)
    steps = dict(stage1_steps=10, stage2_steps=10, batch_frames=32)

    out_a = flame_fit.fit_session_participant(part_a, 25, model=MODEL,
                                              emb=EMB, **steps)
    out_b = flame_fit.fit_session_participant(part_b, 25, model=MODEL,
                                              emb=EMB,
                                              mesh=pmesh.make_mesh(),
                                              **steps)
    with h5py.File(out_a) as fa, h5py.File(out_b) as fb:
        for key in ("tf_trans", "tf_rot", "tf_pose", "tf_shape", "tf_exp"):
            assert fa[key].shape == fb[key].shape == (
                (n_frames,) + fa[key].shape[1:])
            # same reduction-order tolerance rationale as the fit_batch test
            np.testing.assert_allclose(fb[key][()], fa[key][()], atol=1e-3)
    shutil.rmtree(tmp_path / "sharded")


def test_fit_with_expression():
    rng = np.random.default_rng(3)
    n = 2
    true = []
    for _ in range(n):
        exp = np.zeros(100)
        exp[:10] = rng.uniform(-1, 1, 10)
        true.append({
            "trans": jnp.zeros(3),
            "rot": jnp.asarray(rng.uniform(-0.1, 0.1, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.asarray(exp, jnp.float32),
            "scale": jnp.asarray(800.0),
        })
    targets = _targets_from_params(true)
    params, losses = flame_fit.fit_batch(MODEL, EMB, targets,
                                         stage1_steps=40, stage2_steps=120)
    # regularized fit: loss small but nonzero
    assert np.asarray(losses).max() < 5e-2


def test_openface_targets_layout():
    row = ["0"] * 299 + [str(float(i)) for i in range(136)] + ["0"] * 10
    targets = flame_fit.openface_targets([row])
    assert targets.shape == (1, 51, 2)
    # x from first 68 cols (indices 17..67), y flipped
    assert targets[0, 0, 0] == 17.0
    assert targets[0, 0, 1] == 1024.0 - (68 + 17.0)


def test_fit_session_participant(tmp_path):
    n = 6
    rng = np.random.default_rng(4)
    true = []
    for _ in range(n):
        true.append({
            "trans": jnp.zeros(3),
            "rot": jnp.asarray(rng.uniform(-0.1, 0.1, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(700.0),
        })
    targets = _targets_from_params(true)  # [n, 51, 2]

    part = tmp_path / "P1"
    part.mkdir()
    with open(part / "openface_25fps.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([f"c{i}" for i in range(436)])
        for i in range(n):
            lm = targets[i].copy()
            lm[:, 1] = 1024.0 - lm[:, 1]  # un-flip for CSV storage
            full = np.zeros((68, 2), np.float32)
            full[17:] = lm
            row = ["0"] * 299 + [str(v) for v in full[:, 0]] \
                + [str(v) for v in full[:, 1]] + ["0"]
            w.writerow(row)

    out = flame_fit.fit_session_participant(part, 25, model=MODEL, emb=EMB)
    with h5py.File(out) as f:
        assert f["tf_pose"].shape == (n, 12)
        assert f["tf_exp"].shape == (n, 100)
        assert f["tf_rot"].shape == (n, 3)
        assert np.isfinite(f["tf_rot"][()]).all()

    # ragged final chunk: batch_frames=4 over n=6 pads the 2-frame
    # remainder to the full chunk shape (one compile, not one per
    # remainder) and slices the padding back off
    out.unlink()
    out2 = flame_fit.fit_session_participant(part, 25, model=MODEL, emb=EMB,
                                             batch_frames=4)
    with h5py.File(out2) as f:
        assert f["tf_pose"].shape == (n, 12)
        assert np.isfinite(f["tf_pose"][()]).all()


def test_fit_to_vertices_recovers_expression():
    """Vertex-target fitting (the VOCA mesh-fitter role)."""
    import jax

    rng = np.random.default_rng(7)
    n = 2
    true_exp = np.zeros((n, 100), np.float32)
    true_exp[:, :5] = rng.uniform(-1.5, 1.5, (n, 5))
    true_jaw = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    targets = flame.flame_vertices(
        MODEL, jnp.zeros((n, 300)), jnp.asarray(true_exp),
        jnp.asarray(true_jaw), jnp.zeros((n, 3)))

    weights = {"expr": 1e-7, "jaw": 1e-7, "neck": 1e-7, "shape": 1e-7}
    params, losses = flame_fit.fit_to_vertices(MODEL, targets, n_steps=150,
                                               weights=weights)
    assert np.asarray(losses).max() < 1e-4, np.asarray(losses)
    # reconstructed meshes match the targets
    recon = flame.flame_vertices(
        MODEL, params["shape"], params["exp"], params["jaw"], params["neck"])
    recon = recon + params["trans"][:, None]
    err = np.abs(np.asarray(recon) - np.asarray(targets)).max()
    assert err <5e-3, err


def test_neutral_mesh_and_ply_roundtrip(tmp_path):
    from lets_face_it_tpu.render.flame import (
        neutral_mesh_vertices, read_ply, write_ply)

    verts = neutral_mesh_vertices(MODEL)
    assert verts.shape == (160, 3)
    np.testing.assert_allclose(np.asarray(verts),
                               np.asarray(MODEL.v_template), atol=1e-5)
    path = write_ply(tmp_path / "neutral.ply", verts, MODEL.faces)
    v2, f2 = read_ply(path)
    np.testing.assert_allclose(v2, np.asarray(verts), atol=1e-4)
    np.testing.assert_array_equal(f2, MODEL.faces)


def test_ringnet_init_lowers_fit_loss(tmp_path):
    """End-to-end RingNet-init path (reference ringnet.py:96-158 +
    flame.py:266-291): a ``ringnet_{fps}fps.h5`` with the reference's
    ``flame_params/{cam,pose(6),shape(100),expression(50)}`` layout seeds
    fit_session_participant, and the init measurably lowers the final fit
    loss vs zero-init under a reduced step budget."""
    n = 4
    rng = np.random.default_rng(7)
    true = []
    for _ in range(n):
        exp = np.zeros(100)
        exp[:10] = rng.uniform(-1.5, 1.5, 10)
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.45, 0.45, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.zeros(300),
            "exp": jnp.asarray(exp, jnp.float32),
            "scale": jnp.asarray(750.0),
        })
    targets = _targets_from_params(true)

    # RingNet-style init: noisy truth, reference h5 layout (pose = rot+jaw 6D,
    # shape 100D, expression 50D)
    ringnet_pose = np.stack([
        np.concatenate([np.asarray(p["rot"]) + rng.normal(0, 0.03, 3),
                        np.zeros(3)]) for p in true]).astype(np.float32)
    ringnet_exp = np.stack([
        np.asarray(p["exp"][:50]) + rng.normal(0, 0.05, 50).astype(np.float32)
        for p in true])
    ringnet_shape = np.zeros((n, 100), np.float32)

    steps = dict(stage1_steps=4, stage2_steps=8)
    init = {"rot": ringnet_pose[:, :3],
            "pose": np.pad(ringnet_pose[:, 3:6], ((0, 0), (3, 6))),
            "shape": ringnet_shape, "exp": ringnet_exp}
    _, losses_init = flame_fit.fit_batch(MODEL, EMB, targets, init, **steps)
    _, losses_zero = flame_fit.fit_batch(MODEL, EMB, targets, None, **steps)
    assert np.asarray(losses_init).mean() < 0.7 * np.asarray(losses_zero).mean(), (
        np.asarray(losses_init), np.asarray(losses_zero))

    # the same init drives the file-based session path
    part = tmp_path / "P1"
    part.mkdir()
    with open(part / "openface_25fps.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([f"c{i}" for i in range(436)])
        for i in range(n):
            lm = targets[i].copy()
            lm[:, 1] = 1024.0 - lm[:, 1]
            full = np.zeros((68, 2), np.float32)
            full[17:] = lm
            row = ["0"] * 299 + [str(v) for v in full[:, 0]] \
                + [str(v) for v in full[:, 1]] + ["0"]
            w.writerow(row)
    with h5py.File(part / "ringnet_25fps.h5", "w") as f:
        f["flame_params/cam"] = np.zeros((n, 3), np.float32)
        f["flame_params/pose"] = ringnet_pose
        f["flame_params/shape"] = ringnet_shape
        f["flame_params/expression"] = ringnet_exp

    out = flame_fit.fit_session_participant(part, 25, model=MODEL, emb=EMB,
                                            stage1_steps=4, stage2_steps=8)
    with h5py.File(out) as f:
        got_rot = f["tf_rot"][()]
    # with the ringnet seed and few steps, recovered rotations track truth
    true_rot = np.stack([np.asarray(p["rot"]) for p in true])
    assert np.abs(got_rot - true_rot).max() < 0.15, (got_rot, true_rot)


def _write_openface_csv(part, targets):
    with open(part / "openface_25fps.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([f"c{i}" for i in range(436)])
        for i in range(targets.shape[0]):
            lm = targets[i].copy()
            lm[:, 1] = 1024.0 - lm[:, 1]  # un-flip for CSV storage
            full = np.zeros((68, 2), np.float32)
            full[17:] = lm
            row = ["0"] * 299 + [str(v) for v in full[:, 0]] \
                + [str(v) for v in full[:, 1]] + ["0"]
            w.writerow(row)


def test_ringnet_lite_stage(tmp_path):
    """The in-framework RingNet-lite stage (features/ringnet_lite.py):
    openface CSV -> reference-layout ringnet_{fps}fps.h5 whose init lowers
    the main fit's loss, replacing the external TF1 RingNet role
    (ringnet.py:96-158)."""
    from lets_face_it_tpu.features import ringnet_lite

    n = 6
    rng = np.random.default_rng(11)
    shared_shape = np.zeros(300, np.float32)
    shared_shape[:5] = rng.uniform(-1.2, 1.2, 5)
    true = []
    for _ in range(n):
        true.append({
            "trans": jnp.asarray(rng.uniform(-0.03, 0.03, 3), jnp.float32),
            "rot": jnp.asarray(rng.uniform(-0.4, 0.4, 3), jnp.float32),
            "pose": jnp.zeros(12),
            "shape": jnp.asarray(shared_shape),
            "exp": jnp.zeros(100),
            "scale": jnp.asarray(750.0),
        })
    targets = _targets_from_params(true)

    part = tmp_path / "P1"
    part.mkdir()
    _write_openface_csv(part, targets)

    out = ringnet_lite.extract_ringnet_lite(
        part, 25, model=MODEL, emb=EMB, shape_frames=6)
    assert out == part / "ringnet_25fps.h5"
    with h5py.File(out) as f:
        fp = f["flame_params"]
        assert fp["cam"].shape == (n, 3)
        assert fp["pose"].shape == (n, 6)          # [rot | jaw]
        assert fp["shape"].shape == (n, 100)
        assert fp["expression"].shape == (n, 50)
        got_rot = fp["pose"][:, :3]
        # all frames share one session-level shape estimate
        assert np.ptp(fp["shape"][()], axis=0).max() < 1e-6
    true_rot = np.stack([np.asarray(p["rot"]) for p in true])
    assert np.abs(got_rot - true_rot).max() < 0.2, (got_rot, true_rot)

    # idempotent driver (reference stage convention)
    mtime = out.stat().st_mtime_ns
    assert ringnet_lite.extract_ringnet_lite(part, 25, model=MODEL,
                                             emb=EMB) == out
    assert out.stat().st_mtime_ns == mtime

    # the lite init measurably helps the main fit under a small step budget
    with h5py.File(out) as f:
        fp = f["flame_params"]
        init = {"rot": fp["pose"][:, :3],
                "pose": np.pad(fp["pose"][:, 3:6], ((0, 0), (3, 6))),
                "shape": fp["shape"][()], "exp": fp["expression"][()]}
    steps = dict(stage1_steps=4, stage2_steps=8)
    _, losses_lite = flame_fit.fit_batch(MODEL, EMB, targets, init, **steps)
    _, losses_zero = flame_fit.fit_batch(MODEL, EMB, targets, None, **steps)
    assert (np.asarray(losses_lite).mean()
            < 0.9 * np.asarray(losses_zero).mean()), (
        np.asarray(losses_lite), np.asarray(losses_zero))

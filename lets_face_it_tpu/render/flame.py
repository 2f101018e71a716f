"""FLAME head-model decoder in JAX: shape/expression blendshapes, pose
corrective blendshapes, and 5-joint linear blend skinning, evaluated batched
over whole sequences on the TPU.

Replaces FLAME_PyTorch as used by the reference render path
(render_tools.py:174-208): one ``flame_vertices`` call evaluates every frame
of a sequence as a single fused batch of einsums on the MXU instead of a
per-frame module call.

Model weights: the FLAME 2019 model (generic/female/male ``.pkl`` from
flame.is.tue.mpg.de — not redistributable, so not bundled). ``load_flame``
reads the official pickle (tolerating its chumpy-wrapped arrays without
needing chumpy installed) or an ``.npz`` with the same field names; tests use
``synthetic_flame_model``.

Joint order (FLAME kinematic tree): 0 global, 1 neck, 2 jaw, 3 left eye,
4 right eye; parents [-1, 0, 1, 1, 1].
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PARENTS = np.array([-1, 0, 1, 1, 1])
N_JOINTS = 5


class FlameModel(NamedTuple):
    v_template: jnp.ndarray   # [V, 3]
    shapedirs: jnp.ndarray    # [V, 3, 400] (300 shape + 100 expression)
    posedirs: jnp.ndarray     # [V, 3, 36]  (4 non-root joints x 9 rotmat)
    j_regressor: jnp.ndarray  # [5, V]
    lbs_weights: jnp.ndarray  # [V, 5]
    faces: np.ndarray         # [F, 3] int (host-side, for rasterization)


class _ChumpyStub:
    """Minimal stand-in so FLAME pkls unpickle without chumpy: keeps the
    wrapped ndarray."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    @property
    def r(self):
        for key in ("x", "a", "v"):
            if key in self.__dict__:
                return np.asarray(self.__dict__[key])
        raise AttributeError("no array payload in chumpy stub")


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            from scipy.sparse import csc_matrix

            return csc_matrix
        return super().find_class(module, name)


def _to_np(x):
    if isinstance(x, _ChumpyStub):
        return x.r
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_flame(path, dtype=jnp.float32) -> FlameModel:
    """Load FLAME 2019 from the official .pkl or an equivalent .npz."""
    path = Path(path)
    if path.suffix == ".npz":
        data = dict(np.load(path, allow_pickle=False))
    else:
        with open(path, "rb") as f:
            data = _TolerantUnpickler(f, encoding="latin1").load()
    v_template = _to_np(data["v_template"]).astype(np.float64)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float64)
    posedirs = _to_np(data["posedirs"]).astype(np.float64)
    j_regressor = _to_np(data["J_regressor"]).astype(np.float64)
    weights = _to_np(data["weights"]).astype(np.float64)
    faces = _to_np(data["f"]).astype(np.int32)
    if posedirs.ndim == 2:  # some releases store [V*3, 36]
        posedirs = posedirs.reshape(v_template.shape[0], 3, -1)
    return FlameModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(weights, dtype),
        faces=faces,
    )


def synthetic_flame_model(n_vertices: int = 128, seed: int = 0,
                          dtype=jnp.float32) -> FlameModel:
    """A small random FLAME-shaped model for tests (same tensor contract)."""
    rng = np.random.default_rng(seed)
    v_template = rng.standard_normal((n_vertices, 3)) * 0.1
    shapedirs = rng.standard_normal((n_vertices, 3, 400)) * 0.01
    posedirs = rng.standard_normal((n_vertices, 3, 36)) * 0.01
    j_regressor = np.abs(rng.standard_normal((N_JOINTS, n_vertices)))
    j_regressor /= j_regressor.sum(axis=1, keepdims=True)
    weights = np.abs(rng.standard_normal((n_vertices, N_JOINTS)))
    weights /= weights.sum(axis=1, keepdims=True)
    # random valid triangles
    faces = rng.integers(0, n_vertices, (max(n_vertices, 64), 3)).astype(np.int32)
    return FlameModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(weights, dtype),
        faces=faces,
    )


def rodrigues(rvec):
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (batched).

    Uses the unnormalized-axis form R = I + (sin t / t) K + ((1-cos t)/t^2) K^2
    with Taylor fallbacks near t=0 computed on *safe* inputs, so both the value
    and the gradient are finite at exactly zero rotation (the naive
    axis-normalizing form has NaN gradients there — and zero rotations are the
    common case in landmark-fitting inits)."""
    theta2 = jnp.sum(rvec ** 2, axis=-1)
    small = theta2 < 1e-12
    safe_theta2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_theta2)
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0,
                     (1.0 - jnp.cos(theta)) / safe_theta2)

    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + sinc[..., None, None] * K + cosc[..., None, None] * (K @ K)


def flame_vertices(model: FlameModel, shape, expression, jaw, neck, eyes=None,
                   global_rot=None):
    """Batched FLAME forward: [N, ...] params -> [N, V, 3] vertices.

    shape [N, <=300], expression [N, <=100], jaw [N, 3], neck [N, 3],
    eyes [N, 6] (left‖right), global_rot [N, 3]. The reference render path
    passes global_rot = 0 and folds head rotation into the neck joint
    (render_tools.py:196-199).
    """
    shape = _pad_to(shape, 300)
    n_expr_total = model.shapedirs.shape[-1] - 300
    expression = _pad_to(expression, n_expr_total)

    betas = jnp.concatenate([shape, expression], axis=-1)        # [N, 400]
    v_shaped = (model.v_template[None]
                + jnp.einsum("nk,vck->nvc", betas, model.shapedirs))

    joints = jnp.einsum("jv,nvc->njc", model.j_regressor, v_shaped)  # [N, 5, 3]
    return pose_and_skin(model.posedirs, model.lbs_weights, v_shaped, joints,
                         jaw, neck, eyes, global_rot)


def pose_and_skin(posedirs, lbs_weights, v_shaped, joints, jaw, neck,
                  eyes=None, global_rot=None):
    """Pose-corrective blendshapes + forward kinematics + LBS: the second
    half of ``flame_vertices``, split out so a vertex-subset evaluation (the
    landmark fit restricts to the ~150 anchor vertices, features/flame_fit.py)
    can reuse the exact math with externally supplied shaped vertices and
    joint locations."""
    n = v_shaped.shape[0]
    dtype = v_shaped.dtype
    if eyes is None:
        eyes = jnp.zeros((n, 6), dtype)
    if global_rot is None:
        global_rot = jnp.zeros((n, 3), dtype)

    pose = jnp.stack([global_rot, neck, jaw, eyes[:, :3], eyes[:, 3:]],
                     axis=1)                                      # [N, 5, 3]
    rot = rodrigues(pose)                                         # [N, 5, 3, 3]

    # pose corrective blendshapes: non-root relative rotations minus identity
    eye3 = jnp.eye(3, dtype=dtype)
    pose_feature = (rot[:, 1:] - eye3).reshape(n, 36)
    v_posed = v_shaped + jnp.einsum("np,vcp->nvc", pose_feature, posedirs)

    # forward kinematics along parents [-1, 0, 1, 1, 1]
    transforms = [None] * N_JOINTS
    for j in range(N_JOINTS):
        t_local = _rigid(rot[:, j], joints[:, j]
                         - (joints[:, PARENTS[j]] if PARENTS[j] >= 0
                            else jnp.zeros_like(joints[:, j])))
        transforms[j] = (t_local if PARENTS[j] < 0
                         else transforms[PARENTS[j]] @ t_local)
    A = jnp.stack(transforms, axis=1)                             # [N, 5, 4, 4]

    # remove the rest-pose joint locations (standard LBS correction)
    j_homo = jnp.concatenate([joints, jnp.zeros((n, N_JOINTS, 1), dtype)],
                             axis=-1)
    correction = jnp.einsum("njxy,njy->njx", A, j_homo)           # [N, 5, 4]
    A_rel = A.at[:, :, :, 3].add(-correction)

    W = lbs_weights                                              # [V, 5]
    T = jnp.einsum("vj,njxy->nvxy", W, A_rel)                     # [N, V, 4, 4]
    v_homo = jnp.concatenate(
        [v_posed, jnp.ones((n, v_posed.shape[1], 1), dtype)], axis=-1)
    v_out = jnp.einsum("nvxy,nvy->nvx", T, v_homo)[..., :3]
    return v_out


def _pad_to(x, dim: int):
    if x.shape[-1] == dim:
        return x
    assert x.shape[-1] < dim, f"param dim {x.shape[-1]} exceeds model dim {dim}"
    pad = jnp.zeros(x.shape[:-1] + (dim - x.shape[-1],), x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


def _rigid(R, t):
    """[..., 3, 3], [..., 3] -> homogeneous [..., 4, 4]."""
    n = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), n + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def neutral_mesh_vertices(model: FlameModel, shape=None):
    """Neutral (zero-pose, zero-expression) head vertices [V, 3] — the role
    of the reference's extract_neutral_mesh (ringnet.py:161-176), which ran
    chumpy FLAME over the average RingNet shape."""
    if shape is None:
        shape = jnp.zeros((1, 300), model.v_template.dtype)
    zero = jnp.zeros((1, 3), model.v_template.dtype)
    return flame_vertices(model, shape, jnp.zeros((1, 50)), zero, zero)[0]


def write_ply(path, vertices, faces):
    """Minimal ASCII PLY writer (replaces the psbody.mesh dependency)."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    return path


def read_ply(path):
    """Minimal ASCII PLY reader -> (vertices [V,3] f32, faces [F,3] i32)."""
    vertices, faces = [], []
    with open(path) as f:
        n_v = n_f = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line == "end_header":
                break
        for _ in range(n_v):
            vertices.append([float(x) for x in next(f).split()[:3]])
        for _ in range(n_f):
            parts = next(f).split()
            faces.append([int(x) for x in parts[1:1 + int(parts[0])]])
    return (np.asarray(vertices, np.float32), np.asarray(faces, np.int32))


def get_vertices(model: FlameModel, expression, pose, rotation, eyes=None,
                 shape=None, *, rng=None):
    """The reference's render-path contract (render_tools.py:174-208):
    ``pose`` [N, >=6] carries global rotation in [:3] (zeroed) and jaw in
    [3:6]; head rotation is added to the neck; shape defaults to a random
    100-D draw held constant over the sequence."""
    n = expression.shape[0]
    if shape is None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        s = jnp.zeros((1, 300), expression.dtype)
        s = s.at[:, :100].set(jax.random.uniform(rng, (1, 100)))
        shape = jnp.broadcast_to(s, (n, 300))
    neck = pose[:, :3] + rotation
    jaw = pose[:, 3:6]
    return flame_vertices(model, shape, expression, jaw, neck, eyes)

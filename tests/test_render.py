"""Render stack tests: FLAME decoder math, native rasterizer, HTTP service."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lets_face_it_tpu.render import flame
from lets_face_it_tpu.render.server import (
    RenderService,
    byteify,
    make_handler,
)

MODEL = flame.synthetic_flame_model(96)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    rvecs = np.random.default_rng(0).standard_normal((10, 3)).astype(np.float32)
    got = np.asarray(flame.rodrigues(jnp.asarray(rvecs)))
    ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_rodrigues_zero_is_identity():
    got = np.asarray(flame.rodrigues(jnp.zeros((2, 3))))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)


def test_flame_zero_pose_is_shaped_template():
    n = 3
    shape = jnp.zeros((n, 300))
    expr = jnp.zeros((n, 50))
    zero = jnp.zeros((n, 3))
    v = flame.flame_vertices(MODEL, shape, expr, zero, zero)
    np.testing.assert_allclose(np.asarray(v),
                               np.broadcast_to(np.asarray(MODEL.v_template),
                                               (n,) + MODEL.v_template.shape),
                               atol=1e-5)


def test_flame_expression_blendshape_linear():
    n = 1
    zero3 = jnp.zeros((n, 3))
    e = jnp.zeros((n, 50)).at[0, 7].set(2.0)
    v = flame.flame_vertices(MODEL, jnp.zeros((n, 300)), e, zero3, zero3)
    expected = (np.asarray(MODEL.v_template)
                + 2.0 * np.asarray(MODEL.shapedirs[:, :, 307]))
    np.testing.assert_allclose(np.asarray(v[0]), expected, atol=1e-5)


def test_flame_global_rotation_rotates_rigidly():
    """With only a global rotation, vertices rotate rigidly about joint 0."""
    n = 1
    zero3 = jnp.zeros((n, 3))
    rvec = jnp.asarray([[0.3, -0.2, 0.5]])
    v_rot = flame.flame_vertices(MODEL, jnp.zeros((n, 300)), jnp.zeros((n, 50)),
                                 zero3, zero3, global_rot=rvec)
    v_rest = np.asarray(MODEL.v_template)
    joints = np.asarray(MODEL.j_regressor) @ v_rest
    R = np.asarray(flame.rodrigues(rvec))[0]
    expected = (v_rest - joints[0]) @ R.T + joints[0]
    np.testing.assert_allclose(np.asarray(v_rot[0]), expected, atol=1e-4)


def test_flame_jaw_only_moves_jaw_weighted_vertices():
    n = 1
    zero3 = jnp.zeros((n, 3))
    jaw = jnp.asarray([[0.4, 0.0, 0.0]])
    v0 = flame.flame_vertices(MODEL, jnp.zeros((n, 300)), jnp.zeros((n, 50)),
                              zero3, zero3)
    v1 = flame.flame_vertices(MODEL, jnp.zeros((n, 300)), jnp.zeros((n, 50)),
                              jaw, zero3)
    moved = np.abs(np.asarray(v1 - v0)).sum(axis=-1)[0]
    w_jaw = np.asarray(MODEL.lbs_weights)[:, 2]
    # vertices with (near) zero jaw weight move only via pose correctives
    # (small by construction); heavy-jaw vertices move much more
    corr = np.corrcoef(moved, w_jaw)[0, 1]
    assert corr > 0.5, corr


def test_get_vertices_reference_contract():
    n = 4
    expression = jnp.zeros((n, 50))
    pose = jnp.zeros((n, 12)).at[:, 3].set(0.2)   # jaw open
    rotation = jnp.zeros((n, 3)).at[:, 1].set(0.1)
    verts = flame.get_vertices(MODEL, expression, pose, rotation,
                               rng=jax.random.PRNGKey(0))
    assert verts.shape == (n, 96, 3)
    assert np.isfinite(np.asarray(verts)).all()


# ---------------------------------------------------------------------------
# Native rasterizer
# ---------------------------------------------------------------------------

def _triangle_scene():
    # one big triangle in front of the camera (camera at z=1 looking -z)
    verts = np.array([[[-0.5, -0.4, 0.0], [0.5, -0.4, 0.0], [0.0, 0.6, 0.0]]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    colors = np.tile(np.array([[1.0, 0.2, 0.2]], np.float32), (3, 1))
    return verts, faces, colors


def test_rasterizer_draws_triangle():
    from lets_face_it_tpu.render.rasterizer import Rasterizer

    r = Rasterizer(width=128, height=128, x=64, y=64, z=0, f=(100.0, 100.0))
    verts, faces, colors = _triangle_scene()
    img = r.render([(verts, faces, colors)])
    assert img.shape == (1, 128, 128, 3)
    # some pixels are not background, and they're reddish
    non_bg = (img[0] != 255).any(axis=-1)
    assert non_bg.sum() > 100
    reds = img[0][non_bg]
    assert reds[:, 0].mean() > reds[:, 1].mean()


def test_rasterizer_z_buffer():
    from lets_face_it_tpu.render.rasterizer import Rasterizer

    r = Rasterizer(width=64, height=64, x=32, y=32, z=0, f=(60.0, 60.0))
    near, faces, _ = _triangle_scene()
    far = near.copy()
    far[..., 2] = -1.0  # farther from the camera
    red = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (3, 1))
    green = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (3, 1))
    img = r.render([(far, faces, green), (near, faces, red)])
    non_bg = (img[0] != 255).any(axis=-1)
    pix = img[0][non_bg].astype(float)
    # near (red) triangle must win where they overlap
    assert (pix[:, 0] > pix[:, 1]).mean() > 0.6


# ---------------------------------------------------------------------------
# Render service (HTTP byte protocol)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_render_server_roundtrip(tmp_path):
    service = RenderService(flame_model=flame.synthetic_flame_model(64),
                            video_dir=tmp_path, width=128)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        t = 5
        face = {
            "expression": byteify(np.zeros((t, 50), np.float32)),
            "pose": byteify(np.zeros((t, 12), np.float32)),
            "shape": byteify(np.zeros((t, 300), np.float32)),
            "rotation": byteify(np.zeros((t, 3), np.float32)),
        }
        payload = json.dumps({"seqs": [face, face], "fps": 25,
                              "file_name": "test.mp4"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert "url" in out
        video_path = out["url"].split(f":{port}/video/")[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/video/{video_path}",
                timeout=30) as resp:
            data = resp.read()
        assert len(data) > 500
    finally:
        server.shutdown()


@pytest.mark.slow
def test_render_client_embeds_video_url(tmp_path):
    """RenderClient posts, then fires on_rendered(step, url) so the training
    loop can embed the video in Comet/TensorBoard (mimicry_logger.py:102-112)."""
    from conftest import tiny_hparams
    from lets_face_it_tpu.train.render_client import RenderClient

    service = RenderService(flame_model=flame.synthetic_flame_model(64),
                            video_dir=tmp_path, width=96)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        hp = tiny_hparams()
        hp.dataset_root = str(tmp_path / "nonexistent")  # no standardization
        hp.Data["expression_dim"] = 50
        client = RenderClient(f"http://127.0.0.1:{port}", hp, timeout=120)
        seen = {}
        fired = threading.Event()

        def on_rendered(step, url):
            seen["step"], seen["url"] = step, url
            fired.set()

        client.on_rendered = on_rendered
        seq = np.zeros((2, 4, 56), np.float32)
        client(seq, seq, step=7)
        assert fired.wait(timeout=120), "on_rendered never fired"
        assert seen["step"] == 7
        assert "/video/" in seen["url"]
    finally:
        server.shutdown()


def test_rasterizer_textured_triangle():
    """UV-textured path: a half-green/half-blue texture mapped across a
    triangle must show both colors on the correct sides."""
    from lets_face_it_tpu.render.rasterizer import Rasterizer

    r = Rasterizer(width=128, height=128, x=64, y=64, z=0, f=(100.0, 100.0),
                   ambient=1.0, lights=[])
    verts, faces, _ = _triangle_scene()
    colors = np.ones((3, 3), np.float32)
    # u runs left->right across the triangle
    uvs = np.array([[[0.0, 0.5], [1.0, 0.5], [0.5, 0.5]]], np.float32)
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = (0, 255, 0)     # left half green
    tex[:, 4:] = (0, 0, 255)     # right half blue
    img = r.render([(verts, faces, colors)], uvs=[uvs], textures=[tex])[0]

    non_bg = (img != 255).any(axis=-1)
    assert non_bg.sum() > 100
    ys, xs = np.nonzero(non_bg)
    mid = (xs.min() + xs.max()) // 2
    left = img[non_bg & (np.arange(128)[None, :] < mid - 5)]
    right = img[non_bg & (np.arange(128)[None, :] > mid + 5)]
    assert left[:, 1].mean() > left[:, 2].mean(), "left side must be green"
    assert right[:, 2].mean() > right[:, 1].mean(), "right side must be blue"


def test_textured_double_face_video(tmp_path):
    """End-to-end textured dyadic rendering (render_tools.py:117-165):
    the textured render differs from the flat-color one and shows more
    within-face variation (the texture mottling)."""
    from lets_face_it_tpu.render.rasterizer import Rasterizer
    from lets_face_it_tpu.render.texture import (
        cylindrical_uv_layout,
        procedural_skin_texture,
    )

    model = flame.synthetic_flame_model(96)
    verts = np.asarray(flame.get_vertices(
        model, expression=jnp.zeros((2, 50)),
        pose=jnp.zeros((2, 12)), rotation=jnp.zeros((2, 3)),
        shape=jnp.zeros((2, 300))))

    r = Rasterizer(width=96, height=96, x=48, y=40, z=-1, f=(475.0, 475.0))
    flat = np.tile(np.array([[0.95, 0.78, 0.66]], np.float32),
                   (verts.shape[1], 1))
    img_flat = r.render([(verts, model.faces, flat)])[0]

    uv = cylindrical_uv_layout(verts[0], model.faces)
    tex = procedural_skin_texture("white", size=64, seed=0)
    ones = np.ones((verts.shape[1], 3), np.float32)
    img_tex = r.render([(verts, model.faces, ones)],
                       uvs=[uv], textures=[tex])[0]

    fg = (img_flat != 255).any(axis=-1) & (img_tex != 255).any(axis=-1)
    assert fg.sum() > 50
    assert not np.array_equal(img_tex[fg], img_flat[fg])

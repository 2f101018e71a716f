#!/usr/bin/env python
"""Render a dyadic avatar video from a FLAME parameter file — the rebuilt
reference example (/root/reference/code/examples/visualize_example.py), which
read sequences from the released ``flame_params.hdf5`` and POSTed them to the
render server.

Works in two modes:
  * --flame_params FILE.hdf5 : read expression/pose/rotation/shape sequences
    (the released dataset layout: /<session>/<participant>/{expression,pose,
    rotation,shape}) and render a chosen pair
  * no arguments: synthesize a smooth random sequence on a synthetic head
    (no licensed assets needed) — a self-contained smoke demo

    python examples/visualize_example.py [--flame_model FLAME.pkl]
        [--flame_params FILE.hdf5 --session S --p1 P1 --p2 P2]
        [--out example.mp4] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_sequence(n, rng):
    import numpy as np

    t = np.arange(n)[:, None]
    freqs = rng.uniform(0.01, 0.1, (1, 50))
    expression = 1.5 * np.sin(2 * np.pi * freqs * t).astype(np.float32)
    pose = np.zeros((n, 12), np.float32)
    pose[:, 3] = 0.15 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.11 * t[:, 0]))
    rotation = np.stack([
        0.2 * np.sin(2 * np.pi * 0.03 * t[:, 0]),
        0.3 * np.sin(2 * np.pi * 0.021 * t[:, 0]),
        np.zeros(n)], axis=1).astype(np.float32)
    shape = np.zeros((n, 300), np.float32)
    return expression, pose, rotation, shape


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--flame_model", default=None,
                        help="FLAME 2019 pkl/npz; synthetic head if omitted")
    parser.add_argument("--flame_params", default=None)
    parser.add_argument("--session", default=None)
    parser.add_argument("--p1", default="P1")
    parser.add_argument("--p2", default="P2")
    parser.add_argument("--frames", type=int, default=100)
    parser.add_argument("--out", default="example.mp4")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lets_face_it_tpu.render import flame
    from lets_face_it_tpu.render.video import render_double_face_video

    if args.flame_model:
        model = flame.load_flame(args.flame_model)
    else:
        print("no --flame_model: using a synthetic head")
        model = flame.synthetic_flame_model(512)

    import jax.numpy as jnp

    def get_verts(expression, pose, rotation, shape):
        return np.asarray(flame.get_vertices(
            model, jnp.asarray(expression), jnp.asarray(pose),
            jnp.asarray(rotation), shape=jnp.asarray(shape)))

    if args.flame_params:
        import h5py

        with h5py.File(args.flame_params, "r") as f:
            grp = f[args.session] if args.session else f[list(f)[0]]

            def load(p):
                g = grp[p]
                n = args.frames
                return (g["expression"][:n], g["pose"][:n],
                        g["rotation"][:n], g["shape"][:n])

            v1 = get_verts(*load(args.p1))
            v2 = get_verts(*load(args.p2))
    else:
        rng = np.random.default_rng(0)
        v1 = get_verts(*synth_sequence(args.frames, rng))
        v2 = get_verts(*synth_sequence(args.frames, rng))

    render_double_face_video(args.out, v1, v2, model.faces, fps=25,
                             skin_color_v1="white", skin_color_v2="black")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate facial-gesture sequences from a trained checkpoint.

    python generate.py --ckpt CKPT [--hparams H.yaml] [--dataset_root DIR]
        [--frames packed.npy] [--out generated.npy] [--eps 1.0] [--seed 0]
        [--cpu]

CKPT is an orbax checkpoint directory from train.py, or a PyTorch-Lightning
``.ckpt`` from the reference implementation (imported via
lets_face_it_tpu.sample.torch_import). ``--frames`` is a packed [T, 273]
matrix (see lets_face_it_tpu/sample/generate.py for the layout); without it a
random conditioning sequence is synthesized as a smoke path.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--frames", default=None)
    parser.add_argument("--out", default="generated.npy")
    parser.add_argument("--eps", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--seq_len", type=int, default=100,
                        help="length of the synthesized smoke sequence")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lets_face_it_tpu.sample import Generator
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    gen = Generator.from_checkpoint(args.ckpt, hparams_file=args.hparams,
                                    dataset_root=args.dataset_root)

    if args.frames:
        frames = np.load(args.frames)
    else:
        rng = np.random.default_rng(args.seed)
        frames = rng.standard_normal((args.seq_len, 273)).astype(np.float32)
        print(f"no --frames given; synthesized random conditioning "
              f"[{args.seq_len}, 273]")

    out = gen.generate(frames, eps=args.eps, seed=args.seed)
    np.save(args.out, out)
    print(f"generated {out.shape} -> {args.out} "
          f"(frames {out.shape[1]}, packed 106-D face layout)")


if __name__ == "__main__":
    main()

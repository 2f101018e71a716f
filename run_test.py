#!/usr/bin/env python
"""Evaluate a trained checkpoint on the test split (reference run_test.py,
with the bit-rotted test path fixed): NLL, free-running generation, and
per-modality mismatched probes, saved as .npz.

    python run_test.py --ckpt CKPT [--hparams H.yaml] [--dataset_root DIR]
        [--out results/test_results.npz] [--seq_len 100] [--cpu]
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True,
                        help="orbax checkpoint dir or Lightning .ckpt")
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--out", default="results/test_results.npz")
    parser.add_argument("--seq_len", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lets_face_it_tpu.sample import Generator
    from lets_face_it_tpu.train.evaluate import run_test, summarize
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    gen = Generator.from_checkpoint(args.ckpt, hparams_file=args.hparams,
                                    dataset_root=args.dataset_root,
                                    overrides=overrides)
    gen.hp.Test = {"seq_len": args.seq_len}
    results = run_test(gen.hp, gen.params, output_file=args.out,
                       seed=args.seed, max_batches=args.max_batches)
    print(f"saved {len(results)} batch results -> {args.out}")
    for k, v in summarize(results).items():
        print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Train the interlocutor-aware facial-gesture flow.

Usage (matches the reference CLI, /root/reference/code/glow_pytorch/train.py):

    python train.py hparams/final_model.yaml [--dataset_root DIR]
        [--max_steps N] [--cpu] [--seed N] [--log_dir DIR] [--ckpt_dir DIR]
        [--synthetic-data]   # generate a synthetic fixture first (smoke runs)

Unmodified reference hparams YAMLs are accepted. Training is data-parallel
over every visible device (a ``jax.sharding.Mesh`` over TPU chips; gradients
all-reduce over ICI).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("hparams_file")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (e.g. smoke tests)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--precision", type=int, default=None,
                        choices=(16, 32),
                        help="override the hparams precision: 32 = f32 "
                             "parity matmuls, 16 = bf16-multiply production "
                             "mode (~2.4x train throughput)")
    parser.add_argument("--wire_dtype", default=None, choices=("f32", "bf16"),
                        help="host->device batch wire format: bf16 halves "
                             "the per-step upload (values upcast to f32 on "
                             "device, rounded to the bf16 grid) — pair with "
                             "--precision 16 on remote-TPU transports")
    parser.add_argument("--steps_per_dispatch", type=int, default=None,
                        help="fuse k optimizer steps into one compiled "
                             "dispatch (lax.scan over on-device batch "
                             "gathers); pins end-to-end throughput to "
                             "device speed on jittery transports. Needs "
                             "the device data cache")
    parser.add_argument("--synthetic-data", action="store_true",
                        help="write a synthetic fixture into dataset_root first")
    parser.add_argument("--resume_from", default=None,
                        help="checkpoint dir to resume training from")
    parser.add_argument("--stall_timeout_s", type=float, default=None,
                        help="exit with code 17 when no training progress "
                             "for this many seconds (the remote-TPU tunnel "
                             "can hang a dispatch forever) so a supervisor "
                             "can relaunch with --resume_from; arms after "
                             "the first step, so the initial compile never "
                             "trips it. Size it above a validation pass.")
    parser.add_argument("--render_url", default=None,
                        help="render-service URL for validation videos "
                             "(e.g. http://localhost:8000)")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of the first "
                             "training steps into this directory")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the reference's "
                             "terminate_on_nan/print_nan_grads role)")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    overrides = {}
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.max_epochs is not None:
        overrides["max_epochs"] = args.max_epochs
    if args.precision is not None:
        overrides["precision"] = args.precision
    if args.wire_dtype is not None:
        overrides["wire_dtype"] = args.wire_dtype
    if args.stall_timeout_s is not None:
        overrides["stall_timeout_s"] = args.stall_timeout_s
    if args.steps_per_dispatch is not None:
        overrides["steps_per_dispatch"] = args.steps_per_dispatch
    hp = load_hparams(args.hparams_file, dataset_root=args.dataset_root,
                      overrides=overrides)

    # precision: 32 (reference parity) -> full-f32 matmuls; 16 -> TPU-native
    # bf16-multiply/f32-accumulate matmuls (~2x train throughput)
    if int(getattr(hp, "precision", 32) or 32) >= 32:
        jax.config.update("jax_default_matmul_precision", "highest")
    if args.debug_nans or getattr(hp, "terminate_on_nan", False):
        jax.config.update("jax_debug_nans", True)

    if args.synthetic_data:
        from lets_face_it_tpu.data.synthetic import write_synthetic_dataset

        target = Path(hp.dataset_root) / hp.Data["file_name"]
        if not target.exists():
            print(f"writing synthetic fixture to {target}")
            write_synthetic_dataset(target, seed=args.seed)

    run_name = Path(args.hparams_file).stem
    log_dir = args.log_dir or f"runs/{run_name}"
    ckpt_dir = args.ckpt_dir or f"checkpoints/{run_name}"

    if args.resume_from:
        hp.resume_from_checkpoint = args.resume_from

    render_client = None
    if args.render_url and hp.Validation.get("render", False):
        from lets_face_it_tpu.train.render_client import RenderClient

        render_client = RenderClient(args.render_url, hp)

    from lets_face_it_tpu.train.loop import train

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        state, best_val = train(hp, seed=args.seed, log_dir=log_dir,
                                ckpt_dir=ckpt_dir, max_steps=args.max_steps,
                                render_client=render_client)
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
    print(f"training done; best val_loss = {best_val:.4f}")


if __name__ == "__main__":
    main()

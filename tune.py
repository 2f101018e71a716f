#!/usr/bin/env python
"""Hyperparameter search (reference hparams_tuning.py without the Optuna
dependency): random search over the space registered for the config's stem in
``hparam_tuning_configs``, each trial trained in a subprocess with OOM batch
halving and loss/jerk pruning.

    python tune.py hparams/smoke_cpu.yaml -n 10 [--dataset_root DIR]
        [--max_steps N] [--cpu] [--study_dir tuning_studies] [--workers K]

``--workers K`` runs K worker processes against the same flock-guarded JSON
study (the reference's Optuna-RDB concurrency, config.toml:30-31): each
worker runs ``-n`` trials with its own sampler seed, observing the others'
completed values before proposing — K*n trials total. Workers on one host
share the accelerator, so multi-worker runs suit --cpu searches or
smoke-scale trials; the store is also safe for workers started on several
hosts over a shared filesystem.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _run_worker(hparams_file, dataset_root, n_trials, max_steps, seed,
                study_dir, cpu, sampler, use_subprocess):
    if cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hparam_tuning_configs import hparam_configs
    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.train.tuning import Study
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    conf_name = Path(hparams_file).stem
    if conf_name not in hparam_configs:
        raise SystemExit(f"no search space registered for {conf_name!r}; "
                         f"known: {sorted(hparam_configs)}")
    space_fn = hparam_configs[conf_name].hparam_options

    hp = load_hparams(hparams_file, dataset_root=dataset_root)
    study = Study(conf_name, study_dir)
    study.optimize(hp, space_fn, n_trials=n_trials, max_steps=max_steps,
                   seed=seed, use_subprocess=use_subprocess, sampler=sampler)
    return study


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("hparams_file")
    parser.add_argument("-n", "--n_trials", type=int, default=10)
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--study_dir", default="tuning_studies")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--sampler", choices=["tpe", "random"],
                        default="tpe")
    parser.add_argument("--workers", type=int, default=1,
                        help="concurrent worker processes sharing the study")
    parser.add_argument("--no-subprocess", action="store_true",
                        help="run trials in-process (debugging)")
    args = parser.parse_args()

    worker_args = lambda seed: (  # noqa: E731
        args.hparams_file, args.dataset_root, args.n_trials, args.max_steps,
        seed, args.study_dir, args.cpu, args.sampler, not args.no_subprocess)

    if args.workers > 1:
        import multiprocessing

        ctx = multiprocessing.get_context("spawn")
        procs = [ctx.Process(target=_run_worker,
                             args=worker_args(args.seed + 1009 * i))
                 for i in range(args.workers)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        if any(p.exitcode != 0 for p in procs):
            raise SystemExit("one or more tuning workers failed")
        from lets_face_it_tpu.train.tuning import Study

        study = Study(Path(args.hparams_file).stem, args.study_dir)
    else:
        study = _run_worker(*worker_args(args.seed))
    best = study.best_trial

    print(f"finished trials: {len(study.trials)}")
    if best:
        print(f"best trial #{best['number']}: val_loss={best['value']:.4f}")
        for k, v in best["params"].items():
            print(f"    {k}: {v}")
    else:
        print("no completed trials")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Hyperparameter search (reference hparams_tuning.py without the Optuna
dependency): random search over the space registered for the config's stem in
``hparam_tuning_configs``, each trial trained in a subprocess with OOM batch
halving and loss/jerk pruning.

    python tune.py hparams/smoke_cpu.yaml -n 10 [--dataset_root DIR]
        [--max_steps N] [--cpu] [--study_dir tuning_studies]
"""

from __future__ import annotations

import argparse
from pathlib import Path


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
    parser.add_argument("--no-subprocess", action="store_true",
                        help="run trials in-process (debugging)")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hparam_tuning_configs import hparam_configs
    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.train.tuning import Study

    conf_name = Path(args.hparams_file).stem
    if conf_name not in hparam_configs:
        raise SystemExit(f"no search space registered for {conf_name!r}; "
                         f"known: {sorted(hparam_configs)}")
    space_fn = hparam_configs[conf_name].hparam_options

    hp = load_hparams(args.hparams_file, dataset_root=args.dataset_root)
    study = Study(conf_name, args.study_dir)
    best = study.optimize(hp, space_fn, n_trials=args.n_trials,
                          max_steps=args.max_steps, seed=args.seed,
                          use_subprocess=not args.no_subprocess,
                          sampler=args.sampler)

    print(f"finished trials: {len(study.trials)}")
    if best:
        print(f"best trial #{best['number']}: val_loss={best['value']:.4f}")
        for k, v in best["params"].items():
            print(f"    {k}: {v}")
    else:
        print("no completed trials")


if __name__ == "__main__":
    main()

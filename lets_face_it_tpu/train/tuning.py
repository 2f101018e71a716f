"""Hyperparameter search harness (the reference's Optuna machinery,
hparams_tuning.py, rebuilt without the Optuna dependency — it isn't in the
TPU image).

Kept semantics:
  * the same ``trial.suggest_*`` search-space API, so search-space configs
    read like the reference's ``hparam_tuning_configs`` modules
  * every trial runs training in a **subprocess** and on accelerator OOM the
    batch size is halved and the trial retried, failing below 2
    (hparams_tuning.py:189-209)
  * pruning guards: train loss > 0 after 20 steps, generated jerk > 10 at
    validation, val_loss > 0 (hparams_tuning.py:45-98)
  * early stopping on val_loss with patience 2
  * study state (all trials + best) persisted as JSON, resumable

Sampling defaults to a from-scratch univariate TPE (train/samplers.py) —
the same estimator family as the reference's Optuna default — with
``sampler="random"`` available for plain random search.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import multiprocessing
import os
import random
import traceback
from pathlib import Path

from lets_face_it_tpu.train.samplers import make_sampler


class TrialPruned(Exception):
    pass


class FailedTrial(Exception):
    pass


class Trial:
    """Optuna-compatible suggest API; values come from the study's sampler."""

    def __init__(self, number: int, sampler):
        self.number = number
        self.sampler = sampler
        self.rng = sampler.rng_for_trial(number)
        self.params: dict = {}
        self.user_attrs: dict = {}

    def _suggest(self, name, kind, **meta):
        value = self.sampler.suggest(self.rng, name, kind, meta)
        self.params[name] = value
        return value

    def suggest_categorical(self, name, choices):
        return self._suggest(name, "categorical", choices=list(choices))

    def suggest_uniform(self, name, low, high):
        return self._suggest(name, "uniform", low=low, high=high)

    def suggest_float(self, name, low, high, *, log=False):
        if log:
            return self.suggest_loguniform(name, low, high)
        return self.suggest_uniform(name, low, high)

    def suggest_loguniform(self, name, low, high):
        return self._suggest(name, "loguniform", low=low, high=high)

    def suggest_int(self, name, low, high):
        return self._suggest(name, "int", low=low, high=high)

    def set_user_attr(self, key, value):
        self.user_attrs[key] = value


def _pruning_hooks():
    from lets_face_it_tpu.model import seqglow
    from lets_face_it_tpu.train.metrics import calc_jerk

    import jax
    import jax.numpy as jnp

    state = {"best": float("inf"), "wait": 0}

    def step_hook(step, metrics):
        if step > 20 and metrics["train_loss"] > 0:
            raise TrialPruned(f"loss > 0 at step {step}")

    def val_hook(step, val_loss, hp, spec, params, val_ds):
        batch = next(val_ds.epoch_batches(min(hp.batch_size, 16),
                                          shuffle=False))
        data = {k: jnp.asarray(v) for k, v in batch.items()}
        gen = seqglow.sequence_sample_jit(
            spec, params, data, hp.Validation["seq_len"],
            eps_std=float(hp.Infer["eps"]), rng=jax.random.PRNGKey(step))
        jerk = float(calc_jerk(gen))
        if jerk > 10 and step > 20:
            raise TrialPruned(f"generated jerk {jerk:.2f} > 10")
        if val_loss > 0:
            raise TrialPruned(f"val_loss {val_loss:.2f} > 0")
        if val_loss < state["best"]:
            state["best"] = val_loss
            state["wait"] = 0
        else:
            state["wait"] += 1
            if state["wait"] >= 2:
                raise StopIteration("early stop: patience exceeded")

    return step_hook, val_hook


def _run_trial(hp_dict, batch_size, max_steps, seed, return_dict):
    """Subprocess body: run training with pruning hooks."""
    try:
        from lets_face_it_tpu.hparams import HParams
        from lets_face_it_tpu.train.loop import train
        from lets_face_it_tpu.utils.compile_cache import (
            enable_persistent_compile_cache)

        # spawn subprocesses share compiled executables across trials
        # (shapes repeat whenever the search space keeps dims fixed)
        enable_persistent_compile_cache()
        hp = HParams(**hp_dict)
        hp.batch_size = batch_size
        step_hook, val_hook = _pruning_hooks()
        _state, best_val = train(hp, seed=seed, log_dir=None, ckpt_dir=None,
                                 max_steps=max_steps, verbose=True,
                                 step_hook=step_hook, val_hook=val_hook)
        return_dict["val_loss"] = float(best_val)
    except TrialPruned as exc:
        return_dict["pruned"] = str(exc)
    except StopIteration as exc:
        return_dict["early_stop"] = str(exc)
    except Exception as exc:  # noqa: BLE001
        msg = f"{type(exc).__name__}: {exc}"
        if "RESOURCE_EXHAUSTED" in str(exc) or "out of memory" in str(exc).lower():
            return_dict["OOM"] = True
        else:
            return_dict["error"] = msg
            return_dict["traceback"] = traceback.format_exc()[-3000:]


class Study:
    """JSON-file-backed study: trials, best value, resumable, and safe for
    N concurrent worker processes (the reference's Optuna-RDB role,
    config.toml:30-31).

    Concurrency semantics: every read-modify-write of the store happens
    under an exclusive ``flock`` on a sibling ``.lock`` file, and the JSON
    is replaced atomically (`os.replace` of a per-process temp file), so
    workers on the same filesystem never tear or lose records. A worker
    snapshots the store under the lock, samples its proposal OUTSIDE the
    lock (with other workers' running trials as constant-liar
    pseudo-observations, so identical posteriors don't collide on the same
    point), claims its trial number by appending a ``running`` record under
    the lock, trains, then re-reads and fills in its record. Before
    sampling each new trial a worker re-reads the store and feeds every
    *other* worker's completed values to its sampler, so TPE posteriors
    sharpen across the fleet. ``optimize(n_trials=N)`` runs N
    trials in the calling worker — launch K workers for K*N total.
    """

    def __init__(self, name: str, storage_dir="tuning_studies"):
        self.name = name
        self.path = Path(storage_dir) / f"{name}.json"
        self.trials: list[dict] = []
        self._reload()

    @contextlib.contextmanager
    def _locked(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path.with_suffix(".lock"), "w") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)

    def _reload(self):
        if self.path.exists():
            self.trials = json.loads(self.path.read_text())["trials"]

    def _save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_name(f".{self.path.name}.{os.getpid()}.tmp")
        tmp.write_text(json.dumps(
            {"name": self.name, "trials": self.trials,
             "best": self.best_trial}, indent=2))
        os.replace(tmp, self.path)

    @property
    def best_trial(self):
        done = [t for t in self.trials if t.get("value") is not None]
        return min(done, key=lambda t: t["value"]) if done else None

    def optimize(self, base_hparams, space_fn, *, n_trials: int,
                 max_steps: int | None = None, seed: int = 0,
                 use_subprocess: bool = True, sampler="tpe"):
        """space_fn(hparams, trial) -> hparams (mutated), like the reference's
        ``hparam_options`` modules. ``sampler``: "tpe" (default, like the
        reference's Optuna), "random", or a sampler instance."""
        from lets_face_it_tpu.hparams import HParams, validate_hparams

        sampler = make_sampler(sampler, seed)
        observed: set[int] = set()

        def observe_completed():
            """Feed every completed trial not yet seen (resumed, or run by a
            concurrent worker) into this worker's sampler."""
            for t in self.trials:
                if t.get("value") is not None and t["number"] not in observed:
                    sampler.observe(t["params"], t["value"])
                    observed.add(t["number"])

        for local_idx in range(n_trials):
            # snapshot the store under a short lock
            with self._locked():
                self._reload()
                observe_completed()
                running_params = [t["params"] for t in self.trials
                                  if t.get("state") == "running"]
                provisional = len(self.trials)

            # Propose OUTSIDE the lock — TPE candidate scoring is
            # O(history^2), and holding the exclusive flock here would
            # serialize every worker's claim. Other workers' in-flight
            # (running) trials enter the sampler as constant-liar
            # pseudo-observations (pessimistic: the worst completed value,
            # Optuna's TPESampler(constant_liar=True) convention) so
            # concurrent workers with identical posteriors don't propose
            # duplicate points; the lies are dropped after the proposal.
            history = getattr(sampler, "history", None)
            n_real = len(history) if history is not None else 0
            if history is not None and running_params:
                liar = max((v for _, v in history), default=None)
                if liar is not None:
                    for p in running_params:
                        sampler.observe(p, liar)
            trial = Trial(provisional, sampler)
            # Two workers proposing concurrently see the same provisional
            # number; mix in the pid so their candidate draws differ even
            # before any liar observations exist.
            trial.rng = random.Random(
                hash((sampler.seed, provisional, os.getpid(), local_idx)))
            hp = HParams(**json.loads(json.dumps(base_hparams.to_dict(),
                                                 default=str)))
            hp = space_fn(hp, trial)
            if history is not None:
                del history[n_real:]
            invalid = None
            try:
                validate_hparams(hp)
            except AssertionError as exc:
                invalid = str(exc)

            # claim a trial number: append the record under the lock
            # (append-only and cheap — other workers may have appended
            # since the snapshot, so the number is re-derived here)
            with self._locked():
                self._reload()
                number = len(self.trials)
                record = {"number": number, "params": trial.params,
                          "value": None, "state": "running",
                          "user_attrs": trial.user_attrs}
                if invalid is not None:
                    record.update(state="invalid", note=invalid)
                self.trials.append(record)
                self._save()
            if invalid is not None:
                continue

            batch_size = hp.batch_size
            while batch_size >= 2:
                result = self._execute(hp, batch_size, max_steps,
                                       seed + number, use_subprocess)
                if result.get("OOM"):
                    batch_size //= 2
                    continue
                break
            else:
                result = None

            # fill in the claimed record (other workers may have appended
            # records meanwhile — find ours by number after a fresh read)
            with self._locked():
                self._reload()
                record = next(t for t in self.trials
                              if t["number"] == number)
                if result is None:
                    record.update(state="failed",
                                  note="batch size < 2 after OOM")
                else:
                    record["user_attrs"]["batch_size"] = batch_size
                    if "val_loss" in result:
                        record.update(value=result["val_loss"],
                                      state="complete")
                    elif "pruned" in result:
                        record.update(state="pruned", note=result["pruned"])
                    elif "early_stop" in result:
                        record.update(state="complete",
                                      note=result["early_stop"])
                    else:
                        record.update(state="failed",
                                      note=result.get("error", "unknown"),
                                      traceback=result.get("traceback"))
                self._save()
            if result and "val_loss" in result:
                sampler.observe(trial.params, result["val_loss"])
                observed.add(number)
        with self._locked():
            self._reload()
        return self.best_trial

    @staticmethod
    def _execute(hp, batch_size, max_steps, seed, use_subprocess) -> dict:
        if use_subprocess:
            ctx = multiprocessing.get_context("spawn")
            manager = ctx.Manager()
            ret = manager.dict()
            p = ctx.Process(target=_run_trial,
                            args=(hp.to_dict(), batch_size, max_steps, seed,
                                  ret))
            p.start()
            p.join()
            if p.exitcode != 0 and not ret:
                return {"error": f"trial subprocess died (exit {p.exitcode})"}
            return dict(ret)
        ret: dict = {}
        _run_trial(hp.to_dict(), batch_size, max_steps, seed, ret)
        return ret

"""Hyperparameter-search harness tests: sampler quality, suggest API,
OOM-halving and study bookkeeping (reference hparams_tuning.py:112-209)."""

import math

import pytest

from lets_face_it_tpu.train.samplers import RandomSampler, TPESampler
from lets_face_it_tpu.train.tuning import Study, Trial


def _objective(params):
    """Seeded synthetic objective with a numeric optimum at x=0.7,
    lr=1e-3 and a preferred category 'b'."""
    return ((params["x"] - 0.7) ** 2
            + 0.1 * (math.log10(params["lr"]) + 3.0) ** 2
            + (0.0 if params["cat"] == "b" else 0.3)
            + 0.05 * (params["k"] - 12) ** 2 / 64.0)


def _run_sampler(sampler, n_trials=60):
    best = math.inf
    for number in range(n_trials):
        trial = Trial(number, sampler)
        params = {
            "x": trial.suggest_uniform("x", 0.0, 1.0),
            "lr": trial.suggest_loguniform("lr", 1e-5, 1e-1),
            "cat": trial.suggest_categorical("cat", ["a", "b", "c"]),
            "k": trial.suggest_int("k", 4, 20),
        }
        value = _objective(params)
        sampler.observe(params, value)
        best = min(best, value)
    return best


def test_tpe_beats_random_on_synthetic_objective():
    best_tpe = _run_sampler(TPESampler(seed=0))
    best_rand = _run_sampler(RandomSampler(seed=0))
    assert best_tpe < best_rand, (best_tpe, best_rand)
    assert best_tpe < 0.02, f"TPE failed to localize the optimum: {best_tpe}"


def test_tpe_beats_random_across_seeds():
    """Not a fluke of one seed: TPE wins the majority and on average."""
    tpe = [_run_sampler(TPESampler(seed=s)) for s in range(5)]
    rand = [_run_sampler(RandomSampler(seed=s)) for s in range(5)]
    wins = sum(t < r for t, r in zip(tpe, rand))
    assert wins >= 4, list(zip(tpe, rand))
    assert sum(tpe) < sum(rand)


def test_suggest_api_records_params_and_respects_bounds():
    trial = Trial(0, RandomSampler(seed=1))
    x = trial.suggest_float("x", 2.0, 3.0)
    lr = trial.suggest_float("lr", 1e-4, 1e-2, log=True)
    k = trial.suggest_int("k", 5, 9)
    c = trial.suggest_categorical("c", ("u", "v"))
    assert 2.0 <= x <= 3.0
    assert 1e-4 <= lr <= 1e-2
    assert 5 <= k <= 9 and isinstance(k, int)
    assert c in ("u", "v")
    assert set(trial.params) == {"x", "lr", "k", "c"}


def test_tpe_int_suggestions_stay_integral_after_startup():
    sampler = TPESampler(seed=2, n_startup=4)
    for number in range(20):
        trial = Trial(number, sampler)
        k = trial.suggest_int("k", 4, 20)
        assert isinstance(k, int) and 4 <= k <= 20
        sampler.observe(trial.params, (k - 12) ** 2)


def test_study_oom_halving_and_persistence(tmp_path, hp, monkeypatch):
    """Trials that OOM retry with halved batch size (hparams_tuning.py:
    189-209); completed values feed the sampler and persist to JSON."""
    calls = []

    def fake_execute(hp_trial, batch_size, max_steps, seed, use_subprocess):
        calls.append(batch_size)
        if batch_size > 2:
            return {"OOM": True}
        return {"val_loss": float(hp_trial.lr)}

    monkeypatch.setattr(Study, "_execute", staticmethod(fake_execute))

    def space(h, trial):
        h.lr = trial.suggest_loguniform("lr", 1e-5, 1e-1)
        return h

    hp.batch_size = 8
    study = Study("test_study", storage_dir=tmp_path)
    best = study.optimize(hp, space, n_trials=3, seed=0,
                          use_subprocess=False, sampler="tpe")
    assert calls[:3] == [8, 4, 2]            # halved until it fits
    assert best is not None and best["value"] > 0
    assert all(t["user_attrs"]["batch_size"] == 2 for t in study.trials)

    # resumable: a new Study picks up the persisted trials
    study2 = Study("test_study", storage_dir=tmp_path)
    assert len(study2.trials) == 3
    assert study2.best_trial["number"] == best["number"]

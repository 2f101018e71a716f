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


def test_constant_liar_feeds_running_trials(tmp_path, hp, monkeypatch):
    """While proposing, other workers' running trials enter the sampler as
    pessimistic pseudo-observations (so identical posteriors don't collide),
    and the lies are dropped again after the proposal."""
    seen_hist = []

    def fake_execute(hp_trial, batch_size, max_steps, seed, use_subprocess):
        return {"val_loss": 1.0}

    monkeypatch.setattr(Study, "_execute", staticmethod(fake_execute))
    study = Study("liar", storage_dir=tmp_path)
    study.trials = [
        {"number": 0, "params": {"lr": 0.5}, "value": 2.0,
         "state": "complete", "user_attrs": {}},
        {"number": 1, "params": {"lr": 0.9}, "value": None,
         "state": "running", "user_attrs": {}},
    ]
    study._save()
    sampler = TPESampler(seed=0)

    def space(h, trial):
        seen_hist.append([v for _, v in trial.sampler.history])
        h.lr = trial.suggest_uniform("lr", 0.0, 1.0)
        return h

    study.optimize(hp, space, n_trials=1, seed=0, use_subprocess=False,
                   sampler=sampler)
    # the running trial appeared as a worst-value liar during the proposal...
    assert seen_hist == [[2.0, 2.0]]
    # ...and only real completed values remain afterwards
    assert [v for _, v in sampler.history] == [2.0, 1.0]


def test_concurrent_workers_share_study(tmp_path, hp):
    """Two worker processes drive the same flock-guarded JSON study
    (the reference's Optuna-RDB concurrency, config.toml:30-31): trial
    numbers stay unique, no record is lost to a torn write, and both
    workers' completed values land in one consistent store."""
    import json as js
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    hp.batch_size = 4
    hp_file = tmp_path / "hp.json"
    hp_file.write_text(js.dumps(hp.to_dict(), default=str))

    script = f"""
import json, sys, time
sys.path.insert(0, {str(repo)!r})
from lets_face_it_tpu.hparams import HParams
from lets_face_it_tpu.train.tuning import Study

idx = int(sys.argv[1])

def fake_execute(hp, batch_size, max_steps, seed, use_subprocess):
    time.sleep(0.1)   # force interleaving between the two workers
    return {{"val_loss": float((hp.lr - 0.003) ** 2)}}

Study._execute = staticmethod(fake_execute)

def space(h, trial):
    h.lr = trial.suggest_uniform("lr", 0.0, 0.01)
    return h

hp = HParams(**json.loads(open({str(hp_file)!r}).read()))
study = Study("cstudy", {str(tmp_path)!r})
study.optimize(hp, space, n_trials=3, seed=1009 * idx,
               use_subprocess=False, sampler="tpe")
"""
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)])
             for i in (0, 1)]
    for p in procs:
        assert p.wait(timeout=300) == 0

    study = Study("cstudy", tmp_path)
    assert len(study.trials) == 6
    assert sorted(t["number"] for t in study.trials) == list(range(6))
    assert all(t["state"] == "complete" for t in study.trials)
    assert study.best_trial is not None
    assert all(0.0 <= t["params"]["lr"] <= 0.01 for t in study.trials)

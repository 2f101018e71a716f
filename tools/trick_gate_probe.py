"""Diagnose the negative-NLL trick's post-optimum val collapse (VERDICT r4
item 3).

runs/ablation_table1.json shows final_model's val NLL turning hard after its
step-600 optimum (−5544 → −3479 by step 900 — a 2,000-nat regression). The
hypothesis under test: the trick's gate (reference lets_face_it_glow.py:38-53;
train/state.py:85) fires iff ``last_mismatched_nll > 0`` where ``last`` is set
to ``-deranged_nll`` after each fire — i.e. the gate only closes once a
deranged batch's NLL reaches ≥ 0 *in absolute terms*. On any corpus the model
fits well (this fixture: NLL ≈ −5000 bits; the paper's real corpus: LL ≈ +400
⇒ NLL < 0 too) that never happens, so ~10% of steps keep doing gradient
*ascent* on mismatched conditioning forever, and once the model is converged
those ascent steps destabilize it.

This probe trains final_model on the ablation fixture exactly like
tools/ablation_table1.py (b64, bf16, StepLR 300) but with its own step loop so
EVERY step's gate state is captured: the deranged flag, the step NLL (which IS
the deranged NLL on fired steps), and the gate variable ``last_mismatched_nll``.
Output ``runs/trick_gate_probe.json``:

  windows:     per-100-step {fire_rate, deranged NLL min/max, gate_open}
  validations: (step, val_loss, gap_p2) — the collapse curve
  summary:     fired fraction, whether ANY deranged NLL ever reached ≥ 0,
               best-val step, and the post-optimum val regression

``tests/test_trick_gate.py`` pins the gate semantics at the unit level and
the artifact's conclusions; PARITY.md documents the mechanism and the
early-stop guidance (the reference monitors val_loss with save_top_k for
exactly this reason, hparams_tuning.py:144-146).

Usage:
    python tools/trick_gate_probe.py [--cpu] [--max_steps 900]
        [--dataset_root /tmp/lfi_ablation] [--out runs/trick_gate_probe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GAP_KEY = "mismatched_nll/shuffled_batch/p2"
WINDOW = 100


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--max_steps", type=int, default=900)
    p.add_argument("--val_every", type=int, default=100)
    p.add_argument("--dataset_root", default="/tmp/lfi_ablation")
    p.add_argument("--out", default=str(REPO / "runs" /
                                        "trick_gate_probe.json"))
    args = p.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lets_face_it_tpu.data.synthetic import write_synthetic_dataset
    from lets_face_it_tpu.data.windows import WindowDataset
    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.model import FlowSpec, seqglow
    from lets_face_it_tpu.train import metrics as tm
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    data_file = Path(args.dataset_root) / "lets_face_it.h5"
    if not data_file.exists():
        print(f"writing synthetic fixture to {data_file}")
        write_synthetic_dataset(data_file, seed=1234)

    # same setup as tools/ablation_table1.py's final_model run
    hp = load_hparams(str(REPO / "hparams" / "final_model.yaml"),
                      dataset_root=args.dataset_root)
    hp.batch_size = 64
    hp.precision = 16
    hp.Optim["Schedule"]["args"]["step"]["step_size"] = 300
    spec = FlowSpec.build(hp)

    train_ds = WindowDataset(data_file, "train", hp.Data, hp.Conditioning,
                             hp.Train["seq_len"])
    val_ds = WindowDataset(data_file, "val", hp.Data, hp.Conditioning,
                           hp.Validation["seq_len"])
    steps_per_epoch = max(train_ds.num_batches(hp.batch_size,
                                               drop_last=True), 1)
    optimizer = build_optimizer(hp, steps_per_epoch)
    state = train_state.init_train_state(jax.random.PRNGKey(1234), spec,
                                         optimizer)
    step_fn = train_state.make_train_step(spec, hp, optimizer)

    def endless_batches():
        epoch = 0
        while True:
            rng = np.random.default_rng([1234, epoch])
            yield from train_ds.epoch_batches(hp.batch_size, rng=rng,
                                              shuffle=True, drop_last=True)
            epoch += 1

    val_batch = next(val_ds.epoch_batches(hp.batch_size, shuffle=False))
    val_jb = {k: jnp.asarray(v) for k, v in val_batch.items()}

    def validate(step_i, params):
        _, vloss, _ = seqglow.sequence_nll_jit(spec, params, val_jb)
        probes = tm.wrong_context_probes(spec, params, val_jb, vloss,
                                         hp.Mismatch,
                                         jax.random.PRNGKey(step_i))
        return float(vloss), float(probes[GAP_KEY])

    per_step = []          # (deranged flag, nll, gate_open_before_step)
    validations = []
    t0 = time.time()
    batches = endless_batches()
    for i in range(args.max_steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        if i == 0:
            state = train_state.run_actnorm_init(spec, state, batch)
        gate_open = float(jax.device_get(state.last_mismatched_nll)) > 0
        state, m = step_fn(state, batch)
        m = {k: float(v) for k, v in jax.device_get(m).items()}
        per_step.append((m["deranged"], m["nll"], gate_open))
        if (i + 1) % args.val_every == 0:
            vloss, gap = validate(i + 1, state.params)
            validations.append({"step": i + 1, "val_loss": round(vloss, 2),
                                "gap_p2": round(gap, 3)})
            print(f"step {i + 1}: val {vloss:.1f} gap {gap:+.2f} "
                  f"fire_rate(last {WINDOW}) "
                  f"{np.mean([d for d, _, _ in per_step[-WINDOW:]]):.3f}",
                  flush=True)

    windows = []
    for w0 in range(0, len(per_step), WINDOW):
        chunk = per_step[w0:w0 + WINDOW]
        dnlls = [nll for d, nll, _ in chunk if d > 0]
        windows.append({
            "steps": [w0 + 1, w0 + len(chunk)],
            "fire_rate": round(float(np.mean([d for d, _, _ in chunk])), 3),
            "gate_open_frac": round(float(np.mean(
                [g for _, _, g in chunk])), 3),
            "deranged_nll_min": round(min(dnlls), 1) if dnlls else None,
            "deranged_nll_max": round(max(dnlls), 1) if dnlls else None,
        })

    dnlls_all = [nll for d, nll, _ in per_step if d > 0]
    best = min(validations, key=lambda r: r["val_loss"])
    last = validations[-1]
    summary = {
        "total_steps": len(per_step),
        "fired_steps": int(sum(d for d, _, _ in per_step)),
        "fire_rate": round(float(np.mean([d for d, _, _ in per_step])), 4),
        "gate_ever_closed": bool(any(not g for _, _, g in per_step)),
        "any_deranged_nll_nonnegative": bool(dnlls_all
                                             and max(dnlls_all) >= 0),
        "deranged_nll_range": ([round(min(dnlls_all), 1),
                                round(max(dnlls_all), 1)]
                               if dnlls_all else None),
        "best_val": best,
        "final_val": last,
        "post_optimum_regression_nats": round(
            last["val_loss"] - best["val_loss"], 1),
    }
    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "config": "final_model",
           "batch_size": 64, "precision": "bf16",
           "fixture": "small synthetic (planted mimicry lag 8)",
           "wall_s": round(time.time() - t0, 1),
           "summary": summary, "validations": validations,
           "windows": windows}
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {out_path}")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

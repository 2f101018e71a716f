"""Reproduce the paper's Table-1 behavioral signatures across the ablations
(round-4 VERDICT item 2).

The paper's sharpest falsifiable prediction (Table 1, BASELINE.md rows
19-23): the proposed model's likelihood collapses when the interlocutor is
deranged (400.51 matched vs 235.22 mismatched), while the `no_nll_trick`
ablation trains to a similar matched likelihood but its matched-vs-deranged
gap vanishes (386.98 vs 386.54). In this framework's logged convention the
gap is ``mismatched_nll/shuffled_batch/p2`` = matched − deranged NLL, so
"listening" shows up strongly NEGATIVE.

This tool trains final_model + the three ablation configs to their val-loss
optimum on the small planted-mimicry synthetic fixture (the regime where
the mimicry is learnable inside the conditioning window — round-3 README)
with the round-3-measured schedule adjustments (StepLR step_size 300
epochs: the stock 3-epoch decay collapses the lr after ~20 steps on
tiny-epoch fixtures), captures (step, val_loss, gap) at every validation,
and records the gap at each config's best-val step in
``runs/ablation_table1.json``. ``tests/test_ablation_table1.py`` pins the
Table-1 signature from that artifact.

Reference: lets_face_it_glow.py:39-54 (the negative-NLL trick),
mimicry_logger.py:199-238 (the derangement probes).

Usage:
    python tools/ablation_table1.py [--cpu] [--max_steps 900]
        [--configs final_model,no_speech,no_face,no_nll_trick]
        [--dataset_root /tmp/lfi_ablation] [--out runs/ablation_table1.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ALL_CONFIGS = ("final_model", "no_speech", "no_face", "no_nll_trick")
GAP_KEY = "mismatched_nll/shuffled_batch/p2"


def run_config(name: str, dataset_root: str, max_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.model import seqglow
    from lets_face_it_tpu.train import metrics as tm
    from lets_face_it_tpu.train.loop import train

    hp = load_hparams(str(REPO / "hparams" / f"{name}.yaml"),
                      dataset_root=dataset_root)
    hp.batch_size = 64
    hp.precision = 16                 # production bf16 mode (round-3 run)
    hp.max_epochs = 100000            # bounded by max_steps
    hp.check_val_every_n_epoch = 20
    hp.Optim["Schedule"]["args"]["step"]["step_size"] = 300
    # skip free-run sampling + invertibility at validation: the gap probes
    # are the quantity under test and the extra compiles dominate wall time
    hp.Validation["inference"] = False
    hp.Validation["check_invertion"] = False
    hp.Validation["wrong_context_test"] = False   # recomputed in the hook
    hp.logger = False

    curve: list[dict] = []

    def val_hook(step, val_loss, hp_, spec, params, val_ds):
        batch = next(val_ds.epoch_batches(hp.batch_size, shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, base_loss, _ = seqglow.sequence_nll_jit(spec, params, jb)
        probes = tm.wrong_context_probes(spec, params, jb, base_loss,
                                         hp.Mismatch,
                                         jax.random.PRNGKey(step))
        row = {"step": int(step), "val_loss": float(val_loss),
               "gap_p2": float(probes[GAP_KEY])}
        curve.append(row)
        print(f"[{name}] step {step}: val_loss {val_loss:.2f} "
              f"gap(p2) {row['gap_p2']:+.3f}", flush=True)

    t0 = time.time()
    train(hp, seed=1234, log_dir=None, ckpt_dir=None, max_steps=max_steps,
          use_mesh=False, verbose=False, val_hook=val_hook)
    best = min(curve, key=lambda r: r["val_loss"]) if curve else None
    return {
        "config": name,
        "use_negative_nll_loss": bool(hp.Train["use_negative_nll_loss"]),
        "max_steps": max_steps,
        "wall_s": round(time.time() - t0, 1),
        "curve": curve,
        "best_val": best,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--max_steps", type=int, default=900)
    p.add_argument("--configs", default=",".join(ALL_CONFIGS))
    p.add_argument("--dataset_root", default="/tmp/lfi_ablation")
    p.add_argument("--out", default=str(REPO / "runs" / "ablation_table1.json"))
    args = p.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from lets_face_it_tpu.data.synthetic import write_synthetic_dataset
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    target = Path(args.dataset_root) / "lets_face_it.h5"
    if not target.exists():
        print(f"writing synthetic fixture to {target}")
        write_synthetic_dataset(target, seed=1234)

    dev = jax.devices()[0]
    results = {"device": dev.device_kind, "fixture": "small synthetic "
               "(4 train chunks x 160 frames, planted mimicry lag 8)",
               "gap_key": GAP_KEY, "configs": {}}
    out_path = Path(args.out)
    for name in args.configs.split(","):
        print(f"=== {name} ===", flush=True)
        results["configs"][name] = run_config(name, args.dataset_root,
                                              args.max_steps)
        # partial results survive an interrupted later config
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out_path}")
    for name, r in results["configs"].items():
        b = r["best_val"]
        print(f"{name:14s} trick={r['use_negative_nll_loss']} best-val "
              f"step {b['step']}: val {b['val_loss']:.2f} "
              f"gap(p2) {b['gap_p2']:+.3f}")


if __name__ == "__main__":
    main()

"""bf16-vs-f32 training convergence A/B (VERDICT r4 item 2).

README/PERF.md sell the bf16-matmul production mode on throughput (2.4x the
f32 step rate) — this tool supplies the missing QUALITY evidence: the same
final_model config, same seed, same synthetic fixture, trained once with
``precision: 32`` (f32-highest matmuls, the reference-parity setting) and
once with ``precision: 16`` (bf16-multiply matmuls, the TPU-native default
class), val-NLL curves captured at every validation and overlaid in
``runs/precision_ab.json``. ``tests/test_precision_ab.py`` pins the
artifact's integrity and its conclusion; PERF.md and PARITY.md quote the
measured delta and state when bf16 is and is not safe.

Each arm runs as a ``train.py`` subprocess because the matmul-precision mode
is process-global jax config (train.py:103-106 sets it from the hparams
``precision`` key — the same key the reference YAML carries at
final_model.yaml:141).

Usage:
    python tools/precision_ab.py [--max_steps 5000] [--batch_size 256]
        [--dataset_root /tmp/lfi_ab] [--out runs/precision_ab.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_arm(precision: int, args) -> dict:
    cmd = [
        sys.executable, str(REPO / "train.py"),
        str(REPO / "hparams" / "final_model.yaml"),
        "--dataset_root", args.dataset_root,
        "--max_steps", str(args.max_steps),
        "--max_epochs", "100000",
        "--batch_size", str(args.batch_size),
        "--precision", str(precision),
        "--seed", "1234",
    ]
    if args.steps_per_dispatch:
        cmd += ["--steps_per_dispatch", str(args.steps_per_dispatch)]
    if args.cpu:
        cmd += ["--cpu"]
    print(f"=== precision {precision}: {' '.join(cmd[1:])}", flush=True)
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                            cwd=str(REPO))
    curve = []
    last_sps = None
    for line in proc.stdout:
        line = line.strip()
        if not line.startswith("{"):
            print(f"[p{precision}] {line}", flush=True)
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "val_loss" in row:
            curve.append({"step": int(row["step"]),
                          "val_loss": round(float(row["val_loss"]), 2)})
            print(f"[p{precision}] step {row['step']}: "
                  f"val {row['val_loss']:.1f}", flush=True)
        elif "steps_per_sec" in row:
            last_sps = float(row["steps_per_sec"])
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"precision-{precision} arm exited rc={rc}")
    return {"precision": precision, "curve": curve,
            "steps_per_sec": round(last_sps, 3) if last_sps else None,
            "wall_s": round(time.time() - t0, 1)}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max_steps", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--steps_per_dispatch", type=int, default=8)
    p.add_argument("--dataset_root", default="/tmp/lfi_ab")
    p.add_argument("--out", default=str(REPO / "runs" / "precision_ab.json"))
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n_train_chunks", type=int, default=400)
    p.add_argument("--frames_per_chunk", type=int, default=400)
    args = p.parse_args()

    # fixture written host-side before any arm (no accelerator touch here)
    sys.path.insert(0, str(REPO))
    from lets_face_it_tpu.data.synthetic import write_synthetic_dataset

    target = Path(args.dataset_root) / "lets_face_it.h5"
    if not target.exists():
        print(f"writing {args.n_train_chunks}-chunk fixture to {target}")
        write_synthetic_dataset(target, n_train_chunks=args.n_train_chunks,
                                n_val_chunks=8, n_test_chunks=2,
                                frames_per_chunk=args.frames_per_chunk,
                                seed=1234)

    arms = {}
    for precision in (32, 16):
        arms["f32" if precision == 32 else "bf16"] = run_arm(precision, args)

    f32c = {r["step"]: r["val_loss"] for r in arms["f32"]["curve"]}
    bf16c = {r["step"]: r["val_loss"] for r in arms["bf16"]["curve"]}
    shared = sorted(set(f32c) & set(bf16c))
    deltas = [bf16c[s] - f32c[s] for s in shared]
    summary = {
        "shared_val_steps": len(shared),
        "final_step": shared[-1] if shared else None,
        "final_val_f32": f32c[shared[-1]] if shared else None,
        "final_val_bf16": bf16c[shared[-1]] if shared else None,
        # positive = bf16 worse (higher NLL)
        "final_delta_bits": (round(bf16c[shared[-1]] - f32c[shared[-1]], 2)
                             if shared else None),
        "max_abs_delta_bits": (round(max(abs(d) for d in deltas), 2)
                               if deltas else None),
        "final_delta_relative": (
            round((bf16c[shared[-1]] - f32c[shared[-1]])
                  / max(abs(f32c[shared[-1]]), 1e-9), 5) if shared else None),
        "throughput_ratio_bf16_over_f32": (
            round(arms["bf16"]["steps_per_sec"] / arms["f32"]["steps_per_sec"],
                  2)
            if arms["bf16"]["steps_per_sec"] and arms["f32"]["steps_per_sec"]
            else None),
    }
    out = {"config": "final_model", "batch_size": args.batch_size,
           "seed": 1234, "max_steps": args.max_steps,
           "steps_per_dispatch": args.steps_per_dispatch,
           "fixture": f"synthetic {args.n_train_chunks} chunks x "
                       f"{args.frames_per_chunk} frames",
           "summary": summary, "arms": arms}
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {out_path}")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

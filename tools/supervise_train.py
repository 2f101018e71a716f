"""Supervisor loop for unattended training: relaunch on stall, stop on crash.

Completes the durability chain measured in round 4 (PERF.md, README):

* checkpoint/resume is bit-exact and trajectory-preserving
  (tests/test_checkpoint.py; the 60k-step rehearsal survived 3 kills,
  runs/long_run_curve.json),
* ``train.py --stall_timeout_s`` turns a hung remote transport into
  ``exit 17`` (utils/watchdog.py),
* this tool closes the loop: run train.py, and when it exits with the
  stall code, relaunch it with ``--resume_from`` pointed at the checkpoint
  directory. A clean exit (0) ends supervision; any other exit code is a
  real crash and is NOT retried by default (a deterministic failure would
  just loop) — pass ``--retry_crashes N`` to allow N of them.

The reference's answer to this failure mode was a human re-running
``train_existing_model.py`` with ``resume_from_checkpoint``
(final_model.yaml:149); here the babysitting is a process.

Usage:
    python tools/supervise_train.py --ckpt_dir checkpoints/run -- \
        python train.py hparams/final_model.yaml --dataset_root DATA \
        --ckpt_dir checkpoints/run --stall_timeout_s 900

The command after ``--`` is launched verbatim; on relaunch,
``--resume_from <ckpt_dir>`` is appended (once) — but only when the
directory already holds a committed checkpoint, so a stall before the
first save relaunches fresh instead of crashing on restore. Supervision
state is printed as JSON lines for log scraping.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lets_face_it_tpu.utils.watchdog import STALL_EXIT_CODE  # noqa: E402


def log(event: str, **kw) -> None:
    print(json.dumps({"supervisor": event, **kw}), flush=True)


def has_checkpoint(ckpt_dir: str) -> bool:
    """True iff the orbax directory holds at least one committed step.

    Committed steps are bare-numeric subdirectories (``<dir>/<step>/``);
    orbax's in-flight tmp dirs carry a non-numeric suffix and are excluded.
    Checked on every relaunch so a stall BEFORE the first checkpoint (the
    canonical case: tunnel drops during epoch 0, checkpoints land only at
    validation epochs) relaunches fresh instead of crashing train.py with
    FileNotFoundError — which would read as a real crash and end supervision.
    """
    d = Path(ckpt_dir)
    if not d.is_dir():
        return False
    return any(p.is_dir() and p.name.isdigit() for p in d.iterdir())


def supervise(cmd: list[str], ckpt_dir: str, *, max_stalls: int = 100,
              retry_crashes: int = 0, backoff_s: float = 30.0) -> int:
    """Run ``cmd`` under supervision; returns the final exit code."""
    stalls = 0
    crashes = 0
    attempt = 0
    while True:
        attempt += 1
        full = list(cmd)
        if attempt > 1 and "--resume_from" not in full:
            if has_checkpoint(ckpt_dir):
                full += ["--resume_from", ckpt_dir]
            else:
                log("no_checkpoint_yet", ckpt_dir=ckpt_dir)
        log("launch", attempt=attempt, cmd=full)
        rc = subprocess.call(full)
        if rc == 0:
            log("done", attempt=attempt)
            return 0
        if rc == STALL_EXIT_CODE:
            stalls += 1
            log("stalled", attempt=attempt, stalls=stalls)
            if stalls > max_stalls:
                log("giving_up", reason="max_stalls", stalls=stalls)
                return rc
        else:
            crashes += 1
            log("crashed", attempt=attempt, exit_code=rc, crashes=crashes)
            if crashes > retry_crashes:
                log("giving_up", reason="crash", exit_code=rc)
                return rc
        # a stalled tunnel usually needs time to come back; don't hammer it
        time.sleep(backoff_s)


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--ckpt_dir", required=True,
                    help="checkpoint dir appended as --resume_from on "
                         "relaunches (must match the command's --ckpt_dir)")
    ap.add_argument("--max_stalls", type=int, default=100)
    ap.add_argument("--retry_crashes", type=int, default=0,
                    help="also retry this many non-stall failures "
                         "(default 0: a crash is a bug, not weather)")
    ap.add_argument("--backoff_s", type=float, default=30.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the training command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no training command given (put it after --)")
    sys.exit(supervise(cmd, args.ckpt_dir, max_stalls=args.max_stalls,
                       retry_crashes=args.retry_crashes,
                       backoff_s=args.backoff_s))


if __name__ == "__main__":
    main()

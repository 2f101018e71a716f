"""Extract the validation curve from a training run's JSON-lines stdout log
into a compact committed artifact.

The training loop prints one JSON object per logged step and one per
validation (train/loop.py::MetricLogger.scalars). This tool filters the
validation rows (those carrying ``val_loss``) plus run milestones, and
writes them with kill/resume annotations so the production-rehearsal curve
(round-4 VERDICT item 1) is reviewable without the TensorBoard events.

Usage:
    python tools/extract_val_curve.py LOG [LOG2 ...] --out runs/long_run_curve.json
        [--note "kill at step N between LOG and LOG2"]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def parse_log(path: Path) -> list[dict]:
    rows = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "val_loss" in obj:
            rows.append(obj)
    return rows


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logs", nargs="+")
    p.add_argument("--out", required=True)
    p.add_argument("--note", action="append", default=[])
    args = p.parse_args()

    segments = []
    for log in args.logs:
        rows = parse_log(Path(log))
        segments.append({"log": Path(log).name, "n_validations": len(rows),
                         "rows": rows})
    out = {"notes": args.note, "segments": segments}
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    total = sum(s["n_validations"] for s in segments)
    print(f"wrote {out_path}: {len(segments)} segment(s), "
          f"{total} validations")


if __name__ == "__main__":
    main()

"""The committed rehearsal-curve artifact and its extractor.

``runs/long_run_curve.json`` is the round-4 production-rehearsal evidence
(60k-step final_model run, 3 kills, monotone recovery); these tests pin
both the extractor's behavior and the artifact's integrity so a future
re-extraction or edit cannot silently degrade the claim the README makes.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from extract_val_curve import parse_log  # noqa: E402


def test_parse_log_filters_validation_rows(tmp_path):
    log = tmp_path / "run.log"
    log.write_text("\n".join([
        "WARNING: some startup noise",
        json.dumps({"step": 10, "train_loss": -5.0, "nll": -5.0}),
        json.dumps({"step": 20, "val_loss": -6.0, "jerk/gt_jerk": 0.2}),
        "not json {",
        json.dumps({"step": 40, "val_loss": -7.5}),
        "training done; best val_loss = -7.5",
    ]))
    rows = parse_log(log)
    assert [r["step"] for r in rows] == [20, 40]
    assert rows[-1]["val_loss"] == -7.5


def test_committed_rehearsal_curve_integrity():
    """The artifact must keep telling the story the README cites: four
    segments (original + three resumes), 30 validations, strictly
    decreasing val NLL across every kill/resume boundary."""
    artifact = REPO / "runs" / "long_run_curve.json"
    data = json.loads(artifact.read_text())
    assert len(data["segments"]) == 4
    rows = [r for s in data["segments"] for r in s["rows"]]
    assert len(rows) == 30
    steps = [r["step"] for r in rows]
    assert steps == sorted(steps) and steps[-1] == 60180
    vals = [r["val_loss"] for r in rows]
    assert all(b < a for a, b in zip(vals, vals[1:])), \
        "val NLL must decrease monotonically across resumes"
    notes = " ".join(data["notes"]).lower()
    assert "kill" in notes and "resume" in notes

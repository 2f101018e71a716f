"""README performance table must match the latest captured bench JSON.

Rounds 1 and 2 both shipped a README figure that drifted from the
driver-captured bench. The table is now generated (tools/pin_readme.py)
from ``runs/bench_latest.json``; this test re-renders it and requires a
byte-for-byte match, so any hand edit or stale capture fails the suite.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from pin_readme import BEGIN, END, render_table  # noqa: E402


def test_readme_table_matches_latest_capture():
    capture = json.loads((REPO / "runs" / "bench_latest.json").read_text())
    readme = (REPO / "README.md").read_text()
    assert BEGIN in readme and END in readme
    block = readme.split(BEGIN, 1)[1].split(END, 1)[0].strip()
    assert block == render_table(capture), (
        "README performance table is stale — regenerate with "
        "`python tools/pin_readme.py <bench.json>`")


def test_pinned_values_lie_inside_measurement_bands():
    """The pinned headline numbers are medians-of-3 and must sit inside the
    newest capture's min-max band — the README can never publish a lucky
    tail again (r3 weak #3)."""
    capture = json.loads((REPO / "runs" / "bench_latest.json").read_text())
    bands = capture.get("bands")
    assert bands, ("newest capture carries no measurement bands — "
                   "re-run bench.py (r4+) and re-pin")
    for key, (lo, hi) in bands.items():
        value = capture[key] if key != "value" else capture["value"]
        assert lo <= value <= hi, (
            f"{key}: pinned {value} outside measured band [{lo}, {hi}]")
        assert hi <= 1.25 * max(lo, 1e-9), (
            f"{key}: band spread {hi / lo:.2f}x — measurement too noisy to "
            "pin; investigate before publishing")

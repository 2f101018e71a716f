"""Every measurement artifact the docs cite must be commit-able.

The round-5 probe captures (precision_ab, trick_gate_probe,
device_cache_scale) were written and validated, then silently lost because
``runs/*`` was gitignored without a whitelist entry — the evidence behind
three README/PERF/PARITY claims evaporated with the working tree. This test
pins the bug class: any ``runs/<name>.json`` referenced from README.md,
PARITY.md, or docs/PERF.md must NOT be ignored by git, so a fresh capture
lands in history the moment it is committed."""

import re
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = ("README.md", "PARITY.md", "docs/PERF.md")


def test_doc_cited_run_artifacts_are_not_gitignored():
    if shutil.which("git") is None or not (REPO / ".git").exists():
        pytest.skip("not a git checkout")
    cited = set()
    for doc in DOCS:
        text = (REPO / doc).read_text()
        cited.update(re.findall(r"runs/[A-Za-z0-9_.-]+\.json", text))
    assert cited, "doc scan found no artifact references — regex rotted?"
    proc = subprocess.run(
        ["git", "check-ignore", "--no-index", *sorted(cited)],
        cwd=REPO, capture_output=True, text=True)
    ignored = proc.stdout.split()
    assert not ignored, (
        f"doc-cited artifacts are gitignored and would be lost on commit: "
        f"{ignored} — whitelist them in .gitignore (!runs/<name>.json)")

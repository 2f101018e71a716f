"""The MAHNOB-scale device-cache artifact (VERDICT r4 item 6).

``runs/device_cache_scale.json`` is the committed evidence that the
HBM-resident data path holds at production corpus scale on a real v5e:
~2 GB of train modality arrays (2.67M windows) PLUS the val split cached
under the auto policy's 6 GB budget, trained end-to-end at b256
(k-steps-per-dispatch) AND at b1024 (encoder-remat peak), with a cached-val
evaluation pass — all coexisting in the 16 GiB HBM
(tools/device_cache_scale_probe.py). These tests pin the artifact so the
PERF.md claim stays backed.
"""

import json
import math
from pathlib import Path

import pytest

ARTIFACT = (Path(__file__).resolve().parent.parent / "runs"
            / "device_cache_scale.json")


def _load():
    if not ARTIFACT.exists():
        pytest.skip("runs/device_cache_scale.json absent — regenerate on a "
                    "TPU with tools/device_cache_scale_probe.py (the round-5 "
                    "capture was lost to a runs/* gitignore rule, now fixed)")
    return json.loads(ARTIFACT.read_text())


def test_scale_artifact_integrity():
    d = _load()
    # full-scale corpus: ~2 GB of train arrays, ~0.2 GB val, millions of
    # windows — both splits accepted by the auto policy
    assert d["train_split_gb"] >= 1.5
    assert d["val_split_gb"] >= 0.1
    assert d["windows_train"] >= 2_000_000
    # trained end-to-end at both batch envelopes with finite losses
    assert d["b256_k8_steps_per_sec"] > 0
    assert math.isfinite(d["b256_nll_final"])
    assert math.isfinite(d["b1024_nll_final"])
    assert math.isfinite(d["val_nll"])


def test_scale_artifact_hbm_headroom():
    """The coexistence claim: corpus caches + params/opt + the b1024 remat
    activation peak leave real headroom in the 16 GiB device."""
    d = _load()
    if "headroom_gb" not in d:  # memory_stats unsupported on some backends
        pytest.skip("capture carries no memory_stats (remote backend)")
    assert d["hbm_limit_gb"] >= 15.0
    assert d["peak_gb"] <= d["hbm_limit_gb"]
    assert d["headroom_gb"] >= 1.0

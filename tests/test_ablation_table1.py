"""Table-1 behavioral signatures from the committed ablation-run artifact.

``runs/ablation_table1.json`` is produced by ``tools/ablation_table1.py``
(real accelerator runs of final_model + the three ablations to their
val-loss optimum on the planted-mimicry fixture). This test pins the
paper's sharpest falsifiable prediction (Table 1, BASELINE.md rows 19-23):
with the negative-NLL trick active, deranging the interlocutor collapses
the likelihood (400.51 -> 235.22); without the trick the model trains fine
but the matched-vs-deranged gap vanishes (386.98 vs 386.54).

Convention: gap = matched − deranged NLL, so "listening" is strongly
NEGATIVE (reference mimicry_logger.py:199-238 sign).
"""

import json
import math
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent.parent / "runs" / "ablation_table1.json"


@pytest.fixture(scope="module")
def results():
    assert ARTIFACT.exists(), (
        "runs/ablation_table1.json missing — run tools/ablation_table1.py "
        "on the accelerator and commit the artifact")
    return json.loads(ARTIFACT.read_text())


def _best_gap(results, name):
    cfg = results["configs"][name]
    assert cfg["best_val"] is not None, f"{name}: no validation recorded"
    return cfg["best_val"]["gap_p2"]


def test_all_four_configs_trained_to_plateau(results):
    for name in ("final_model", "no_speech", "no_face", "no_nll_trick"):
        cfg = results["configs"][name]
        assert len(cfg["curve"]) >= 5, f"{name}: only {len(cfg['curve'])} vals"
        # trained: val loss at the optimum is finite and far below the start
        first, best = cfg["curve"][0]["val_loss"], cfg["best_val"]["val_loss"]
        assert math.isfinite(best) and best < first, (name, first, best)


def test_nll_trick_drives_the_interlocutor_gap(results):
    """The Table-1 signature: the final model's matched-vs-deranged gap is
    strongly negative at its val optimum, while no_nll_trick — identical
    except for the trick — sits near zero."""
    gap_final = _best_gap(results, "final_model")
    gap_no_trick = _best_gap(results, "no_nll_trick")

    assert gap_final < -2.0, (
        f"final_model gap {gap_final:+.3f}: the model does not measurably "
        "prefer the matched interlocutor")
    assert abs(gap_no_trick) < 1.0, (
        f"no_nll_trick gap {gap_no_trick:+.3f}: expected ~0 (Table 1: "
        "386.98 vs 386.54)")
    assert abs(gap_no_trick) < abs(gap_final) / 4.0, (
        f"gap collapse not reproduced: no_trick {gap_no_trick:+.3f} vs "
        f"final {gap_final:+.3f}")


def test_trick_flag_matches_configs(results):
    """The recorded trick flags must match the hparams files (a mislabeled
    run would invalidate the comparison)."""
    expected = {"final_model": True, "no_face": True,
                "no_speech": False, "no_nll_trick": False}
    for name, flag in expected.items():
        assert results["configs"][name]["use_negative_nll_loss"] is flag, name

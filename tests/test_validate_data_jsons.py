"""Dataset-definition JSON validator (tools/validate_data_jsons.py): the
schema gate for the user-supplied data/ directory (the reference's JSONs are
not redistributable — SURVEY §2.1 static data)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from validate_data_jsons import validate_data_dir  # noqa: E402

REFERENCE_DATA = Path("/root/reference/data")


def _write_good(d: Path):
    (d / "train_val_test.json").write_text(json.dumps(
        {"train": {"S1": [[0, 60000], [70000, 90000]]},
         "val": {"S2": [[0, 30000]]}, "test": {"S3": [[0, 20000]]},
         "heldout_interaction": "S4"}))
    (d / "annotations.json").write_text(json.dumps(
        {"S1": {"smile": [[100, 900, 1]], "head_yaw": [[1000, 2000, None]]}}))
    (d / "meta_data.json").write_text(json.dumps(
        {"sessions": {"S1": {"P1": "u1", "P2": "u2", "topic": "x"},
                      "S2": {"P1": "u1", "P2": "u3"},
                      "S3": {"P1": "u2", "P2": "u3"},
                      "S4": {"P1": "u1", "P2": "u2"}},
         "subjects": {"u1": {"gender": "female"}, "u2": {"gender": "male"},
                      "u3": {"gender": "female"}}}))


def test_valid_directory_passes(tmp_path):
    _write_good(tmp_path)
    errors, warnings, summary = validate_data_dir(tmp_path)
    assert errors == [] and warnings == []
    assert summary["splits"]["train"]["sessions"] == 1


def test_schema_violations_are_reported(tmp_path):
    (tmp_path / "train_val_test.json").write_text(json.dumps(
        {"train": {"S1": [[5000, 1000]]},
         "wat": {"S9": [[0, 1000], [500, 2000]]}}))
    (tmp_path / "annotations.json").write_text(
        json.dumps({"S1": {"smile": [[0, 100]]}}))
    (tmp_path / "meta_data.json").write_text(json.dumps(
        {"sessions": {"S1": {"P1": "zz"}}, "subjects": {"u1": {}}}))
    errors, warnings, _ = validate_data_dir(tmp_path)
    joined = "\n".join(errors)
    assert "degenerate interval" in joined
    assert "expected [start_ms, stop_ms, value]" in joined
    assert "missing gender" in joined
    assert "unknown subject 'zz'" in joined
    assert "missing participant 'P2'" in joined
    assert any("overlapping intervals" in w for w in warnings)
    assert any("unknown split" in w for w in warnings)


def test_missing_required_file_is_an_error(tmp_path):
    errors, warnings, _ = validate_data_dir(tmp_path)
    assert any("train_val_test.json: missing" in e for e in errors)


def test_combine_gate_blocks_on_splits_errors_only(tmp_path):
    """extract_features' pre-combine gate must hard-fail on ANY splits-file
    schema error (including the bracketed "name['train']...: msg" format)
    while demoting errors in optional sibling JSONs to warnings."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from extract_features import _validate_splits_dir

    _write_good(tmp_path)
    splits = tmp_path / "train_val_test.json"

    # malformed optional sibling only -> warn, don't exit
    (tmp_path / "annotations.json").write_text(json.dumps({"S1": "wat"}))
    _validate_splits_dir(splits)

    # degenerate interval inside the splits file -> bracketed error, must exit
    splits.write_text(json.dumps(
        {"train": {"S1": [[5000, 1000]]}, "val": {"S2": [[0, 30000]]},
         "test": {"S3": [[0, 20000]]}}))
    with pytest.raises(SystemExit):
        _validate_splits_dir(splits)


@pytest.mark.skipif(not REFERENCE_DATA.exists(),
                    reason="reference data not present")
def test_reference_shipped_jsons_validate_clean():
    """The validator must accept the reference repo's actual shipped JSONs
    (null annotation values, session metadata fields, string heldout)."""
    errors, _, summary = validate_data_dir(REFERENCE_DATA)
    assert errors == []
    assert summary["splits"]["train"]["sessions"] == 52


def test_shipped_example_jsons_validate_clean():
    """The synthetic data/example/ directory must stay schema-complete."""
    example = Path(__file__).resolve().parent.parent / "data" / "example"
    errors, warnings, summary = validate_data_dir(example)
    assert errors == [] and warnings == []
    assert summary["splits"]["train"]["sessions"] == 2

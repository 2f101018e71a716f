"""Hparams-loading pins: unmodified reference YAMLs and our shipped configs
must load, validate, and build a FlowSpec (glow/utils.py:13-41 parity,
including tolerating PL Trainer keys)."""

from pathlib import Path

import pytest

from lets_face_it_tpu.hparams import load_hparams, validate_hparams
from lets_face_it_tpu.model import FlowSpec

REFERENCE_HPARAMS = Path("/root/reference/code/glow_pytorch/hparams")
LOCAL_HPARAMS = Path(__file__).parent.parent / "hparams"


def _check(path):
    hp = load_hparams(path, dataset_root="/tmp/does_not_matter")
    validate_hparams(hp)
    spec = FlowSpec.build(hp)
    assert spec.n_steps == hp.Glow["K"]
    assert spec.channels > 0
    assert spec.cond.longest_history + 1 < hp.Train["seq_len"]
    return hp, spec


@pytest.mark.parametrize("name", ["final_model", "no_face", "no_speech",
                                  "no_nll_trick"])
def test_reference_yaml_loads_unmodified(name):
    path = REFERENCE_HPARAMS / f"{name}.yaml"
    if not path.exists():
        pytest.skip("reference checkout not present")
    hp, spec = _check(path)
    if name == "final_model":
        assert spec.n_steps == 16
        assert spec.cond.cond_dim == 512
        assert spec.channels == 56
        assert hp.batch_size == 256
        assert hp.Train["seq_len"] == 80
    if name == "no_nll_trick":
        assert not hp.Train["use_negative_nll_loss"]


@pytest.mark.parametrize("path", sorted(LOCAL_HPARAMS.glob("*.yaml")),
                         ids=lambda p: p.stem)
def test_shipped_yaml_loads(path):
    _check(path)

"""Direct unit coverage for the small shared helpers that were previously
exercised only through the CLIs: `utils/misc.py` (reference misc/utils.py
semantics), `utils/timing.py` (the remote-transport timing recipe), and
`train/metrics.py` (the reference's validation probes,
mimicry_logger.py:175-251)."""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lets_face_it_tpu.core import ops
from lets_face_it_tpu.model import FlowSpec, init_seqglow, seqglow
from lets_face_it_tpu.train import metrics as train_metrics
from lets_face_it_tpu.utils import misc, timing

from conftest import random_batch, tiny_hparams


# ---------------------------------------------------------------- utils.misc

def test_ms2frames_frame_numbering_and_roundtrip():
    # reference misc/utils.py: frames are 1-based — 0 ms is frame 1
    assert misc.ms2frames(0) == 1
    assert misc.ms2frames(0, fps=25) == 1
    # one 50 fps frame period = 20 ms
    assert misc.ms2frames(20) == 2
    assert misc.ms2frames(1000) == 51
    # frames2ms inverts ms2frames on exact frame boundaries
    for ms in (0, 20, 40, 1000, 3580):
        assert misc.frames2ms(misc.ms2frames(ms)) == ms
    # frames2s is the plain 0-based conversion used for durations
    assert misc.frames2s(50) == 1.0
    assert misc.frames2s(25, fps=25) == 1.0


def test_get_face_indicies_packed_layout():
    # packed 106-D block: expression at +0, jaw at +100, neck at +103
    idx = misc.get_face_indicies(50, 3, 3)
    assert idx == list(range(50)) + [100, 101, 102, 103, 104, 105]
    # truncated dims take prefixes of each section
    assert misc.get_face_indicies(2, 1, 1) == [0, 1, 100, 103]
    # offset shifts the whole block (second face in a packed frame)
    assert misc.get_face_indicies(2, 1, 1, offset=106) == [106, 107, 206, 209]


def test_get_gender_and_participant(tmp_path):
    meta = {
        "sessions": {"Sessions/11": {"P1": "S07", "P2": "S08"}},
        "subjects": {"S07": {"gender": "female"}, "S08": {"gender": "male"}},
    }
    p = tmp_path / "meta_data.json"
    p.write_text(json.dumps(meta))
    assert misc.get_gender(p, "Sessions/11", "P1") == "female"
    assert misc.get_gender(p, "Sessions/11", "P2") == "male"

    assert misc.get_participant("Sessions/11/1_P1_FaceNear.mp4") == "P1"
    assert misc.get_participant("x/2_P2_FaceNear_c.avi") == "P2"

    out = misc.replace_part(Path("a/video/b/video.mp4"), "video", "audio")
    assert out == Path("a/audio/b/audio.mp4")


# -------------------------------------------------------------- utils.timing

def test_hard_sync_forces_a_host_fetch():
    # must accept an arbitrary pytree and not error on CPU arrays
    timing.hard_sync({"a": jnp.ones((3, 2)), "b": jnp.zeros(4)})
    timing.hard_sync(jnp.arange(5.0))


def test_diff_time_cancels_fixed_costs():
    # run_n costs fixed 30 ms + n * 10 ms; the difference method must
    # recover ~10 ms/iter with the fixed part cancelled
    def run_n(n):
        time.sleep(0.03 + 0.01 * n)

    per_iter = timing.diff_time(run_n, 4)
    assert 0.008 <= per_iter <= 0.05  # loose upper bound for loaded boxes


# ------------------------------------------------------------- train.metrics

def test_calc_jerk_matches_third_difference():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 5)).astype(np.float32)
    expected = np.abs(np.diff(x, n=3, axis=1)).mean()
    np.testing.assert_allclose(float(train_metrics.calc_jerk(x)), expected,
                               rtol=1e-6)
    # linear motion has zero jerk; cubic t^3 has constant jerk 6
    t = np.arange(10, dtype=np.float32)
    lin = np.broadcast_to(t[None, :, None], (1, 10, 3)).copy()
    assert float(train_metrics.calc_jerk(lin)) == pytest.approx(0.0, abs=1e-6)
    cub = np.broadcast_to((t ** 3)[None, :, None], (1, 10, 3)).copy()
    assert float(train_metrics.calc_jerk(cub)) == pytest.approx(6.0, rel=1e-6)


def test_jerk_metrics_triplet():
    rng = np.random.default_rng(4)
    gt = rng.standard_normal((2, 10, 4)).astype(np.float32)
    out = train_metrics.jerk_metrics(gt, 2.0 * gt)
    assert set(out) == {"jerk/gt_jerk", "jerk/generated_jerk",
                        "jerk/generated_jerk_ratio"}
    # jerk is linear in amplitude, so the ratio of 2x-scaled motion is 2
    assert float(out["jerk/generated_jerk_ratio"]) == pytest.approx(2.0,
                                                                    rel=1e-5)


def _tiny_model():
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    return hp, spec, params


def test_invertibility_error_matches_roundtrip_identity():
    """The probe (mimicry_logger.py:241-251) reports
    |(backward_loss + loss)/loss| * 100; with a cleanly inverting flow the
    round-trip identity backward_loss == -loss - 2*E[logp(z)]/ln2 holds
    (tests/test_model.py::test_sequence_invert_roundtrip), so the probe value
    is fully determined by z_seq and loss."""
    hp, spec, params = _tiny_model()
    batch = random_batch(hp)
    z_seq, loss, _ = seqglow.sequence_nll(spec, params, batch)
    err = train_metrics.invertibility_error(spec, params, batch, z_seq, loss)
    mean_logp = float(jnp.mean(ops.gaussian_logp(z_seq)))
    expected = abs((-2.0 * mean_logp / float(ops.LN2)) / float(loss)) * 100.0
    np.testing.assert_allclose(float(err), expected, rtol=1e-3)


def test_wrong_context_probes_structure_and_noop_on_identical_rows():
    hp, spec, params = _tiny_model()
    batch = random_batch(hp)
    # make every example in the batch identical: permuting rows is then a
    # no-op, so every shuffle_batch probe must report a zero delta
    batch = {k: np.broadcast_to(v[:1], v.shape).copy()
             for k, v in batch.items()}
    _, base_loss, _ = seqglow.sequence_nll_jit(
        spec, params, {k: jnp.asarray(v) for k, v in batch.items()})
    probes = train_metrics.wrong_context_probes(
        spec, params, batch, base_loss, hp.Mismatch, jax.random.PRNGKey(5))
    assert set(probes) == {"mismatched_nll/shuffled_batch/all",
                           "mismatched_nll/shuffled_batch/p2",
                           "mismatched_nll/shuffled_time/p2"}
    assert abs(float(probes["mismatched_nll/shuffled_batch/all"])) < 1e-5
    assert abs(float(probes["mismatched_nll/shuffled_batch/p2"])) < 1e-5
    # the time-shuffle probe really permutes time, so it is a genuine probe
    # (finite, and in general nonzero even on identical rows)
    assert np.isfinite(float(probes["mismatched_nll/shuffled_time/p2"]))

    # same rng => bit-identical derangement => identical probe values
    again = train_metrics.wrong_context_probes(
        spec, params, batch, base_loss, hp.Mismatch, jax.random.PRNGKey(5))
    for k in probes:
        assert float(probes[k]) == float(again[k])

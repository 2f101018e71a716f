"""Stall watchdog (utils/watchdog.py): the exit path for a hung remote
transport, sized so a supervisor can restart a long run with --resume_from
(the failure mode checkpoint/resume alone cannot cover)."""

import time

import pytest

from lets_face_it_tpu.utils.watchdog import ProgressWatchdog, STALL_EXIT_CODE


def _wait_for(pred, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_fires_on_stall_after_arming():
    calls = []
    wd = ProgressWatchdog(0.2, on_stall=lambda idle, name: calls.append(idle),
                          poll_s=0.05)
    wd.beat()
    assert _wait_for(lambda: wd.fired)
    assert calls and calls[0] > 0.2


def test_unarmed_until_first_beat():
    """A cold start spends 10-40 min in the first remote compile; the
    watchdog must not count that against the steady-state timeout."""
    calls = []
    wd = ProgressWatchdog(0.1, on_stall=lambda *a: calls.append(a),
                          poll_s=0.03)
    time.sleep(0.5)                     # way past timeout_s, but no beat yet
    assert not wd.fired and not calls
    wd.stop()


def test_beats_keep_it_alive_and_stop_disarms():
    calls = []
    wd = ProgressWatchdog(0.3, on_stall=lambda *a: calls.append(a),
                          poll_s=0.05)
    for _ in range(6):
        wd.beat()
        time.sleep(0.1)                 # always inside the timeout
    assert not wd.fired
    wd.stop()
    time.sleep(0.6)                     # stopped: a stall no longer fires
    assert not wd.fired and not calls


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        ProgressWatchdog(0.0)


def test_exit_code_is_distinct():
    # the supervisor contract: 17 == "stalled, checkpoint fine, resume"
    assert STALL_EXIT_CODE == 17


def test_train_loop_wires_heartbeats(tmp_path):
    """train() with hp.stall_timeout_s runs to completion with the watchdog
    armed and stopped cleanly (a generous timeout never fires on CPU)."""
    from conftest import tiny_hparams
    from lets_face_it_tpu.data.synthetic import (tiny_dims,
                                                 write_synthetic_dataset)
    from lets_face_it_tpu.train.loop import train

    write_synthetic_dataset(tmp_path / "synthetic.h5", dims=tiny_dims(),
                            n_train_chunks=2, n_val_chunks=1,
                            n_test_chunks=1, frames_per_chunk=40, seed=0)
    hp = tiny_hparams(
        dataset_root=str(tmp_path), logger=False, max_epochs=1,
        check_val_every_n_epoch=1, stall_timeout_s=600.0,
        Validation={"check_invertion": False, "inference": False,
                    "render": False, "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": False})
    state, best = train(hp, seed=1, log_dir=None, ckpt_dir=None,
                        use_mesh=False, verbose=False)
    assert best < float("inf")

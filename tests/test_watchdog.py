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
    # generous timeout-vs-beat margin: a loaded 1-vCPU box can delay a
    # 0.1 s sleep by hundreds of ms, which must not read as a stall
    wd = ProgressWatchdog(1.5, on_stall=lambda *a: calls.append(a),
                          poll_s=0.05)
    for _ in range(6):
        wd.beat()
        time.sleep(0.1)                 # always inside the timeout
    assert not wd.fired
    wd.stop()
    time.sleep(2.0)                     # stopped: a stall no longer fires
    assert not wd.fired and not calls


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        ProgressWatchdog(0.0)


def test_exit_code_is_distinct():
    # the supervisor contract: 17 == "stalled, checkpoint fine, resume"
    assert STALL_EXIT_CODE == 17


def test_supervisor_resumes_on_stall_only(tmp_path):
    """tools/supervise_train.py relaunches (with --resume_from) exactly on
    the stall exit code, stops on clean exit, and does not retry crashes."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from supervise_train import supervise

    marker = tmp_path / "attempts"
    # fake trainer: exits 17 (stall) twice, then asserts it was resumed and
    # exits clean; a final variant always crashes with 3
    fake = tmp_path / "fake_train.py"
    fake.write_text(f"""
import sys
from pathlib import Path
m = Path({str(marker)!r})
n = int(m.read_text() or 0) if m.exists() else 0
m.write_text(str(n + 1))
if n < 2:
    sys.exit({STALL_EXIT_CODE})
assert "--resume_from" in sys.argv, "relaunch must resume"
sys.exit(0)
""")
    ck = tmp_path / "ck"
    (ck / "100").mkdir(parents=True)      # a committed orbax step
    rc = supervise([sys.executable, str(fake)], str(ck), backoff_s=0.0)
    assert rc == 0
    assert int(marker.read_text()) == 3   # 2 stalls + 1 clean finish

    crasher = tmp_path / "crash_train.py"
    crasher.write_text("import sys; sys.exit(3)")
    rc = supervise([sys.executable, str(crasher)], str(ck), backoff_s=0.0)
    assert rc == 3                        # crashes are not retried


def test_supervisor_relaunches_fresh_before_first_checkpoint(tmp_path):
    """A stall BEFORE the first checkpoint exists must relaunch WITHOUT
    --resume_from: appending it would make train.py crash on restore
    (FileNotFoundError), which the supervisor reads as an unretried crash —
    the unattended run would die at its first early stall."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from supervise_train import has_checkpoint, supervise

    marker = tmp_path / "attempts"
    fake = tmp_path / "fake_train.py"
    fake.write_text(f"""
import sys
from pathlib import Path
m = Path({str(marker)!r})
n = int(m.read_text() or 0) if m.exists() else 0
m.write_text(str(n + 1))
if n == 0:
    sys.exit(17)
assert "--resume_from" not in sys.argv, "no checkpoint: relaunch fresh"
sys.exit(0)
""")
    ck = tmp_path / "ck"
    # orbax in-flight tmp dirs (non-numeric suffix) do not count as committed
    (ck / "100.orbax-checkpoint-tmp-1755").mkdir(parents=True)
    assert not has_checkpoint(str(ck))
    assert not has_checkpoint(str(tmp_path / "never_created"))
    rc = supervise([sys.executable, str(fake)], str(ck), backoff_s=0.0)
    assert rc == 0
    assert int(marker.read_text()) == 2
    (ck / "200").mkdir()
    assert has_checkpoint(str(ck))


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


def test_train_loop_stops_watchdog_on_exception(tmp_path):
    """An exception out of train() (here: a raising val_hook, the shape of
    tuning's pruning hooks) must disarm the watchdog on the way out — a
    leaked armed watchdog os._exit(17)s the process minutes later, mid
    whatever the caller moved on to. Run in a subprocess so a regression
    kills the child, not the suite."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    script = tmp_path / "scenario.py"
    script.write_text(f"""
import sys, time
sys.path.insert(0, {str(repo)!r})
sys.path.insert(0, {str(repo / 'tests')!r})
import jax
jax.config.update("jax_platforms", "cpu")
from conftest import tiny_hparams
from lets_face_it_tpu.data.synthetic import tiny_dims, write_synthetic_dataset
from lets_face_it_tpu.train.loop import train

write_synthetic_dataset({str(tmp_path / 'synthetic.h5')!r}, dims=tiny_dims(),
                        n_train_chunks=2, n_val_chunks=1, n_test_chunks=1,
                        frames_per_chunk=40, seed=0)
hp = tiny_hparams(
    dataset_root={str(tmp_path)!r}, logger=False, max_epochs=1,
    check_val_every_n_epoch=1, stall_timeout_s=600.0,
    Validation=dict(check_invertion=False, inference=False, render=False,
                    scale_logging=False, seq_len=16,
                    wrong_context_test=False))

def boom(step, val_loss, hp, spec, params, val_ds):
    raise RuntimeError("pruned")

try:
    train(hp, seed=1, log_dir=None, ckpt_dir=None, use_mesh=False,
          verbose=False, val_hook=boom)
except RuntimeError:
    pass
else:
    sys.exit(2)
# the finally must have stop()ped the monitor: its thread exits within one
# poll interval (min(5, timeout/4) s). A leak leaves it alive indefinitely.
import threading
wds = [t for t in threading.enumerate() if t.name.startswith("watchdog-")]
for t in wds:
    t.join(timeout=20)
if any(t.is_alive() for t in wds):
    sys.exit(3)
print("alive")
""")
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "alive" in r.stdout

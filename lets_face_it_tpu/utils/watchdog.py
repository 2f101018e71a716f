"""Progress watchdog for long runs on a remote accelerator transport.

The remote-TPU tunnel occasionally drops in a way that hangs the client
inside a blocking dispatch or fetch *forever* (observed round 4: even
``jax.devices()`` hung through a ~1 h outage). A multi-hour training run
then stalls silently instead of dying, and no supervisor
restart-from-checkpoint ever kicks in — the one failure mode that
checkpoint/resume (train/checkpoint.py) cannot cover by itself. The
reference has no equivalent; its trainer simply hangs with a dead CUDA
context too, but its runs were babysat (reference final_model.yaml:149
``resume_from_checkpoint`` exists precisely to restart by hand).

``ProgressWatchdog`` is a daemon thread that fires ``on_stall`` when no
heartbeat arrives for ``timeout_s`` seconds. The production callback
hard-exits the process (``os._exit`` — a thread blocked inside a native
dispatch cannot be interrupted from Python) with ``STALL_EXIT_CODE`` so a
supervisor loop can distinguish a stall from a crash and relaunch with
``--resume_from``.

The watchdog arms on the FIRST beat: a cold start legitimately spends
10-40 min inside the first remote compile (docs/PERF.md), which must not
trip a timeout sized for steady-state steps.
"""

from __future__ import annotations

import os
import sys
import threading
import time

# distinct from crash exit codes so a supervisor can treat "stalled" as
# "checkpoint is fine, relaunch with --resume_from"
STALL_EXIT_CODE = 17


def _default_on_stall(idle_s: float, name: str) -> None:
    print(f"watchdog[{name}]: no progress for {idle_s:.0f} s — the remote "
          f"transport is presumed hung; exiting {STALL_EXIT_CODE} so a "
          f"supervisor can resume from the latest checkpoint",
          file=sys.stderr, flush=True)
    os._exit(STALL_EXIT_CODE)


class ProgressWatchdog:
    """Fire ``on_stall(idle_seconds, name)`` when beats stop arriving.

    Unarmed until the first :meth:`beat` — see module docstring. ``stop()``
    disarms permanently (idempotent). The monitor is a daemon thread, so it
    never blocks interpreter exit.
    """

    def __init__(self, timeout_s: float, on_stall=None, *,
                 name: str = "train", poll_s: float | None = None):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be positive, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self.name = name
        self._on_stall = on_stall or _default_on_stall
        self._poll_s = poll_s if poll_s is not None else min(
            5.0, self.timeout_s / 4)
        self._last: float | None = None
        self._lock = threading.Lock()
        self._stopped = threading.Event()
        self._fired = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=f"watchdog-{name}")
        self._thread.start()

    def beat(self) -> None:
        with self._lock:
            self._last = time.monotonic()

    def stop(self) -> None:
        self._stopped.set()

    @property
    def fired(self) -> bool:
        return self._fired

    def _run(self) -> None:
        while not self._stopped.wait(self._poll_s):
            with self._lock:
                last = self._last
            if last is None:            # not armed yet (first compile)
                continue
            idle = time.monotonic() - last
            if idle > self.timeout_s:
                self._fired = True
                self._on_stall(idle, self.name)
                return

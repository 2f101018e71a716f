"""Timing helpers for the remote-TPU (axon) transport.

``jax.block_until_ready`` can return before independent queued dispatches
have executed on the axon platform (measured: a 286-GFLOP matmul loop
"finished" in 0.04 ms/iter and a later host fetch drained a 93 s backlog —
docs/PERF.md "Timing on the remote TPU"). The single device executes in
dispatch order, so a scalar host fetch of the LAST output drains the whole
queue; timing loops should use the N-vs-2N difference so the fetch's fixed
round-trip cost cancels. This module is the one home for that recipe —
bench.py and the tools/ probes all use it.
"""

from __future__ import annotations

import time


def hard_sync(x) -> None:
    """Force remote completion: scalar host fetch of (a leaf of) ``x``."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    float(jax.numpy.sum(leaf))


def diff_time(run_n, iters: int) -> float:
    """Seconds per iteration by the N-vs-2N difference method.

    ``run_n(n)`` must execute ``n`` chained iterations and hard-sync on the
    last output (fixed sync/queue-lag costs cancel in the difference).
    """
    t0 = time.perf_counter()
    run_n(iters)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(2 * iters)
    t_long = time.perf_counter() - t0
    return max(t_long - t_short, 1e-9) / iters

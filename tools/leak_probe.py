"""Host-memory leak probe for the per-step batch upload path.

The round-4 production rehearsal (60k-step final_model run) was OOM-killed
at step ~9,300 with 130 GB anon RSS — ~14 MB leaked per training step,
i.e. one batch per step. This probe isolates which part of the
batch->device->step cycle pins host memory. Variants:

  a        fresh numpy batch + jnp.asarray + jitted consume  (the train loop)
  b        reused numpy buffer + jnp.asarray + consume       (fresh upload,
           same host allocation)
  c        device-resident batch, no per-step upload         (bench_training)
  d        fresh numpy batch, NO upload (host-only control)
  a_del    like a, but explicitly x.delete() after the step

Usage: python tools/leak_probe.py VARIANT [iters] [--cpu]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def cur_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    variant = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() \
        else 40
    mb = 14
    n = mb * 1024 * 1024 // 4
    host = np.empty(n, np.float32)

    @jax.jit
    def consume(x):
        return x.sum()

    print(f"platform={jax.devices()[0].platform} variant={variant} "
          f"iters={iters} batch={mb}MB", flush=True)

    resident = jnp.asarray(host) if variant == "c" else None
    base = None
    t0 = time.time()
    for i in range(iters):
        if variant in ("a", "d", "a_del"):
            host = np.empty(n, np.float32)
            host[::4096] = i  # touch pages
        else:
            host[::4096] = i
        if variant == "d":
            x = host
        elif variant == "c":
            x = resident
        else:
            x = jnp.asarray(host)
        if variant != "d":
            float(consume(x))  # in-order scalar fetch drains the queue
        if variant == "a_del" and x is not resident:
            x.delete()
        del x
        if i == 4:
            base = cur_rss_mb()
        if i % 10 == 9:
            print(f"iter {i + 1:4d} rss={cur_rss_mb():9.1f} MB "
                  f"({(time.time() - t0) / (i + 1):.2f} s/iter)", flush=True)
    growth = cur_rss_mb() - base
    print(f"RESULT {variant}: growth={growth:.1f} MB over {iters - 5} iters "
          f"= {growth / (iters - 5):.2f} MB/iter", flush=True)


if __name__ == "__main__":
    main()

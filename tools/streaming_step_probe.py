"""Ground-truth device-side cost of the streaming push step.

The bench's ``chained_ms`` (N-vs-2N difference over a state-chained push
loop) measures max(per-dispatch host cost, device step cost): when the
remote transport's dispatch rate degrades, the difference method faithfully
reports *dispatch* throughput, not device time (r3 captured 0.23 ms; three
r4 captures agree on 1.1-1.5 ms with an unchanged step function). This
probe settles which side moved: it traces a chained push loop with
``jax.profiler`` and sums the device-side ``jit_step`` durations — the
repo's authoritative timing source (docs/PERF.md "Timing on the remote
TPU", ground-truth rule 3).

Usage:  python tools/streaming_step_probe.py [--frames 200]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from lets_face_it_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache)

enable_persistent_compile_cache()


def device_step_durations(trace_dir: str) -> dict[str, float]:
    """Sum per-module device durations from a profiler trace (.trace.json.gz)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    totals: dict[str, list[float]] = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            trace = json.load(f)
        for ev in trace.get("traceEvents", []):
            name = ev.get("name", "")
            if ev.get("ph") == "X" and name.startswith("jit_"):
                totals.setdefault(name, []).append(ev.get("dur", 0) / 1e3)
    return {k: (len(v), float(np.sum(v)), float(np.median(v)))
            for k, v in totals.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--trace_dir", default="/tmp/streaming_probe_trace")
    args = ap.parse_args()

    from bench import build_full_model  # reuse the bench's flagship config

    hp, spec, params = build_full_model()
    from lets_face_it_tpu.sample.streaming import StreamingGenerator

    c = spec.channels
    s = hp.Data["speech_dim"]
    rng = np.random.default_rng(5)
    frames = [
        {"p2_face": jax.numpy.asarray(
             rng.standard_normal((1, c)).astype(np.float32)),
         "p1_speech": jax.numpy.asarray(
             rng.standard_normal((1, s)).astype(np.float32)),
         "p2_speech": jax.numpy.asarray(
             rng.standard_normal((1, s)).astype(np.float32))}
        for _ in range(8)
    ]
    gen = StreamingGenerator(spec, params, batch_size=1,
                             eps_std=float(hp.Infer["eps"]))
    np.asarray(gen.push(**frames[0]))      # compile + settle

    with jax.profiler.trace(args.trace_dir):
        out = None
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = gen.push(**frames[i % len(frames)])
        float(out[0, 0])
        wall = time.perf_counter() - t0

    stats = device_step_durations(args.trace_dir)
    print(f"wall for {args.frames} chained pushes: {wall * 1e3:.1f} ms "
          f"({wall / args.frames * 1e3:.3f} ms/push incl. dispatch)")
    for name, (n, total, med) in sorted(stats.items()):
        print(f"{name}: n={n} total={total:.1f} ms median={med:.3f} ms")


if __name__ == "__main__":
    main()

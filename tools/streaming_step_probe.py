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


def _is_device_lane(proc_name: str) -> bool:
    """Device timelines in JAX chrome traces are processes named like
    '/device:TPU:0' (or TFRT's 'TPU:0'); host dispatch lanes are the python
    process / thread pools. Only the device lane is authoritative."""
    return "/device:" in proc_name or proc_name.split(" ")[0].rstrip(
        ":0123456789") in ("TPU", "GPU", "CPU")


def device_step_durations(
        trace_dir: str) -> dict[tuple[str, str], tuple[int, float, float]]:
    """Per-lane ``jit_*`` durations from a profiler trace (.trace.json.gz).

    Returns ``{(process_lane, event_name): (n, total_ms, median_ms)}``.
    jit_<fn> complete-events appear on HOST lanes (dispatch cost) as well as
    the device timeline; mixing them shifts the median into the gap between
    the two populations, so events are grouped by the process lane they were
    recorded on (pid -> 'process_name' metadata) and the caller picks the
    device lane."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    proc_names: dict[int, str] = {}
    events: list[dict] = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            trace = json.load(f)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                proc_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("ph") == "X" and ev.get("name", "").startswith("jit_"):
                events.append(ev)
    totals: dict[tuple[str, str], list[float]] = {}
    for ev in events:
        lane = proc_names.get(ev.get("pid"), f"pid:{ev.get('pid')}")
        totals.setdefault((lane, ev["name"]), []).append(
            ev.get("dur", 0) / 1e3)
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
    dev = [(k, v) for k, v in stats.items() if _is_device_lane(k[0])]
    # the per-frame step is the highest-count device event; one-off compiled
    # helpers (warmup, sync fetch) legitimately have tiny n — only the step
    # event's count signals truncation
    step_event = max(dev, key=lambda kv: kv[1][0])[0] if dev else None
    for (lane, name), (n, total, med) in sorted(stats.items()):
        tag = "DEVICE" if _is_device_lane(lane) else "host"
        flag = ""
        if (lane, name) == step_event and n < args.frames:
            flag = f"  [WARN: n < --frames={args.frames}; trace truncated?]"
        print(f"[{tag}] {lane} :: {name}: n={n} total={total:.1f} ms "
              f"median={med:.3f} ms{flag}")
    if not dev:
        print("no device-lane jit_* events found — the trace has only host "
              "dispatch lanes; device time unknown (do NOT read the host "
              "median as silicon cost)")


if __name__ == "__main__":
    main()

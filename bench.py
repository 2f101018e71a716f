#!/usr/bin/env python
"""Headline benchmark: autoregressive 25-fps gesture sampling throughput per
chip on the final-model flow (K=16, GRU couplings, full conditioning stack),
plus teacher-forced training step rate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
target from BASELINE.json is >= 50x real-time generation of 25-fps sequences
per TPU v5e chip, i.e. 1250 generated frames/sec/chip. ``vs_baseline`` is
measured frames/sec divided by that 1250-frames/sec target.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

# full-f32 matmuls for parity with the fp32 PyTorch reference; the fused
# Pallas sampling kernel pins its own dot precision
jax.config.update("jax_default_matmul_precision", "highest")

from lets_face_it_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache)

enable_persistent_compile_cache()

from __graft_entry__ import _example_batch, _tiny_final_hparams

REALTIME_FPS = 25.0
TARGET_REALTIME_FACTOR = 50.0


def build_full_model():
    from lets_face_it_tpu.model import FlowSpec, init_seqglow

    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = 80       # full training envelope
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    return hp, spec, params


def bench_sampling(hp, spec, params, batch_size: int, gen_frames: int = 100,
                   iters: int | None = None, with_band: bool = False):
    from lets_face_it_tpu.model import seqglow

    start = spec.cond.longest_history
    seq_len = start + gen_frames
    data = {k: jax.numpy.asarray(v) for k, v in
            _example_batch(hp, batch_size, seq_len).items()}

    @jax.jit
    def sample(params, data, rng):
        return seqglow.sequence_sample(spec, params, data, seq_len,
                                       eps_std=hp.Infer["eps"], rng=rng)

    rng = jax.random.PRNGKey(1)
    _hard_sync(sample(params, data, rng))  # compile + drain queue

    def timed(ks):
        t0 = time.perf_counter()
        out = None
        for k in ks:
            out = sample(params, data, k)
        _hard_sync(out)
        return time.perf_counter() - t0

    if iters is None:
        # Size the N-vs-2N difference signal to ~0.75 s of device time: a
        # fixed small iter count leaves fast configs (bf16 b128 runs ~5-7
        # ms/call) with a difference the same magnitude as the remote
        # transport's RTT jitter — measured as a 1.6x-wide band at 5 iters.
        # The probe is itself a tiny 6-vs-3-call difference, so it is MORE
        # jitter-exposed than the measurement it sizes. Stalls only ADD
        # time: a stall in the long leg inflates a round, in the short leg
        # drives it negative — so drop non-positive rounds and take the min
        # of the survivors (least-inflated ≈ true cost; a deflated round
        # only errs toward more iters, i.e. a narrower band). The iters
        # floor is 20, not 5, so even a fully poisoned probe can never
        # re-widen the band to the documented 1.6x-at-5-iters failure.
        pk = list(jax.random.split(jax.random.PRNGKey(2), 6))
        rounds = [(timed(pk) - timed(pk[:3])) / 3 for _ in range(5)]
        ok = sorted(d for d in rounds if d > 0)
        per_iter = ok[0] if ok else 0.75 / 300
        iters = int(min(max(20, round(0.75 / per_iter)), 300))

    # pre-split keys: an eager fold_in per iteration would be a separate
    # host->device dispatch inside the timing loop
    keys = list(jax.random.split(rng, 3 * iters))

    # difference method: the fixed hard-sync/queue-lag cost cancels; the
    # MEDIAN over repeats rejects transport-noise outliers in either
    # direction (noise in the short leg shrinks the difference, in the long
    # leg inflates it — small batches run ~3 ms/call against ~100 ms RTTs)
    dts = []
    for _ in range(3):
        t_short = timed(keys[:iters])
        t_long = timed(keys[iters:])
        dts.append(max(t_long - t_short, 1e-9) / iters)
    dt = sorted(dts)[1]
    frames_per_sec = batch_size * gen_frames / dt
    if with_band:
        # min-max band over the 3 difference measurements: the pinned
        # README number is the median, never a lucky tail (r3 weak #3)
        fps_all = sorted(batch_size * gen_frames / d for d in dts)
        return frames_per_sec, dt, (fps_all[0], fps_all[-1])
    return frames_per_sec, dt


# the axon-transport sync + N-vs-2N difference-timing recipe lives in one
# place (rationale in its docstring and docs/PERF.md)
from lets_face_it_tpu.utils.timing import hard_sync as _hard_sync  # noqa: E402


def bench_training(hp, spec, params, batch_size: int = 256, iters: int = 5,
                   repeats: int = 1, with_band: bool = False):
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    # fresh state: the jitted step donates its input state, so never share
    # params arrays across bench runs
    optimizer = build_optimizer(hp, steps_per_epoch=100)
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    step = train_state.make_train_step(spec, hp, optimizer)
    batch = {k: jax.numpy.asarray(v) for k, v in
             _example_batch(hp, batch_size, hp.Train["seq_len"]).items()}

    state, m = step(state, batch)   # compile
    _hard_sync(m)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch)
        _hard_sync(m)
        return time.perf_counter() - t0

    dts = []
    for _ in range(repeats):
        t_short = timed(iters)
        t_long = timed(2 * iters)
        dts.append(max(t_long - t_short, 1e-9) / iters)
    dt = sorted(dts)[len(dts) // 2]
    if with_band:
        sps_all = sorted(1.0 / d for d in dts)
        return 1.0 / dt, dt, (sps_all[0], sps_all[-1])
    return 1.0 / dt, dt


def bench_training_e2e(hp, spec, params, batch_size: int = 256,
                       steps: int = 50, warm: int = 10,
                       k_dispatch: int = 1):
    """End-to-end training throughput: on-disk dataset -> native window
    gather -> prefetch worker (host->device upload inside it) -> jitted,
    chained step. This is the wall-clock number a user's training run sees;
    ``bench_training`` is the device-resident ceiling. On a remote-TPU
    transport the difference is the ~18 MB/step batch upload at b256 f32
    (docs/PERF.md "input pipeline on a remote transport").

    ``k_dispatch > 1`` measures the k-steps-per-dispatch mode
    (--steps_per_dispatch): one compiled dispatch carries k optimizer steps
    with in-jit batch gathers, so the per-step dispatch RTT amortises
    k-fold. Requires the device cache; returns None where it cannot engage
    (CPU) rather than mislabel the k=1 number."""
    import os
    from pathlib import Path

    from lets_face_it_tpu.data.prefetch import prefetch_batches
    from lets_face_it_tpu.data.synthetic import write_synthetic_dataset
    from lets_face_it_tpu.data.windows import WindowDataset
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    root = Path(os.environ.get("LFI_BENCH_DATA", "/tmp/lfi_bench_e2e"))
    data_file = root / "lets_face_it.h5"
    if not data_file.exists():
        write_synthetic_dataset(data_file, n_train_chunks=40, n_val_chunks=1,
                                n_test_chunks=1, frames_per_chunk=400, seed=0)
    ds = WindowDataset(data_file, "train", hp.Data, hp.Conditioning,
                       hp.Train["seq_len"])
    optimizer = build_optimizer(hp, steps_per_epoch=100)
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                         optimizer)
    step = train_state.make_train_step(spec, hp, optimizer)

    # same data-path policy as the train loop: device-resident gather on
    # accelerators (ship ~1 KB of indices/step), streaming host path with
    # the in-worker upload otherwise
    from lets_face_it_tpu.data.device_cache import make_device_batcher

    batcher = make_device_batcher(ds, hp)
    to_dev = lambda b: {k: jax.numpy.asarray(v)  # noqa: E731
                        for k, v in b.items()}

    def endless(method):
        # same per-epoch (seed, epoch) reseeding as train/loop.py
        epoch = 0
        while True:
            rng = np.random.default_rng([0, epoch])
            yield from method(batch_size, rng=rng, shuffle=True,
                              drop_last=True)
            epoch += 1

    if k_dispatch > 1:
        if batcher is None:
            return None
        multi = train_state.make_multi_train_step(
            spec, hp, optimizer, int(hp.Train["seq_len"]))

        def blocks():
            it = endless(ds.epoch_index_batches)
            while True:
                yield [next(it) for _ in range(k_dispatch)]

        n, n0, t0, m = 0, 0, None, None
        for sb in prefetch_batches(blocks(),
                                   transfer=batcher.get_starts_block):
            state, m = multi(state, batcher.arrays, sb)
            n += k_dispatch
            if t0 is None and n >= warm:
                _hard_sync(m)
                t0, n0 = time.perf_counter(), n
            elif t0 is not None and n - n0 >= steps:
                break
        _hard_sync(m)
        return (n - n0) / (time.perf_counter() - t0)

    # both paths dispatch the batch delivery from the prefetch worker so it
    # overlaps the step dispatch (train/loop.py does the same)
    iterator = (prefetch_batches(endless(ds.epoch_index_batches),
                                 transfer=batcher.get_batch)
                if batcher is not None
                else prefetch_batches(endless(ds.epoch_batches),
                                      transfer=to_dev))
    n, t0, m = 0, None, None
    for jb in iterator:
        state, m = step(state, jb)
        n += 1
        if n == warm:
            _hard_sync(m)
            t0 = time.perf_counter()
        if n >= warm + steps:
            break
    _hard_sync(m)
    return steps / (time.perf_counter() - t0)


def bench_batch_scaling(hp, spec, params, batch_sizes=(64, 128, 256, 512,
                                                       1024)):
    """Per-window training throughput vs batch size (VERDICT r1 item 5).

    b1024 needs the threshold-gated encoder remat (model/encoders.py) — the
    un-rematted backward requests 30.9 GiB of HBM on a 16 GiB v5e.
    """
    table = {}
    for bsz in batch_sizes:
        try:
            sps, dt = bench_training(hp, spec, params, batch_size=bsz,
                                     iters=max(2, min(5, 512 // bsz)))
            table[str(bsz)] = {"step_ms": round(dt * 1e3, 1),
                               "windows_per_sec": round(bsz * sps, 1)}
        except Exception as exc:
            table[str(bsz)] = {"error": f"{type(exc).__name__}"}
            print(f"scaling b={bsz} failed: {exc}", file=sys.stderr)
    return table


def bench_streaming(hp, spec, params, n_frames: int = 200):
    """Per-frame serving latency of the streaming duplex path (BASELINE
    config 5): a b1 StreamingGenerator driven one conversation frame at a
    time, with the generated frame fetched back to the host every frame —
    exactly a live avatar session's round trip. Returns (p50_ms, p99_ms,
    chained_ms).

    The per-frame fetch makes each iteration a full host round trip, so on
    the axon remote transport these numbers include tunnel RTT (a production
    serving host sits next to the chip; docs/PERF.md). ``chained_ms`` is the
    per-frame cost WITHOUT the per-frame fetch — median of 3 N-vs-2N
    differences over a state-chained push loop (in-order execution, so the
    difference method is valid). It measures max(per-dispatch transport
    cost, device step cost), i.e. an UPPER BOUND on the device step: when
    the tunnel's dispatch rate is the slower side (observed r4: 1.1-1.5 ms
    while the profiler pinned the device step at 0.245 ms,
    tools/streaming_step_probe.py), the chained loop is dispatch-bound and
    this reports transport throughput, not silicon."""
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
    out = gen.push(**frames[0])            # compile
    np.asarray(out)

    lat = []
    for i in range(n_frames):
        inp = frames[i % len(frames)]
        t0 = time.perf_counter()
        out = gen.push(**inp)
        float(out[0, 0])                   # blocking round trip
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    def chained(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = gen.push(**frames[i % len(frames)])
        _hard_sync(out)
        return time.perf_counter() - t0

    chained(n_frames)                      # settle the queue
    diffs = []
    for _ in range(3):                     # median rejects transport noise
        t_short = chained(n_frames)
        t_long = chained(2 * n_frames)
        diffs.append(max(t_long - t_short, 1e-9) / n_frames * 1e3)
    chained_ms = sorted(diffs)[1]
    return (float(np.percentile(lat_ms, 50)),
            float(np.percentile(lat_ms, 99)), chained_ms)


def bench_streaming_session(hp, spec, params, n_frames: int = 300,
                            fps: float = REALTIME_FPS, depth: int = 2):
    """Live-session rehearsal through the depth-2 jitter buffer (VERDICT r3
    weak #2 + r4 weak #4): frames arrive on the real 25-fps clock and play
    out ``depth`` periods later (sample/streaming.py::run_paced_session);
    backlogs drain through ``push_many`` (k frames, ONE dispatch). Reports
    per-frame completion lateness, the underrun count at the configured
    depth (a live avatar's dropped frames), and the measured minimum buffer
    depth that would have absorbed the session's worst lateness.

    Runs 3 independent sessions and reports per-metric MEDIANS: a 300-frame
    session is 12 s of wall clock, so one multi-second tunnel outage
    poisons every percentile of a single session (observed: a ~13 s stall
    turned p50 lateness from 42 ms into 8 s) — the median over sessions
    rejects it unless the transport is persistently degraded."""
    from lets_face_it_tpu.sample.streaming import (
        StreamingGenerator,
        run_paced_session,
    )

    c = spec.channels
    s = hp.Data["speech_dim"]
    rng = np.random.default_rng(6)
    frames = [
        {"p2_face": rng.standard_normal((1, c)).astype(np.float32),
         "p1_speech": rng.standard_normal((1, s)).astype(np.float32),
         "p2_speech": rng.standard_normal((1, s)).astype(np.float32)}
        for _ in range(n_frames)
    ]

    gen = StreamingGenerator(spec, params, batch_size=1,
                             eps_std=float(hp.Infer["eps"]))
    reports = []
    for i in range(3):
        gen.reset()
        reports.append(run_paced_session(gen, frames, depth=depth, fps=fps,
                                         precompile=(i == 0)))
    lat = [r.lateness_s * 1e3 for r in reports]
    return {
        "p50": float(np.median([np.percentile(x, 50) for x in lat])),
        "p99": float(np.median([np.percentile(x, 99) for x in lat])),
        "max": float(np.median([x.max() for x in lat])),
        "max_dispatch": int(max(r.max_dispatch for r in reports)),
        "underruns_at_depth": int(np.median([r.underruns for r in reports])),
        "min_buffer_depth": int(np.median([r.min_depth for r in reports])),
        "depth": depth,
    }


def bench_streaming_capacity(hp, spec, params, fps: float = REALTIME_FPS,
                             budget_ms: float = 40.0, n_iters: int = 64,
                             ladder=(64, 256, 1024, 4096, 8192)):
    """Concurrent live sessions per chip (VERDICT r4 item 5): a batched
    StreamingGenerator IS B simultaneous 25-fps sessions sharing each
    dispatch (one [B, C] frame step serves every session), so serving
    capacity per chip = the largest B whose per-frame serving cost stays
    inside the 40 ms frame budget.

    The per-frame cost is measured with the chained N-vs-2N difference
    (state-chained pushes on pre-staged device inputs, one hard sync at the
    end — the same method as ``streaming_frame_device_ms_chained``): it
    covers dispatch + device step, which is what a serving host co-located
    with the chip pays. It deliberately EXCLUDES this development tunnel's
    per-dispatch result fetch — fetching a [1024, 56] frame block is ~µs
    over PCIe-class links but tens of ms over the remote tunnel, and
    measuring the tunnel would report transport bandwidth, not chip
    capacity (docs/PERF.md "Paced playout + staged streams").

    Returns ``(sessions, table)``: the largest passing rung (0 if even the
    first fails) and per-rung chained ms/frame."""
    from lets_face_it_tpu.sample.streaming import StreamingGenerator

    c = spec.channels
    s = hp.Data["speech_dim"]
    table = {}
    best = 0
    for b in ladder:
        rng = np.random.default_rng(b)
        # 8 pre-staged device input frames, cycled — zero upload per push
        frames_dev = [
            {"p2_face": jax.numpy.asarray(
                 rng.standard_normal((b, c)).astype(np.float32)),
             "p1_speech": jax.numpy.asarray(
                 rng.standard_normal((b, s)).astype(np.float32)),
             "p2_speech": jax.numpy.asarray(
                 rng.standard_normal((b, s)).astype(np.float32))}
            for _ in range(8)
        ]
        used_path = {}

        def measure(use_fused):
            gen = StreamingGenerator(spec, params, batch_size=b,
                                     eps_std=float(hp.Infer["eps"]),
                                     use_fused=use_fused)
            # record what the auto gate actually picked (past
            # FRAME_FUSED_MAX_SEGMENTS segments it serves on the XLA step)
            used_path["fused"] = gen._fused_weights is not None
            _hard_sync(gen.push(**frames_dev[0]))      # compile + drain

            def chained(m):
                t0 = time.perf_counter()
                out = None
                for i in range(m):
                    out = gen.push(**frames_dev[i % 8])
                _hard_sync(out)
                return time.perf_counter() - t0

            chained(n_iters)                           # settle the queue
            diffs = []
            for _ in range(3):                         # median rejects noise
                t_short = chained(n_iters)
                t_long = chained(2 * n_iters)
                diffs.append(max(t_long - t_short, 1e-9) / n_iters * 1e3)
            return sorted(diffs)[1]

        try:
            per_frame_ms = measure(None)
            path = "auto(fused)" if used_path.get("fused") else "auto(xla)"
        except Exception as exc:
            # the fused path serves any batch (one 512-row kernel call per
            # segment, frame_rev_fused_chunked — measured 2.3x XLA at b1024,
            # 1.07x at b4096, tools/chunked_frame_probe.py); keep the XLA
            # step as a safety net for configs outside the kernel envelope
            print(f"capacity b={b}: fused path failed "
                  f"({type(exc).__name__}); retrying on the XLA step",
                  file=sys.stderr)
            try:
                per_frame_ms, path = measure(False), "xla"
            except Exception as exc2:
                table[str(b)] = {"error": type(exc2).__name__}
                break
        table[str(b)] = {"chained_ms_per_frame": round(per_frame_ms, 3),
                         "path": path}
        if per_frame_ms <= budget_ms:
            best = b
        else:
            break
    return best, table


def nll_parity_check(hp, spec, params):
    """Relative NLL error vs the independent float64 torch implementation."""
    try:
        from lets_face_it_tpu.model import seqglow
        from lets_face_it_tpu.sample import export_state_dict
        from lets_face_it_tpu.sample.torch_ref import torch_sequence_nll

        batch = _example_batch(hp, 2, hp.Train["seq_len"], seed=7)
        _, loss_jax, _ = seqglow.sequence_nll(spec, params, batch)
        loss_torch = torch_sequence_nll(export_state_dict(params, spec), hp,
                                        batch)
        return abs(float(loss_jax) - loss_torch) / max(abs(loss_torch), 1e-9)
    except Exception as exc:  # torch may be absent in some images
        print(f"nll parity check skipped: {exc}", file=sys.stderr)
        return None


def wait_for_accelerator(max_wait_s: float = 1800.0) -> bool:
    """Wait out a remote-transport blip before touching the backend
    in-process.

    During a tunnel outage the first device use either hangs forever or
    raises `Unable to initialize backend 'axon': UNAVAILABLE` (both
    observed r4, outages of 1-3+ h) — and once the in-process client is
    poisoned, no retry recovers it. So probe from a SUBPROCESS with a
    timeout (immune to both failure modes) and only init in-process after
    a probe succeeds. Returns False when the deadline passes."""
    import subprocess

    # the probe honors JAX_PLATFORMS=cpu at config level (env-only forcing
    # itself hangs during an outage — CLAUDE.md "Forcing CPU")
    probe = ("import os, jax\n"
             "if os.environ.get('JAX_PLATFORMS', '').lower() == 'cpu':\n"
             "    jax.config.update('jax_platforms', 'cpu')\n"
             "import jax.numpy as jnp\n"
             "float(jnp.ones(2).sum())\n")
    deadline = time.time() + max_wait_s
    attempt = 0
    fast_failures = 0
    while True:
        attempt += 1
        why = "probe timed out (tunnel hang)"
        try:
            t0 = time.time()
            r = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True)
            if r.returncode == 0:
                return True
            err = r.stderr.decode(errors="replace")
            tail = err.strip().splitlines()
            why = "probe exited %d: %s" % (
                r.returncode, tail[-1] if tail else "<no stderr>")
            # An instant nonzero exit is usually a deterministic failure
            # (broken install, bad JAX_PLATFORMS value), not outage
            # weather — retrying it for 30 min with the diagnostic
            # swallowed is the worst of both. Three in a row: give up
            # loudly. EXCEPT transport-shaped errors: an outage can also
            # present as an instant backend-init failure (UNAVAILABLE /
            # connection refused), and those we do want to wait out.
            weather = any(s in err for s in (
                "UNAVAILABLE", "DEADLINE_EXCEEDED", "Connection refused",
                "failed to connect", "Socket closed", "RESOURCE_EXHAUSTED"))
            fast = time.time() - t0 < 20 and not weather
            fast_failures = fast_failures + 1 if fast else 0
            if fast_failures >= 3:
                print("probe fails instantly and deterministically; last "
                      "stderr:\n" + err, file=sys.stderr, flush=True)
                return False
        except subprocess.TimeoutExpired:
            fast_failures = 0
        if time.time() > deadline:
            return False
        print(f"accelerator unreachable (probe {attempt}: {why}); retrying "
              f"in 30 s ({int(deadline - time.time())} s left)",
              file=sys.stderr, flush=True)
        time.sleep(30)


def main():
    scaling = "--scaling" in sys.argv
    if not wait_for_accelerator():
        sys.exit("accelerator unreachable for 30 min — aborting the bench "
                 "rather than hanging in backend init (docs/PERF.md, tunnel "
                 "outage mode)")
    hp, spec, params = build_full_model()
    dev = jax.devices()[0]
    print(f"benchmarking on {dev.device_kind} ({dev.platform})", file=sys.stderr)

    parity = nll_parity_check(hp, spec, params)
    fps_b1, _ = bench_sampling(hp, spec, params, batch_size=1)
    # B=128 is the measured per-chip sampling peak with the whole-sequence
    # fused kernel (tools/sampling_probe.py r2: 432k/462k/437k/401k f/s at
    # B=64/128/256/512 f32-highest; same shape at bf16)
    fps_batch, _, band_batch = bench_sampling(hp, spec, params,
                                              batch_size=128, with_band=True)
    stream_p50, stream_p99, stream_chained = bench_streaming(hp, spec, params)
    sess = bench_streaming_session(hp, spec, params)
    try:
        capacity, capacity_table = bench_streaming_capacity(hp, spec, params)
    except Exception as exc:
        print(f"streaming capacity bench failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        capacity, capacity_table = None, None
    train_sps, train_dt, band_train = bench_training(hp, spec, params,
                                                     repeats=3,
                                                     with_band=True)
    try:
        sps_1024, _ = bench_training(hp, spec, params, batch_size=1024,
                                     iters=2)
    except Exception as exc:  # smaller accelerators: keep the headline JSON
        print(f"b1024 training bench failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        sps_1024 = None
    try:
        train_sps_e2e = bench_training_e2e(hp, spec, params)
    except Exception as exc:
        print(f"e2e training bench failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        train_sps_e2e = None
    try:
        train_sps_e2e_k8 = bench_training_e2e(hp, spec, params, k_dispatch=8)
    except Exception as exc:
        print(f"e2e k8 training bench failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        train_sps_e2e_k8 = None
    batch_table = (bench_batch_scaling(hp, spec, params) if scaling else None)
    # production bf16 rows: the fused kernels follow the ambient matmul
    # precision (single-pass MXU dots here), measured 1.26x over XLA-bf16
    with jax.default_matmul_precision("default"):
        train_sps_fast, _, band_train_fast = bench_training(
            hp, spec, params, repeats=3, with_band=True)
        fps_b1_fast, _ = bench_sampling(hp, spec, params, batch_size=1)
        fps_batch_fast, _, band_batch_fast = bench_sampling(
            hp, spec, params, batch_size=128, with_band=True)

    target = REALTIME_FPS * TARGET_REALTIME_FACTOR
    result = {
        "metric": "gesture_frames_per_sec_per_chip_25fps_sampling",
        "value": round(fps_batch, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps_batch / target, 3),
        "sampling_batch": 128,
        "sampling_fps_batch1": round(fps_b1, 1),
        "realtime_factor_batch1": round(fps_b1 / REALTIME_FPS, 2),
        "streaming_frame_latency_ms_p50": round(stream_p50, 3),
        "streaming_frame_latency_ms_p99": round(stream_p99, 3),
        "streaming_frame_device_ms_chained": round(stream_chained, 3),
        # live-clock session with push_many catch-up through the depth-2
        # jitter buffer (run_paced_session): completion lateness vs the
        # 25-fps arrivals, dropped frames at depth 2, and the measured
        # minimum depth that absorbs the session's worst lateness
        "streaming_session_lateness_ms_p50": round(sess["p50"], 3),
        "streaming_session_lateness_ms_p99": round(sess["p99"], 3),
        "streaming_session_lateness_ms_max": round(sess["max"], 3),
        "streaming_session_max_catchup_dispatch": sess["max_dispatch"],
        "streaming_session_underruns_at_depth2": sess["underruns_at_depth"],
        "streaming_session_min_buffer_depth": sess["min_buffer_depth"],
        # concurrent 25-fps sessions one chip serves with the per-frame
        # serving cost (chained dispatch + device step, the co-located-host
        # number) inside the 40 ms budget; batched StreamingGenerator
        "streaming_sessions_per_chip_within_frame_budget": capacity,
        # frames the 25-fps budget (40 ms) covers at the p50 round trip
        "streaming_realtime_headroom": round(
            (1e3 / REALTIME_FPS) / max(stream_p50, 1e-9), 1),
        "train_steps_per_sec_b256_T80": round(train_sps, 3),
        # wall-clock including the on-disk input pipeline + batch upload
        "train_steps_per_sec_b256_e2e": (round(train_sps_e2e, 3)
                                         if train_sps_e2e is not None
                                         else None),
        # --steps_per_dispatch 8: k optimizer steps per compiled dispatch
        # (in-jit gathers from the HBM-resident split) — the transport-
        # jitter-immune production mode
        "train_steps_per_sec_b256_e2e_k8": (round(train_sps_e2e_k8, 3)
                                            if train_sps_e2e_k8 is not None
                                            else None),
        "train_steps_per_sec_b256_T80_bf16matmul": round(train_sps_fast, 3),
        "sampling_fps_batch1_bf16matmul": round(fps_b1_fast, 1),
        "sampling_fps_batched_bf16matmul": round(fps_batch_fast, 1),
        "train_windows_per_sec": round(train_sps * 256, 1),
        "train_windows_per_sec_b1024": (round(sps_1024 * 1024, 1)
                                        if sps_1024 is not None else None),
        "nll_parity_rel_err_vs_torch_f64": (round(parity, 8)
                                            if parity is not None else None),
        "device": f"{dev.device_kind}",
        # min-max bands over the median-of-3 headline measurements: the
        # README pin renders these, and the suite asserts the pinned value
        # lies inside the newest capture's band (r3 weak #3)
        "bands": {
            "value": [round(band_batch[0], 1), round(band_batch[1], 1)],
            "sampling_fps_batched_bf16matmul": [
                round(band_batch_fast[0], 1), round(band_batch_fast[1], 1)],
            "train_steps_per_sec_b256_T80": [
                round(band_train[0], 3), round(band_train[1], 3)],
            "train_steps_per_sec_b256_T80_bf16matmul": [
                round(band_train_fast[0], 3), round(band_train_fast[1], 3)],
        },
    }
    if capacity_table is not None:
        result["streaming_capacity_ladder"] = capacity_table
    if batch_table is not None:
        result["batch_scaling"] = batch_table
    print(json.dumps(result))


if __name__ == "__main__":
    main()

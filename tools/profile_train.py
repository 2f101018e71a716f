"""Profile the training step and print a roofline analysis.

Captures a ``jax.profiler`` trace of the full jitted training step
(b256 x T80 final-model flow), parses the Chrome-trace device timeline into
an op-category breakdown, and combines it with XLA ``cost_analysis`` FLOP /
byte counts into a roofline verdict (VERDICT round-1 item 4). Findings are
written up in docs/PERF.md.

Usage: python tools/profile_train.py [--batch 256] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import jax

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from __graft_entry__ import _example_batch, _tiny_final_hparams  # noqa: E402

# TPU v5e (v5 lite) per-chip speed-of-light numbers
V5E_BF16_FLOPS = 197e12
V5E_HBM_GBPS = 819e9


def build(batch_size: int):
    from lets_face_it_tpu.model import FlowSpec
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = 80
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, steps_per_epoch=100)
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    step = train_state.make_train_step(spec, hp, optimizer)
    batch = {k: jax.numpy.asarray(v) for k, v in
             _example_batch(hp, batch_size, hp.Train["seq_len"]).items()}
    return hp, spec, optimizer, state, step, batch


def categorize(name: str) -> str:
    n = name.lower()
    if n.startswith("while"):
        return "scan loops (while)"
    if "convert" in n:
        return "dtype converts"
    if any(k in n for k in ("dot", "matmul", "conv")):
        return "matmul (MXU)"
    if any(k in n for k in ("dynamic-update-slice", "dynamic-slice", "slice",
                            "gather", "scatter", "concatenate", "transpose",
                            "reshape", "copy", "pad", "reverse")):
        return "layout/data movement"
    if any(k in n for k in ("reduce", "sum", "cumsum")):
        return "reductions"
    if any(k in n for k in ("fusion", "loop", "while", "add", "multiply",
                            "tanh", "logistic", "select", "exponential",
                            "rsqrt", "subtract", "divide")):
        return "fused elementwise"
    if any(k in n for k in ("rng", "random")):
        return "rng"
    if any(k in n for k in ("infeed", "outfeed", "send", "recv", "copy-start",
                            "copy-done")):
        return "host transfer"
    return "other"


def parse_trace(trace_dir: Path):
    """Aggregate device-track op durations from the Chrome trace."""
    files = glob.glob(str(trace_dir / "**" / "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])

    # keep only "XLA Ops" threads (leaf op events) — module-level and
    # step-marker tracks would double-count their children
    op_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname = ev.get("args", {}).get("name", "")
            if "xla ops" in tname.lower():
                op_tids.add((ev["pid"], ev["tid"]))

    per_cat = defaultdict(float)
    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        name, dur = ev.get("name", ""), ev.get("dur", 0)  # dur in us
        if not name:
            continue
        per_cat[categorize(name)] += dur
        per_op[name] += dur
        total += dur
    return per_cat, per_op, total


from lets_face_it_tpu.utils.timing import hard_sync as _hard_sync  # noqa: E402


def time_fn(fn, *fn_args, iters=5):
    _hard_sync(fn(*fn_args))  # compile + drain

    def timed(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*fn_args)
        _hard_sync(out)
        return time.perf_counter() - t0

    # N-vs-2N difference cancels the fixed sync/queue-lag cost
    return max(timed(2 * iters) - timed(iters), 1e-9) / iters


def component_ablations(hp, spec, state, batch, iters=5):
    """Attribute step time: encoders vs flow time-scan, fwd vs fwd+bwd."""
    import jax.numpy as jnp

    from lets_face_it_tpu.model import encoders, flow, seqglow

    params = state.params
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    x = jb["p1_face"]
    start = spec.cond.longest_history
    times = jnp.arange(start, x.shape[1])

    def enc_loss(p):
        cond = encoders.encode_conditioning(spec.cond, p.encoder, jb, x, times)
        return jnp.sum(cond * cond)

    def full_loss(p):
        _, loss, _ = seqglow.sequence_nll(spec, p, jb)
        return loss

    cond_all = jax.jit(lambda p: encoders.encode_conditioning(
        spec.cond, p.encoder, jb, x, times))(params)
    xs = jnp.moveaxis(x[:, start:], 1, 0)

    def flow_loss(p, cond_all):
        cond_projs = flow.project_cond_frames(p.flow, cond_all)
        states0 = flow.init_flow_states(spec, x.shape[0], x.dtype)

        def step(states, inp):
            x_t, proj_t = inp
            z, logdet, states = flow.frame_fwd(spec, p.flow, x_t, None,
                                               states, cond_projs=proj_t)
            return states, logdet
        _, lds = jax.lax.scan(step, states0, (xs, cond_projs))
        return jnp.sum(lds)

    def with_grad(loss_fn):
        # the grad must feed the output or XLA dead-code-eliminates the
        # entire backward pass
        def f(p, *rest):
            val, grads = jax.value_and_grad(loss_fn)(p, *rest)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree.leaves(grads))
            return val + 0.0 * gsum
        return f

    rows = {
        "forward only (full nll)": time_fn(jax.jit(full_loss), params,
                                           iters=iters),
        "fwd+bwd (full nll)": time_fn(jax.jit(with_grad(full_loss)), params,
                                      iters=iters),
        "encoders fwd": time_fn(jax.jit(enc_loss), params, iters=iters),
        "encoders fwd+bwd": time_fn(jax.jit(with_grad(enc_loss)), params,
                                    iters=iters),
        "flow time-scan fwd (cond precomputed)": time_fn(
            jax.jit(flow_loss), params, cond_all, iters=iters),
        "flow time-scan fwd+bwd": time_fn(jax.jit(with_grad(flow_loss)),
                                          params, cond_all, iters=iters),
    }
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace-dir", default="/tmp/lfi_train_trace")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    hp, spec, optimizer, state, step, batch = build(args.batch)

    t0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m)
    print(f"compile: {time.perf_counter() - t0:.0f}s")

    # wall-clock step time
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    step_s = (time.perf_counter() - t0) / args.iters
    print(f"step: {step_s*1e3:.1f} ms  ({args.batch/step_s:.0f} windows/s)")

    # XLA cost analysis (counts every HLO op once per execution)
    try:
        from lets_face_it_tpu.train import state as train_state  # noqa: F401
        compiled = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                           else step).lower(state, batch).compile()
        ca = compiled.cost_analysis() or {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        print(f"cost_analysis: {flops/1e9:.1f} GFLOP, "
              f"{nbytes/1e9:.2f} GB accessed / step")
        if flops and nbytes:
            print(f"arithmetic intensity: {flops/nbytes:.2f} FLOP/byte "
                  f"(v5e ridge @ f32-highest ~{V5E_BF16_FLOPS/3/V5E_HBM_GBPS:.0f})")
            print(f"achieved: {flops/step_s/1e12:.2f} TFLOP/s "
                  f"({100*flops/step_s/V5E_BF16_FLOPS:.1f}% of bf16 peak), "
                  f"{nbytes/step_s/1e9:.0f} GB/s "
                  f"({100*nbytes/step_s/V5E_HBM_GBPS:.1f}% of HBM peak)")
    except Exception as exc:
        print(f"cost_analysis unavailable: {exc}")

    print("\ncomponent ablations (compile each, then time):")
    for name, secs in component_ablations(hp, spec, state, batch,
                                          iters=args.iters).items():
        print(f"  {name:40s} {secs*1e3:8.1f} ms")

    # profiler trace
    trace_dir = Path(args.trace_dir)
    with jax.profiler.trace(str(trace_dir)):
        for _ in range(3):
            state, m = step(state, batch)
        jax.block_until_ready(m)
    parsed = parse_trace(trace_dir)
    if parsed is None:
        print("no trace captured")
        return
    per_cat, per_op, total = parsed
    print(f"\ndevice time by category (3 steps, {total/1e3:.1f} ms total):")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {us/1e3:9.2f} ms  {100*us/total:5.1f}%")
    print("\ntop 15 ops:")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()

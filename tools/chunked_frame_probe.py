"""Compiled-on-TPU validation of the per-frame fused kernel's big-batch
serving path (single raised-VMEM call up to FRAME_FUSED_MAX_BATCH, the
``frame_rev_fused_chunked`` segment loop beyond it).

Envelope history (round 5): the first 512-row guess — a ~21.6 KB/row linear
extrapolation from the b1024 OOM under Mosaic's DEFAULT 16 MB scoped-VMEM
budget — was refuted by this probe's first run: a 512-row call asks for
18.29 MB. Raising the kernel's ``vmem_limit_bytes`` to 48 MiB
(``_FRAME_VMEM_LIMIT``, the cap the training and whole-sequence kernels
already use) rescued exactly the 512-row rung; b1024+ crashes the Mosaic
compiler even at 48 MiB (``--envelope`` mode AOT-compiles the batch ladder
and prints pass/fail per rung — measured OK at 512, FAIL 1024-8192).

Three checks per batch rung, per the Pallas invariant (CLAUDE.md):
  1. values — the fused path must match the XLA ``frame_rev`` step at
     f32-highest (same tolerance class as tests/test_pallas_flow);
  2. envelope — does ONE kernel call compile at this batch, and does the
     auto path (``frame_rev_fused_chunked`` at the default chunk) compile;
  3. speed — chained per-frame cost (state-chained pushes, N-vs-2N
     difference, docs/PERF.md) of the fused auto path vs the XLA step,
     i.e. what StreamingGenerator's auto path picks vs its fallback.

Usage: python tools/chunked_frame_probe.py [--envelope] [b1 b2 ...]
       (default rungs 1024 4096)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lets_face_it_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache)
from lets_face_it_tpu.utils.timing import diff_time, hard_sync  # noqa: E402

enable_persistent_compile_cache()

from bench import build_full_model  # noqa: E402
from lets_face_it_tpu.model import flow  # noqa: E402
from lets_face_it_tpu.ops import pallas_flow  # noqa: E402


def _inputs(spec, params, b: int):
    rng = np.random.default_rng(b)
    z = jnp.asarray(rng.standard_normal((b, spec.channels)), jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((b, spec.cond.feature_dim)), jnp.float32)
    states = jnp.asarray(
        rng.standard_normal((spec.n_steps, b, spec.hidden_channels)) * 0.1,
        jnp.float32)
    weights = pallas_flow.prepare_sampling_weights(spec, params.flow)
    return z, cond, states, weights


def check_envelope(spec, params, sizes):
    """AOT-compile a single kernel call per rung: pass or scoped-VMEM OOM.
    Compile failures are fast (~min); this is the cheap envelope finder."""
    for b in sizes:
        z, cond, states, weights = _inputs(spec, params, b)
        proj = flow._project_cond(params.flow, cond)

        def single(z, proj, states):
            return pallas_flow.frame_rev_fused(spec, weights, z, proj, states)

        try:
            jax.jit(single).lower(z, proj, states).compile()
            print(f"b={b:5d}  single-call compile: OK", flush=True)
        except Exception as exc:
            msg = str(exc).splitlines()[0][:140]
            print(f"b={b:5d}  single-call compile: FAIL "
                  f"({type(exc).__name__}: {msg})", flush=True)


def probe(spec, params, b: int, iters: int = 64):
    z, cond, states, weights = _inputs(spec, params, b)

    @jax.jit
    def step_fused(z, states):
        proj = flow._project_cond(params.flow, cond)
        return pallas_flow.frame_rev_fused_chunked(
            spec, weights, z, proj, states)

    @jax.jit
    def step_xla(z, states):
        x, _, st = flow.frame_rev(spec, params.flow, z, cond, states)
        return x, st

    x_f, st_f = step_fused(z, states)
    x_x, st_x = step_xla(z, states)
    hard_sync((x_f, x_x))
    dx = float(jnp.max(jnp.abs(x_f - x_x)))
    dst = float(jnp.max(jnp.abs(st_f - st_x)))
    print(f"b={b:5d}  value check: max|dx|={dx:.2e} max|dstate|={dst:.2e}",
          flush=True)

    def timed(step):
        # state-chained: frame t's states feed frame t+1, like serving
        def run_n(n):
            zz, st = z, states
            out = None
            for _ in range(n):
                out, st = step(zz, st)
            hard_sync(out)
        run_n(iters)  # settle the queue post-compile
        times = [diff_time(run_n, iters) for _ in range(3)]
        return sorted(times)[1] * 1e3

    ms_f = timed(step_fused)
    ms_x = timed(step_xla)
    n_calls = -(-b // pallas_flow.FRAME_FUSED_MAX_BATCH)
    print(f"b={b:5d}  chained ms/frame: fused ({n_calls} call(s)) "
          f"{ms_f:7.3f}  xla-step {ms_x:7.3f}  "
          f"speedup {ms_x / ms_f:0.2f}x", flush=True)
    return dx, ms_f, ms_x


if __name__ == "__main__":
    argv = sys.argv[1:]
    envelope = "--envelope" in argv
    sizes = [int(a) for a in argv if not a.startswith("--")]
    hp, spec, params = build_full_model()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if envelope:
        check_envelope(spec, params, sizes or [512, 1024, 2048, 4096, 8192])
    else:
        for b in sizes or [1024, 4096]:
            probe(spec, params, b)

"""Batch-scaling probe for the training step on the attached accelerator.

Measures per-window throughput at several batch sizes and prints a table;
used to root-cause the b1024 remote-compile failure and to source
``bench.py --scaling``.

Usage: python tools/scaling_probe.py [b1 b2 ...]
"""

import sys
import time
import traceback

import jax

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, ".")
from __graft_entry__ import _example_batch, _tiny_final_hparams  # noqa: E402


def probe(batch_sizes):
    from lets_face_it_tpu.model import FlowSpec
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = 80
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, steps_per_epoch=100)
    step = train_state.make_train_step(spec, hp, optimizer)

    rows = []
    for bsz in batch_sizes:
        try:
            state = train_state.init_train_state(
                jax.random.PRNGKey(0), spec, optimizer)
            batch = {k: jax.numpy.asarray(v) for k, v in
                     _example_batch(hp, bsz, hp.Train["seq_len"]).items()}
            t0 = time.perf_counter()
            state, m = step(state, batch)
            jax.block_until_ready(m)
            compile_s = time.perf_counter() - t0
            iters = max(2, min(6, 512 // bsz))
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / iters
            rows.append((bsz, dt, bsz / dt, compile_s, "ok"))
            print(f"b={bsz:5d}  step={dt*1e3:8.1f} ms  windows/s={bsz/dt:8.1f}"
                  f"  compile={compile_s:.0f}s", flush=True)
        except Exception as exc:
            rows.append((bsz, None, None, None, f"{type(exc).__name__}"))
            print(f"b={bsz:5d}  FAILED: {type(exc).__name__}: {exc}",
                  flush=True)
            traceback.print_exc()
    return rows


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    probe(sizes)

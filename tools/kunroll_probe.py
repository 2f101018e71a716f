"""Training-step time vs the K-step flow-scan unroll factor (step_unroll).

step_unroll=4 was tuned on the sampling path (round 1); this sweeps it for
the training step. Usage: python tools/kunroll_probe.py [factors...]
"""

import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, ".")

from __graft_entry__ import _example_batch, _tiny_final_hparams  # noqa: E402


def run(unroll: int):
    import jax.numpy as jnp

    from lets_face_it_tpu.model import FlowSpec
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = 80
    hp.step_unroll = unroll
    spec = FlowSpec.build(hp)
    assert spec.step_unroll == unroll, spec.step_unroll

    optimizer = build_optimizer(hp, steps_per_epoch=100)
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                         optimizer)
    step_fn = train_state.make_train_step(spec, hp, optimizer)
    batch = {k: jnp.asarray(v) for k, v in _example_batch(hp, 256, 80).items()}

    t0 = time.perf_counter()
    state, m = step_fn(state, batch)
    jax.block_until_ready(m)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step_fn(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / 5
    print(f"step_unroll={unroll:2d}: step={dt*1e3:6.1f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for u in [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]:
        run(u)

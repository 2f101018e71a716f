"""Measure training-step time vs time-scan unroll factor (experiment for
docs/PERF.md). Patches seqglow's time scan via an env knob and times the
full train step at b256 T80."""

import os
import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, ".")

from __graft_entry__ import _example_batch, _tiny_final_hparams  # noqa: E402


def run(unroll: int):
    import jax.numpy as jnp

    from lets_face_it_tpu.model import FlowSpec, seqglow
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    # monkeypatch the time scan's unroll
    orig_scan = jax.lax.scan
    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = 80
    spec = FlowSpec.build(hp)

    import lets_face_it_tpu.model.seqglow as sg

    def patched_sequence_nll(spec_, params, batch, *, rng=None,
                             training=False, collect_scales=False):
        from lets_face_it_tpu.core import ops
        from lets_face_it_tpu.model import encoders, flow

        x = batch["p1_face"]
        b, t, _ = x.shape
        start = spec_.cond.longest_history
        times = jnp.arange(start, t)
        cond_all = encoders.encode_conditioning(
            spec_.cond, params.encoder, batch, x, times, rng=rng,
            training=training)
        xs = jnp.moveaxis(x[:, start:], 1, 0)
        cond_projs = flow.project_cond_frames(params.flow, cond_all)
        states0 = flow.init_flow_states(spec_, b, x.dtype)

        def step(states, inp):
            x_t, proj_t = inp
            z, logdet, states = flow.frame_fwd(spec_, params.flow, x_t, None,
                                               states, cond_projs=proj_t)
            nll = sg.nll_from_objective(logdet + ops.gaussian_logp(z))
            return states, (z, nll)

        _, (z_seq, losses) = jax.lax.scan(step, states0, (xs, cond_projs),
                                          unroll=unroll)
        return z_seq, jnp.mean(losses), losses

    sg_orig = sg.sequence_nll
    sg.sequence_nll = patched_sequence_nll
    train_state.seqglow.sequence_nll = patched_sequence_nll
    try:
        optimizer = build_optimizer(hp, steps_per_epoch=100)
        state = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                             optimizer)
        step_fn = train_state.make_train_step(spec, hp, optimizer)
        batch = {k: jnp.asarray(v) for k, v in
                 _example_batch(hp, 256, 80).items()}
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        jax.block_until_ready(m)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            state, m = step_fn(state, batch)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 5
        print(f"unroll={unroll}: step={dt*1e3:.1f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)
    finally:
        sg.sequence_nll = sg_orig
        train_state.seqglow.sequence_nll = sg_orig


if __name__ == "__main__":
    for u in [int(a) for a in sys.argv[1:]] or [1, 2, 4]:
        run(u)

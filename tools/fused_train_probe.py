"""On-TPU validation + A/B timing of the fused training-path flow kernels.

1. Correctness compiled (not interpret): sequence_nll value and full
   parameter gradients, fused vs XLA, on the final-model flow.
2. Timing: the full train step (fwd + bwd + Adam + derange select) at
   b256 x T80, XLA path vs fused path. The step chains donated state, so a
   simple chained loop times correctly on the axon remote transport
   (docs/PERF.md).

Usage: python tools/fused_train_probe.py [batch] [seq_len] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, ".")
from __graft_entry__ import _example_batch, _tiny_final_hparams  # noqa: E402


def build(batch_size, seq_len):
    from lets_face_it_tpu.model import FlowSpec
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer

    hp = _tiny_final_hparams()
    hp.Train["seq_len"] = seq_len
    spec = FlowSpec.build(hp)
    optimizer = build_optimizer(hp, steps_per_epoch=100)
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    batch = {k: jnp.asarray(v) for k, v in
             _example_batch(hp, batch_size, seq_len).items()}
    return hp, spec, optimizer, state, batch


def check_correctness(spec, params, batch):
    from lets_face_it_tpu.model import seqglow

    def nll(params, use_fused):
        _, loss, _ = seqglow.sequence_nll(spec, params, batch,
                                          use_fused=use_fused)
        return loss

    ref, ref_g = jax.jit(jax.value_and_grad(nll),
                         static_argnums=1)(params, False)
    got, got_g = jax.jit(jax.value_and_grad(nll),
                         static_argnums=1)(params, True)
    ref, got = float(ref), float(got)
    print(f"nll xla={ref:.6f} fused={got:.6f} rel={abs(got-ref)/abs(ref):.2e}")
    worst = 0.0
    for g_ref, g_got in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        g_ref, g_got = np.asarray(g_ref), np.asarray(g_got)
        denom = np.maximum(np.abs(g_ref).max(), 1e-6)
        worst = max(worst, float(np.abs(g_got - g_ref).max() / denom))
    print(f"worst grad rel-to-max deviation: {worst:.2e}")
    assert abs(got - ref) / abs(ref) < 1e-5, "fused NLL diverges"
    assert worst < 1e-3, "fused gradients diverge"


def time_step(hp, spec, optimizer, batch, iters):
    from lets_face_it_tpu.train import state as train_state

    # fresh state per config: the jitted step donates its state argument
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                         optimizer)
    step = train_state.make_train_step(spec, hp, optimizer)
    t0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def small_tile_sweep(seq_len: int, iters: int):
    """Validate + time the compiled kernels at the small per-shard batches a
    data-parallel mesh produces (VERDICT r2 item 6): the final model's b256
    shards to 32 rows on a v5e-8, 64 on a v5e-4. Correctness (values + full
    gradients vs XLA) and fused-vs-XLA step time at each batch."""
    from lets_face_it_tpu.model import FlowSpec
    from lets_face_it_tpu.ops import pallas_train

    for bsz in (32, 64, 128):
        hp, spec, optimizer, state, batch = build(bsz, seq_len)
        assert pallas_train.train_fused_supported(spec, bsz), bsz
        print(f"— per-shard batch {bsz}: compiled correctness —", flush=True)
        check_correctness(spec, state.params, batch)
        pallas_train.ENABLED = False
        base, _ = time_step(hp, spec, optimizer, batch, iters)
        pallas_train.ENABLED = True
        dt, compile_s = time_step(hp, spec, optimizer, batch, iters)
        print(f"b{bsz}: xla={base*1e3:7.1f} ms fused={dt*1e3:7.1f} ms "
              f"speedup={base/dt:.2f}x (tile={min(bsz, 256)}, "
              f"compile={compile_s:.0f}s)", flush=True)


def main():
    from lets_face_it_tpu.ops import pallas_train

    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 80
        iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        dev = jax.devices()[0]
        print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
        small_tile_sweep(seq_len, iters)
        return

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    hp, spec, optimizer, state, batch = build(bsz, seq_len)
    print("— compiled correctness (b128, fused vs XLA) —", flush=True)
    _, _, _, state_small, batch_small = build(128, 40)
    check_correctness(spec, state_small.params, batch_small)

    print(f"— timing: full train step b{bsz} T{seq_len} —", flush=True)
    pallas_train.ENABLED = False
    base, compile_s = time_step(hp, spec, optimizer, batch, iters)
    print(f"xla:              step={base*1e3:8.1f} ms "
          f"windows/s={bsz/base:8.1f} compile={compile_s:.0f}s", flush=True)
    pallas_train.ENABLED = True
    best = base
    for bt_fwd, bt_bwd in ((128, 64), (256, 128), (256, 256)):
        if bsz % bt_fwd and bt_fwd < bsz:
            continue
        pallas_train.BT_FWD, pallas_train.BT_BWD = bt_fwd, bt_bwd
        try:
            dt, compile_s = time_step(hp, spec, optimizer, batch, iters)
        except Exception as exc:
            print(f"fused bt=({bt_fwd},{bt_bwd}): FAILED "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
            continue
        best = min(best, dt)
        print(f"fused bt=({bt_fwd},{bt_bwd}): step={dt*1e3:8.1f} ms "
              f"windows/s={bsz/dt:8.1f} compile={compile_s:.0f}s "
              f"speedup={base/dt:.2f}x", flush=True)

    print(f"— bf16-matmul (production) path b{bsz} T{seq_len} —", flush=True)
    pallas_train.BT_FWD, pallas_train.BT_BWD = 256, 128
    with jax.default_matmul_precision("default"):
        pallas_train.ENABLED = False
        base16, _ = time_step(hp, spec, optimizer, batch, iters)
        print(f"xla bf16:   step={base16*1e3:8.1f} ms "
              f"windows/s={bsz/base16:8.1f}", flush=True)
        pallas_train.ENABLED = True
        dt16, _ = time_step(hp, spec, optimizer, batch, iters)
        print(f"fused bf16: step={dt16*1e3:8.1f} ms "
              f"windows/s={bsz/dt16:8.1f} speedup={base16/dt16:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

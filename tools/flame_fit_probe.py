"""Throughput of the batched FLAME landmark fitting on the accelerator.

The reference's most expensive stage (flame.py:266-291): per-frame 2-stage
L-BFGS fits, one frame per Ray actor (8 actors), "CPU+GPU months" for the
MAHNOB corpus (paper §4.1). Here the same optimization is
``features/flame_fit.py::fit_batch`` — a vmapped optax L-BFGS over all
frames at once — and this probe measures it compiled at full FLAME size
(5023 vertices, 300 shape + 100 expression dirs, 51 landmarks, the real
model's tensor shapes via ``synthetic_flame_model(5023)``), default 30+60
two-stage steps.

Reports frames/s per chip and the projected wall-clock for the full corpus
(11.5 h dyadic video -> ~2.07M frames across both participants at 25 fps).
Targets are rendered from known ground-truth parameters, so the probe also
checks the fits actually converge (median landmark loss reduction).

Usage: python tools/flame_fit_probe.py [batch] [iters] [stage1] [stage2] [full]

The trailing literal ``full`` evaluates the objective through the full
5,023-vertex model (``fit_batch(restrict=False)``) instead of the default
landmark-anchor-restricted evaluation, for an A/B on hardware.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, ".")

CORPUS_FRAMES = 2 * int(11.5 * 3600 * 25)   # both dyad participants


def make_targets(model, emb, n, seed=3):
    """Project landmarks of random ground-truth params (the probe's fits
    must recover them)."""
    from lets_face_it_tpu.features import flame_fit

    rng = np.random.default_rng(seed)
    gt = {
        "trans": jnp.asarray(rng.normal(0, 0.05, (n, 3)), jnp.float32),
        "rot": jnp.asarray(rng.normal(0, 0.1, (n, 3)), jnp.float32),
        "pose": jnp.zeros((n, 12), jnp.float32),
        "shape": jnp.asarray(rng.normal(0, 0.3, (n, 300)), jnp.float32),
        "exp": jnp.asarray(rng.normal(0, 0.3, (n, 100)), jnp.float32),
        "scale": jnp.full((n,), 512.0, jnp.float32),
    }

    def one(p):
        lmks = flame_fit.model_landmarks(
            model, emb, {k: p[k] for k in
                         ("trans", "rot", "pose", "shape", "exp")})
        return p["scale"] * lmks[:, :2] + 512.0

    return jax.vmap(one)(gt)


def main():
    from lets_face_it_tpu.features import flame_fit
    from lets_face_it_tpu.render.flame import synthetic_flame_model
    from lets_face_it_tpu.utils.timing import hard_sync

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    stage1 = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    stage2 = int(sys.argv[4]) if len(sys.argv) > 4 else 60
    restrict = "full" not in sys.argv[5:]

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); stages "
          f"{stage1}+{stage2}; objective "
          f"{'landmark-restricted' if restrict else 'full 5023-vertex'}",
          flush=True)

    model = synthetic_flame_model(5023, seed=0)   # real-FLAME tensor sizes
    emb = flame_fit.synthetic_landmark_embedding(model, 51, seed=2)
    targets = make_targets(model, emb, batch)

    # the perturbation stays under the jit: an eager add per iteration would
    # be a host round trip inside the timing loop (CLAUDE.md axon rules)
    run = jax.jit(lambda t, i: flame_fit.fit_batch(
        model, emb, t + i * 1e-4, stage1_steps=stage1,
        stage2_steps=stage2, restrict=restrict))

    # pre-staged perturbation scalars: a per-iteration device_put would be
    # its own dispatch inside the timing loop. The warm-up call uses the
    # same aval (weakly-typed f32 scalar) as the timed calls — a
    # differently-typed warm-up scalar would leave the timed trace
    # uncompiled and hide a ~minutes retrace inside the first timed leg.
    scalars = [jnp.asarray(float(i)) for i in range(1 + 9 * iters)]
    jax.block_until_ready(scalars)

    t0 = time.perf_counter()
    params, losses = run(targets, scalars[0])
    hard_sync(losses)
    compile_s = time.perf_counter() - t0
    final_loss = float(jnp.median(losses))

    # convergence in interpretable units: re-project the fitted landmarks
    # and measure pixel RMS against the targets (the raw loss is
    # spread-normalized and carries regularizers)
    @jax.jit
    def px_rms(params, targets):
        def one(p, target):
            lmks = flame_fit.model_landmarks(
                model, emb, {k: p[k] for k in
                             ("trans", "rot", "pose", "shape", "exp")})
            proj = p["scale"] * lmks[:, :2]
            return jnp.sqrt(jnp.mean(jnp.sum((proj - target) ** 2, axis=-1)))
        return jax.vmap(one)(params, targets)

    err = np.asarray(px_rms(params, targets))
    print(f"compile+first: {compile_s:.0f}s; median final loss "
          f"{final_loss:.3e}; landmark px RMS median "
          f"{np.median(err):.2f} / p95 {np.percentile(err, 95):.2f} "
          f"(1024-px image) over {batch} frames", flush=True)

    def timed(ks):
        out = None
        t0 = time.perf_counter()
        for k in ks:
            out = run(targets, k)
        hard_sync(out[1])
        return time.perf_counter() - t0

    # median-of-3 N-vs-2N differences, like bench.py: transport noise can
    # exceed small-batch call times, and a non-positive difference means the
    # measurement is below the noise floor — report that, not a fantasy rate
    dts = []
    for r in range(3):
        base = 1 + 3 * r * iters
        t_short = timed(scalars[base:base + iters])
        t_long = timed(scalars[base + iters:base + 3 * iters])
        dts.append((t_long - t_short) / iters)
    dt = sorted(dts)[1]
    if dt <= 0:
        print(f"fit_batch b{batch}: call time below the transport noise "
              f"floor (differences {[f'{d*1e3:.0f} ms' for d in dts]}) — "
              "use a larger batch for a meaningful rate", flush=True)
        return
    fps = batch / dt
    corpus_h = CORPUS_FRAMES / fps / 3600
    print(f"fit_batch b{batch}: {dt*1e3:.0f} ms/call -> {fps:,.0f} frames/s "
          f"per chip", flush=True)
    print(f"projected full MAHNOB corpus ({CORPUS_FRAMES:,} frames, both "
          f"participants): {corpus_h:.2f} h on one chip", flush=True)


if __name__ == "__main__":
    main()

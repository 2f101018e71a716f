"""Optimizers and LR schedules via optax, matching the reference's choices
(lets_face_it_glow.py:61-72, glow/utils.py:65-82):

* adam / sgd / rmsprop with the hparams' per-optimizer args
* "step" (gamma^(epoch // step_size)), "multiplicative" (lr *= epoch // val)
  and "lambda" (lr = base * (epoch // val)) epoch-level schedules
* global-norm gradient clipping (PL's ``gradient_clip_val`` semantics)

PyTorch steps these schedulers once per epoch; here the per-epoch learning
rates are precomputed into a table and looked up by ``step // steps_per_epoch``
— exact same epoch-discrete trajectory, but jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def epoch_lr_table(hp, n_epochs: int) -> np.ndarray:
    """lr value for each epoch 0..n_epochs-1 under the configured schedule."""
    base_lr = float(hp.lr)
    sched = hp.Optim.get("Schedule", {}) or {}
    name = sched.get("name")
    lrs = np.full(max(n_epochs, 1), base_lr, np.float64)
    if not name:
        return lrs
    args = sched["args"][name]
    if name == "step":
        gamma, size = float(args["gamma"]), int(args["step_size"])
        for e in range(n_epochs):
            lrs[e] = base_lr * gamma ** (e // size)
    elif name == "multiplicative":
        val = int(args["val"])
        lr = base_lr
        for e in range(n_epochs):
            if e > 0:
                lr *= e // val
            lrs[e] = lr
    elif name == "lambda":
        val = int(args["val"])
        for e in range(n_epochs):
            lrs[e] = base_lr * (e // val)
    else:
        raise NotImplementedError(f"scheduler {name!r}")
    return lrs


def lr_schedule(hp, steps_per_epoch: int):
    """Per-step schedule: table lookup on the epoch index."""
    table = jnp.asarray(epoch_lr_table(hp, int(getattr(hp, "max_epochs", 30) or 30)),
                        jnp.float32)

    def fn(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), table.shape[0] - 1)
        return table[epoch]

    return fn


def build_optimizer(hp, steps_per_epoch: int) -> optax.GradientTransformation:
    name = hp.Optim["name"]
    args = hp.Optim["args"].get(name, {})
    schedule = lr_schedule(hp, steps_per_epoch)

    if name == "adam":
        betas = args.get("betas", (0.9, 0.999))
        opt = optax.adam(schedule, b1=betas[0], b2=betas[1],
                         eps=args.get("eps", 1e-8))
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=args.get("momentum", 0.0))
    elif name == "rmsprop":
        opt = optax.rmsprop(schedule, eps=args.get("eps", 1e-8))
    else:
        raise NotImplementedError(f"optimizer {name!r}")

    chain = []
    clip = getattr(hp, "gradient_clip_val", 0.0) or 0.0
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(opt)
    return optax.chain(*chain)

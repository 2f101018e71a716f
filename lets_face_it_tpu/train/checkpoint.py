"""Orbax checkpointing: params + optimizer state + step + PRNG key +
actnorm-inited flag (the flag must survive reload so resumed models never
re-run data-dependent init — reference models.py:515-518)."""

from __future__ import annotations

from pathlib import Path
import jax
import numpy as np
import orbax.checkpoint as ocp

from lets_face_it_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
            item_names=("state", "meta"),
        )

    def save(self, step: int, state: TrainState, *, actnorm_inited: bool,
             epoch: int, extra: dict | None = None):
        meta = {
            "actnorm_inited": bool(actnorm_inited),
            "epoch": int(epoch),
            **{k: float(v) for k, v in (extra or {}).items()},
        }
        self._mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(to_saveable(state)),
            meta=ocp.args.JsonSave(meta),
        ))
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState, step: int | None = None):
        """Returns (state, meta). ``template_state`` provides the pytree
        structure/dtypes to restore into."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        payload = self._mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(to_saveable(template_state)),
            meta=ocp.args.JsonRestore(),
        ))
        state = from_saveable(template_state, payload["state"])
        return state, payload["meta"]


def to_saveable(state: TrainState) -> dict:
    return {
        "params": state.params._asdict(),
        "opt_state": state.opt_state,
        "step": state.step,
        "last_mismatched_nll": state.last_mismatched_nll,
        "rng": jax.random.key_data(state.rng)
        if jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
        else state.rng,
    }


def from_saveable(template: TrainState, payload: dict) -> TrainState:
    from lets_face_it_tpu.model import SeqGlowParams

    rng = payload["rng"]
    if jax.dtypes.issubdtype(template.rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.wrap_key_data(np.asarray(rng))
    return TrainState(
        params=SeqGlowParams(**payload["params"]),
        opt_state=payload["opt_state"],
        step=payload["step"],
        last_mismatched_nll=payload["last_mismatched_nll"],
        rng=rng,
    )


def save_params_only(path, params, meta: dict | None = None):
    """Standalone params export (for sampling / serving)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params._asdict(), "meta": meta or {}})
    ckptr.wait_until_finished()


def load_params_only(path, template_params):
    ckptr = ocp.StandardCheckpointer()
    target = {"params": template_params._asdict(), "meta": None}
    payload = ckptr.restore(Path(path).absolute(), target=target)
    from lets_face_it_tpu.model import SeqGlowParams

    return SeqGlowParams(**payload["params"]), payload["meta"]

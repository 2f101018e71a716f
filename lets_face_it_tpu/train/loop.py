"""The training harness: epochs, validation self-checks, logging, checkpoints.

Replaces PyTorch Lightning + MimicryLogger (train.py, mimicry_logger.py) with
an explicit loop over jitted steps on a data-parallel device mesh. Validation
each epoch reproduces the reference's de-facto test suite: val NLL, free-run
generation + jerk triplet, invertibility error, matched-vs-deranged NLL
probes, and parameter histograms (scale logging) — written to TensorBoard via
tensorboardX and mirrored as JSON lines on stdout.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.data.windows import WindowDataset
from lets_face_it_tpu.hparams import HParams
from lets_face_it_tpu.model import FlowSpec, seqglow
from lets_face_it_tpu.parallel import mesh as pmesh
from lets_face_it_tpu.train import metrics as train_metrics
from lets_face_it_tpu.train import state as train_state
from lets_face_it_tpu.train.checkpoint import CheckpointManager
from lets_face_it_tpu.train.optim import build_optimizer


class MetricLogger:
    """TensorBoard + JSON-lines stdout logging."""

    def __init__(self, log_dir, enabled: bool = True):
        self.enabled = enabled
        self.writer = None
        self.comet = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter

                Path(log_dir).mkdir(parents=True, exist_ok=True)
                self.writer = SummaryWriter(str(log_dir))
            except Exception as exc:
                self.writer = None
                print(f"warning: TensorBoard logging disabled ({exc})",
                      file=sys.stderr)
            # Comet when an API key is configured (reference train.py:25-31)
            try:
                from lets_face_it_tpu.config import CONFIG

                api_key = CONFIG.get("comet", {}).get("api_key")
                if api_key:
                    import comet_ml

                    self.comet = comet_ml.Experiment(
                        api_key=api_key,
                        project_name=CONFIG["comet"].get("project_name",
                                                         "lets_face_it"))
            except Exception as exc:
                self.comet = None
                print(f"warning: Comet logging disabled ({exc})",
                      file=sys.stderr)

    def scalars(self, step: int, values: dict):
        clean = {k: float(v) for k, v in values.items()}
        if self.writer is not None:
            for k, v in clean.items():
                self.writer.add_scalar(k, v, step)
        if self.comet is not None:
            self.comet.log_metrics(clean, step=step)
        print(json.dumps({"step": step, **clean}), file=sys.stdout, flush=True)

    def histogram(self, step: int, name: str, values):
        if self.writer is not None:
            self.writer.add_histogram(name, np.asarray(values).ravel(), step)

    def video_url(self, step: int, url: str, name: str = "validation_video"):
        """Surface a rendered validation video in the experiment trackers
        (the reference embeds it as HTML in Comet, mimicry_logger.py:102-112)."""
        if self.writer is not None:
            self.writer.add_text(name, url, step)
        if self.comet is not None:
            self.comet.log_html(
                f"<h3>{name} (step {step})</h3>"
                f'<video src="{url}" controls width="640">'
                f'<a href="{url}">{url}</a></video>')

    def close(self):
        if self.writer is not None:
            self.writer.close()


def scale_histograms(params) -> dict:
    """Parameter histograms the reference logs (mimicry_logger.py:126-152):
    actnorm scales and LU log_s per flow network."""
    return {
        "actnorm_scales": np.exp(np.asarray(params.flow["actnorm"]["logs"])),
        "actnorm_bias": np.asarray(params.flow["actnorm"]["bias"]),
        "lu_log_s": np.asarray(params.flow["perm"].get(
            "log_s", jnp.zeros((0,)))),
    }


def run_validation(spec: FlowSpec, hp: HParams, params, val_ds: WindowDataset,
                   eval_step, logger: MetricLogger, step: int, rng,
                   render_client=None, dev_batcher=None):
    val_cfg = hp.Validation
    n_batches = 0
    total = 0.0
    first_batch = None
    if dev_batcher is not None:
        batches = (dev_batcher.get_batch(sel) for sel in
                   val_ds.epoch_index_batches(hp.batch_size, shuffle=False))
    else:
        batches = ({k: jnp.asarray(v) for k, v in b.items()}
                   for b in val_ds.epoch_batches(hp.batch_size,
                                                 shuffle=False))
    for jb in batches:
        z_seq, loss, _ = eval_step(params, jb)
        total += float(loss)
        n_batches += 1
        if first_batch is None:
            first_batch = (jb, z_seq, loss)
    val_loss = total / max(n_batches, 1)
    out = {"val_loss": val_loss}

    if first_batch is not None:
        jb, z_seq, loss = first_batch
        start = spec.cond.longest_history
        seq_len = val_cfg["seq_len"]

        if val_cfg.get("inference", False):
            rng, sub = jax.random.split(rng)
            generated = seqglow.sequence_sample_jit(
                spec, params, jb, seq_len, eps_std=float(hp.Infer["eps"]),
                rng=sub)
            gt = jb["p1_face"][:, start:seq_len]
            out.update({k: float(v) for k, v in
                        train_metrics.jerk_metrics(gt, generated).items()})
            if render_client is not None and val_cfg.get("render", False):
                try:
                    render_client(np.asarray(generated), np.asarray(gt), step)
                except Exception as exc:  # rendering must never kill training
                    print(f"render failed: {exc}", file=sys.stderr)

        if val_cfg.get("check_invertion", False):
            err = train_metrics.invertibility_error(spec, params, jb, z_seq, loss)
            out["reconstruction/error_percentage"] = float(err)

        if val_cfg.get("wrong_context_test", False) and hasattr(hp, "Mismatch"):
            rng, sub = jax.random.split(rng)
            probes = train_metrics.wrong_context_probes(
                spec, params, jb, loss, hp.Mismatch, sub)
            out.update({k: float(v) for k, v in probes.items()})

        if val_cfg.get("scale_logging", False):
            for name, values in scale_histograms(params).items():
                logger.histogram(step, name, values)

    logger.scalars(step, out)
    return val_loss


def train(hp: HParams, *, seed: int = 1234, log_dir=None, ckpt_dir=None,
          max_steps: int | None = None, render_client=None,
          dataset_cls=WindowDataset, use_mesh: bool = True,
          verbose: bool = True, step_hook=None, val_hook=None):
    """Full training run. Returns (final TrainState, best val loss).

    ``step_hook(global_step, metrics_dict)`` fires on logged train steps and
    ``val_hook(global_step, val_loss, hp, spec, params, val_batch)`` after
    each validation — both may raise to stop the run (used by the tuning
    harness for pruning)."""
    data_file = Path(hp.dataset_root) / hp.Data["file_name"]
    train_ds = dataset_cls(data_file, "train", hp.Data, hp.Conditioning,
                           hp.Train["seq_len"])
    val_ds = dataset_cls(data_file, "val", hp.Data, hp.Conditioning,
                         hp.Validation["seq_len"])

    spec = FlowSpec.build(hp)
    n_dev = len(jax.devices()) if use_mesh else 1
    mesh = pmesh.make_mesh() if use_mesh else None

    steps_per_epoch = max(train_ds.num_batches(hp.batch_size, drop_last=True), 1)
    optimizer = build_optimizer(hp, steps_per_epoch)
    rng = jax.random.PRNGKey(seed)
    rng, k_state = jax.random.split(rng)
    state = train_state.init_train_state(k_state, spec, optimizer)

    ckpt = CheckpointManager(ckpt_dir, max_to_keep=3) if ckpt_dir else None
    logger = MetricLogger(log_dir or "runs/default", enabled=bool(hp.logger))
    if render_client is not None and getattr(render_client, "on_rendered",
                                             None) is None:
        render_client.on_rendered = logger.video_url

    train_step = train_state.make_train_step(spec, hp, optimizer, mesh=mesh)
    eval_step = train_state.make_eval_step(spec, mesh=mesh)

    actnorm_inited = False
    start_epoch = 0
    if getattr(hp, "resume_from_checkpoint", None):
        resume_mgr = CheckpointManager(hp.resume_from_checkpoint)
        state, meta = resume_mgr.restore(state)
        actnorm_inited = bool(meta.get("actnorm_inited", True))
        start_epoch = int(meta.get("epoch", 0)) + 1

    if mesh is not None:
        state = pmesh.replicate(mesh, state)

    # Stall watchdog (opt-in, hp.stall_timeout_s / --stall_timeout_s): the
    # remote transport can hang a blocking dispatch forever (docs/PERF.md);
    # without this a multi-hour run stalls silently instead of exiting for
    # a supervisor to --resume_from. Arms on the first beat, so the slow
    # first remote compile never trips it; beats ride the step loop — a
    # hung device backs up dispatch and stops them within a few steps.
    stall_s = getattr(hp, "stall_timeout_s", None)
    watchdog = None
    if stall_s:
        from lets_face_it_tpu.utils.watchdog import ProgressWatchdog

        watchdog = ProgressWatchdog(float(stall_s))

    best_val = float("inf")
    max_epochs = int(hp.max_epochs or 1)
    global_step = int(jax.device_get(state.step))
    # Rate denominator for steps_per_sec: steps taken by THIS process, not
    # the absolute counter (a resumed run restores step>0 at t=0).
    start_step = global_step
    t_start = time.time()
    done = False

    from lets_face_it_tpu.data.device_cache import make_device_batcher
    from lets_face_it_tpu.data.prefetch import prefetch_batches

    # Device-resident data path (the TPU-native default, hp.device_data_cache
    # = auto|on|off): the split's arrays live in HBM and each batch is
    # gathered on-device from ~1 KB of window-start indices — no per-step
    # window upload. This is both the throughput fix (the b256 upload limited
    # end-to-end training to 2.8 of the 8.7 device-side steps/s on the
    # remote-TPU transport) and the durability fix (that transport pins a
    # host copy of EVERY upload — tools/leak_probe.py — which OOM-killed a
    # 60k-step run at 130 GB RSS). See data/device_cache.py.
    dev_batcher = make_device_batcher(train_ds, hp, mesh=mesh)
    # k-steps-per-dispatch (hp.steps_per_dispatch / --steps_per_dispatch):
    # scan k optimizer steps inside ONE compiled dispatch, gathering each
    # batch on-device from the HBM-resident split. End-to-end throughput is
    # then pinned to device speed regardless of transport health — the
    # per-step dispatch RTT (and its jitter, docs/PERF.md) amortises k-fold.
    # Requires the device cache; trajectories are step-for-step identical to
    # k=1 (tests/test_device_cache.py::test_multi_step_matches_single).
    k_dispatch = int(getattr(hp, "steps_per_dispatch", 1) or 1)
    multi_step = None
    if k_dispatch > 1:
        if dev_batcher is None:
            print(f"steps_per_dispatch={k_dispatch} needs the device data "
                  "cache (device_data_cache=on/auto on an accelerator); "
                  "running one step per dispatch", flush=True)
            k_dispatch = 1
        else:
            multi_step = train_state.make_multi_train_step(
                spec, hp, optimizer, int(hp.Train["seq_len"]), mesh=mesh)
    # The val split rides the same size/platform policy gate; in auto mode
    # its budget is whatever the cached train split left over. It stays
    # default-placed (no mesh) on purpose: val epochs keep their ragged
    # last batch (no drop_last), which cannot shard over the batch axis —
    # eval_step's mesh shardings redistribute each batch instead.
    val_batcher = (make_device_batcher(
                       val_ds, hp, reserved_bytes=dev_batcher.total_bytes)
                   if dev_batcher is not None else None)
    # Streaming fallback (CPU / oversized corpora): the upload runs inside
    # the prefetch worker so it at least overlaps the step; wire_dtype=bf16
    # (opt-in) ships float batches as bfloat16 and upcasts on device.
    wire_bf16 = str(getattr(hp, "wire_dtype", "f32") or "f32") == "bf16"

    def to_device(b):
        if wire_bf16:
            import ml_dtypes

            b = {k: (np.asarray(v).astype(ml_dtypes.bfloat16)
                     if np.issubdtype(np.asarray(v).dtype, np.floating)
                     else v)
                 for k, v in b.items()}
        jb = (pmesh.shard_batch(mesh, b) if mesh is not None
              else {k: jnp.asarray(v) for k, v in b.items()})
        if wire_bf16:
            jb = {k: (v.astype(jnp.float32)
                      if v.dtype == jnp.bfloat16 else v)
                  for k, v in jb.items()}
        return jb

    def log_step_metrics(metric_host_dict):
        m = {k: float(v) for k, v in metric_host_dict.items()}
        m["train_loss"] = m.pop("loss")
        m["steps_per_sec"] = ((global_step - start_step)
                              / (time.time() - t_start))
        logger.scalars(global_step, m)
        if step_hook is not None:
            step_hook(global_step, m)

    try:
        for epoch in range(start_epoch, max_epochs):
            # A resumed run can restore at global_step >= max_steps (stall
            # after the final checkpoint): nothing is left to train, so
            # terminate instead of iterating epochs with empty plans — the
            # k>1 path's max_steps slice would otherwise never set `done`.
            if max_steps is not None and global_step >= max_steps:
                done = True
                break
            # The shuffle order is a pure function of (seed, epoch) so a resumed
            # run consumes exactly the data order the uninterrupted run would
            # have at this epoch (the reference gets the same property from
            # Lightning re-seeding its DataLoader sampler per epoch). Seeding
            # from a running np_rng instead would replay epochs 0..E's shuffles
            # after a resume at epoch E. Both data paths consume the same
            # epoch_index_batches order, so toggling the device cache never
            # changes the trajectory.
            np_rng = np.random.default_rng([seed, epoch])
            if multi_step is not None:
                # Plan the epoch up front: full k-blocks run as one dispatch
                # each, the remainder (and any max_steps tail that cannot
                # fill a block) falls back to the single-step jit — so the
                # consumed data order is IDENTICAL to k=1.
                sels = list(train_ds.epoch_index_batches(
                    hp.batch_size, rng=np_rng, shuffle=True, drop_last=True))
                if max_steps is not None:
                    sels = sels[:max(max_steps - global_step, 0)]
                if not actnorm_inited and sels:
                    # data-dependent init needs an eager batch; the first
                    # block's first batch is re-gathered here (once per run)
                    # and then still consumed by the first dispatch, exactly
                    # as the single-step path inits-then-steps on batch 0
                    state = train_state.run_actnorm_init(
                        spec, state, dev_batcher.get_batch(sels[0]))
                    if mesh is not None:
                        state = pmesh.replicate(mesh, state)
                    actnorm_inited = True
                n_blocks = len(sels) // k_dispatch
                plan = ([("multi", sels[i * k_dispatch:(i + 1) * k_dispatch])
                         for i in range(n_blocks)]
                        + [("single", s)
                           for s in sels[n_blocks * k_dispatch:]])

                def _xfer(item):
                    kind, payload = item
                    if kind == "multi":
                        return kind, dev_batcher.get_starts_block(payload)
                    return kind, dev_batcher.get_batch(payload)

                batch_iter = prefetch_batches(iter(plan), transfer=_xfer)
            elif dev_batcher is not None:
                # The gather dispatch (index upload + on-device window gather)
                # runs in the prefetch worker so its host-side dispatch latency
                # (a few ms/step on the remote-TPU transport) overlaps the step
                # dispatch instead of serializing with it.
                batch_iter = prefetch_batches(
                    train_ds.epoch_index_batches(hp.batch_size, rng=np_rng,
                                                 shuffle=True, drop_last=True),
                    transfer=dev_batcher.get_batch)
            else:
                batch_iter = prefetch_batches(
                    train_ds.epoch_batches(hp.batch_size, rng=np_rng,
                                           shuffle=True, drop_last=True),
                    transfer=to_device)
            # Throttle the blocking metrics fetch to the k=1 cadence
            # (~every 10 steps): fetching after EVERY dispatch would pay a
            # transport round trip per k steps and stall dispatch
            # pipelining — re-exposing the mode to the jitter it removes.
            log_every = max(1, -(-10 // k_dispatch))   # ceil(10 / k)
            n_dispatch = 0
            for item in batch_iter:
                if multi_step is not None and item[0] == "multi":
                    state, ms = multi_step(state, dev_batcher.arrays, item[1])
                    global_step += k_dispatch
                    n_dispatch += 1
                    if watchdog is not None:
                        watchdog.beat()
                    if verbose and n_dispatch % log_every == 0:
                        log_step_metrics({k: v[-1] for k, v in
                                          jax.device_get(ms).items()})
                    if max_steps is not None and global_step >= max_steps:
                        done = True
                        break
                    continue
                jb = item[1] if multi_step is not None else item
                if not actnorm_inited:
                    state = train_state.run_actnorm_init(spec, state, jb)
                    if mesh is not None:
                        state = pmesh.replicate(mesh, state)
                    actnorm_inited = True

                state, step_metrics = train_step(state, jb)
                global_step += 1
                if watchdog is not None:
                    watchdog.beat()

                if verbose and global_step % 10 == 0:
                    log_step_metrics(jax.device_get(step_metrics))

                if max_steps is not None and global_step >= max_steps:
                    done = True
                    break

            if (epoch + 1) % int(hp.check_val_every_n_epoch or 1) == 0 or done:
                # Resume-invariant: fold the step into the base key instead of
                # advancing a split chain that a resumed run would restart.
                sub = jax.random.fold_in(rng, global_step)
                val_loss = run_validation(spec, hp, state.params, val_ds, eval_step,
                                          logger, global_step, sub,
                                          render_client=render_client,
                                          dev_batcher=val_batcher)
                best_val = min(best_val, val_loss)
                if val_hook is not None:
                    val_hook(global_step, val_loss, hp, spec, state.params, val_ds)
                # never re-save a step a resumed run already has on disk
                # (orbax raises on duplicate steps)
                if ckpt is not None and (ckpt.latest_step() is None
                                         or global_step > ckpt.latest_step()):
                    ckpt.save(global_step, jax.device_get(state),
                              actnorm_inited=actnorm_inited, epoch=epoch,
                              extra={"val_loss": val_loss})
                if watchdog is not None:
                    watchdog.beat()     # validation + checkpointing took a while
            if done:
                break
    finally:
        # Exceptions out of the loop (pruning hooks raising, a failed
        # validation/save) must not leak an armed watchdog: its default
        # on_stall os._exit(17)s the whole process minutes later, mid
        # whatever the caller moved on to (e.g. the next trial's compile).
        if watchdog is not None:
            watchdog.stop()
        logger.close()
    return state, best_val

"""Test-split evaluation: the working version of the reference's bit-rotted
``test_step`` (lets_face_it_glow.py:101-142 calls undefined methods; see
SURVEY.md "known bit-rot").

Per test batch:
  * teacher-forced NLL + per-frame losses
  * free-running generation from a zero own-face seed (Test.seq_len frames)
  * for each conditioned p2/p1 modality: deranged-batch NLL and deranged
    generation

Results are collected into numpy arrays and saved as an ``.npz`` (the
reference saved ``callback_metrics['results']`` as a torch .pt).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.data.windows import WindowDataset
from lets_face_it_tpu.hparams import HParams
from lets_face_it_tpu.model import FlowSpec, SeqGlowParams, seqglow
from lets_face_it_tpu.train import derange


def _zero_seed(batch, start: int):
    """Conditioning data with the own-face seed zeroed
    (lets_face_it_glow.py:106-113)."""
    out = dict(batch)
    out["p1_face"] = jnp.zeros_like(batch["p1_face"][:, :start])
    return out


def evaluate_batch(spec: FlowSpec, params: SeqGlowParams, hp: HParams, batch,
                   rng):
    seq_len = hp.Test["seq_len"] if hasattr(hp, "Test") else \
        hp.Validation["seq_len"]
    start = spec.cond.longest_history
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    out = {}
    _, loss, losses = seqglow.sequence_nll_jit(spec, params, batch)
    out["test_loss"] = np.asarray(loss)
    out["test_losses"] = np.asarray(losses)

    rng, k_gen = jax.random.split(rng)
    predicted = seqglow.sequence_sample_jit(
        spec, params, _zero_seed(batch, start), seq_len,
        eps_std=float(hp.Infer["eps"]), rng=k_gen)
    out["predicted_prop_seq"] = np.asarray(predicted)
    out["gt_seq"] = np.asarray(batch["p1_face"][:, -predicted.shape[1]:])

    for modality in ("p2_face", "p2_speech", "p1_speech"):
        if hp.Conditioning[modality]["history"] <= 0:
            continue
        rng, k_der, k_gen = jax.random.split(rng, 3)
        deranged = derange.derange_batch(k_der, batch, [modality])
        _, mis_loss, mis_losses = seqglow.sequence_nll_jit(spec, params, deranged)
        out[f"nll_mismatched_{modality}"] = np.asarray(mis_loss)
        out[f"losses_mismatched_{modality}"] = np.asarray(mis_losses)
        mis_pred = seqglow.sequence_sample_jit(
            spec, params, _zero_seed(deranged, start), seq_len,
            eps_std=float(hp.Infer["eps"]), rng=k_gen)
        out[f"predicted_mismatch_{modality}_seq"] = np.asarray(mis_pred)
    return out


def run_test(hp: HParams, params: SeqGlowParams, *, output_file=None,
             seed: int = 1234, max_batches: int | None = None):
    """Evaluate on the test split; returns the list of per-batch result dicts
    and optionally saves them."""
    spec = FlowSpec.build(hp)
    if not hasattr(hp, "Test"):
        hp.Test = {"seq_len": hp.Validation["seq_len"]}
    data_file = Path(hp.dataset_root) / hp.Data["file_name"]
    ds = WindowDataset(data_file, "test", hp.Data, hp.Conditioning,
                       hp.Test["seq_len"])
    rng = jax.random.PRNGKey(seed)

    results = []
    for i, batch in enumerate(ds.epoch_batches(hp.batch_size, shuffle=False)):
        rng, sub = jax.random.split(rng)
        results.append(evaluate_batch(spec, params, hp, batch, sub))
        if max_batches is not None and i + 1 >= max_batches:
            break

    if output_file is not None:
        flat = {}
        for i, res in enumerate(results):
            for k, v in res.items():
                flat[f"batch{i}/{k}"] = v
        Path(output_file).parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(output_file, **flat)
    return results


def summarize(results: list[dict]) -> dict:
    """Aggregate scalar metrics over batches (paper Table 1 numbers: mean NLL
    matched and per-modality mismatched)."""
    summary = {}
    keys = {k for res in results for k in res
            if k == "test_loss" or k.startswith("nll_mismatched")}
    for k in sorted(keys):
        vals = [float(res[k]) for res in results if k in res]
        summary[k] = float(np.mean(vals))
    return summary

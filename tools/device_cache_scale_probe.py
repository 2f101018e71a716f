"""Prove the device cache at MAHNOB scale (VERDICT r4 item 6).

The auto policy budgets 6 GB/device (data/device_cache.py:AUTO_MAX_BYTES)
but had only been exercised at 1.17 GB. The real corpus is ~2.07M frames at
25 fps with both roles generated per segment (mimicry_data_module.py scale;
docs/index.md: 6.4 GB released HDF5) — concatenated modality arrays of
~2 GB — and production training must coexist with the val split's cache,
params + Adam state, and the b1024 encoder-remat activation peak inside a
16 GiB v5e HBM.

This probe writes a full-scale synthetic corpus, asserts the auto policy
caches BOTH splits, trains final_model end-to-end at b256 (k-dispatch) and
at b1024 (remat path), runs a cached-val evaluation pass, and records
``jax.Device.memory_stats()`` peaks + headroom in
``runs/device_cache_scale.json``. PERF.md quotes the measured numbers.

Usage:
    python tools/device_cache_scale_probe.py [--dataset_root /tmp/lfi_scale]
        [--steps 40] [--big_steps 3] [--out runs/device_cache_scale.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# ~2.07M frames x both roles -> ~2.9M train frames in chunk terms: 2,900
# chunks x 1,000 frames = 2.9M rows x 688 B (172 f32 cols) = 2.0 GB of
# concatenated modality arrays; val adds ~10%.
N_TRAIN_CHUNKS = 2900
N_VAL_CHUNKS = 290
FRAMES_PER_CHUNK = 1000


def mem_stats(dev):
    try:
        s = dev.memory_stats()
        if not s:
            return None
        return {k: int(v) for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                         "largest_alloc_size")}
    except Exception as exc:
        print(f"memory_stats unavailable: {exc}", file=sys.stderr)
        return None


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", default="/tmp/lfi_scale")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--big_steps", type=int, default=3)
    p.add_argument("--k_dispatch", type=int, default=8)
    p.add_argument("--out", default=str(REPO / "runs" /
                                        "device_cache_scale.json"))
    args = p.parse_args()

    import jax
    import numpy as np

    from lets_face_it_tpu.data.device_cache import make_device_batcher
    from lets_face_it_tpu.data.synthetic import write_synthetic_dataset
    from lets_face_it_tpu.data.windows import WindowDataset
    from lets_face_it_tpu.hparams import load_hparams
    from lets_face_it_tpu.train import state as train_state
    from lets_face_it_tpu.train.optim import build_optimizer
    from lets_face_it_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    from lets_face_it_tpu.utils.timing import hard_sync

    enable_persistent_compile_cache()

    data_file = Path(args.dataset_root) / "lets_face_it.h5"
    if not data_file.exists():
        print(f"writing {N_TRAIN_CHUNKS}x{FRAMES_PER_CHUNK}-frame corpus to "
              f"{data_file} (~2 GB of modality arrays)", flush=True)
        t0 = time.time()
        write_synthetic_dataset(data_file, n_train_chunks=N_TRAIN_CHUNKS,
                                n_val_chunks=N_VAL_CHUNKS, n_test_chunks=2,
                                frames_per_chunk=FRAMES_PER_CHUNK, seed=7)
        print(f"fixture written in {time.time() - t0:.0f}s", flush=True)

    hp = load_hparams(str(REPO / "hparams" / "final_model.yaml"),
                      dataset_root=args.dataset_root)
    hp.precision = 16

    from lets_face_it_tpu.model import FlowSpec

    spec = FlowSpec.build(hp)
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "this probe measures real accelerator HBM"
    report = {"device": dev.device_kind,
              "corpus": f"{N_TRAIN_CHUNKS} train + {N_VAL_CHUNKS} val "
                        f"chunks x {FRAMES_PER_CHUNK} frames"}

    train_ds = WindowDataset(data_file, "train", hp.Data, hp.Conditioning,
                             hp.Train["seq_len"])
    val_ds = WindowDataset(data_file, "val", hp.Data, hp.Conditioning,
                           hp.Validation["seq_len"])

    batcher = make_device_batcher(train_ds, hp)
    assert batcher is not None, (
        "auto policy refused to cache the full-scale train split — budget "
        "regression")
    val_batcher = make_device_batcher(val_ds, hp,
                                      reserved_bytes=batcher.total_bytes)
    assert val_batcher is not None, (
        "auto policy refused the val split next to the cached train split")
    report["train_split_gb"] = round(batcher.total_bytes / 1024**3, 3)
    report["val_split_gb"] = round(val_batcher.total_bytes / 1024**3, 3)
    report["windows_train"] = int(len(train_ds))
    report["mem_after_cache"] = mem_stats(dev)
    print(f"cached train {report['train_split_gb']} GB + val "
          f"{report['val_split_gb']} GB; {report['windows_train']:,} "
          f"training windows", flush=True)

    optimizer = build_optimizer(hp, steps_per_epoch=1000)

    # --- b256, k-steps-per-dispatch (the production mode) ---
    hp.batch_size = 256
    state = train_state.init_train_state(jax.random.PRNGKey(0), spec,
                                         optimizer)
    multi = train_state.make_multi_train_step(spec, hp, optimizer,
                                              int(hp.Train["seq_len"]))
    it = train_ds.epoch_index_batches(256, rng=np.random.default_rng(1),
                                      shuffle=True, drop_last=True)
    k = args.k_dispatch

    def next_block():
        return batcher.get_starts_block([next(it) for _ in range(k)])

    state, m = multi(state, batcher.arrays, next_block())   # compile
    hard_sync(m)
    t0 = time.perf_counter()
    n = 0
    while n < args.steps:
        state, m = multi(state, batcher.arrays, next_block())
        n += k
    hard_sync(m)
    report["b256_k8_steps_per_sec"] = round(n / (time.perf_counter() - t0), 2)
    report["b256_nll_final"] = round(
        float(np.asarray(jax.device_get(m["nll"]))[-1]), 1)
    report["mem_after_b256"] = mem_stats(dev)
    print(f"b256 k{k}: {report['b256_k8_steps_per_sec']} steps/s e2e",
          flush=True)

    # --- b1024 (threshold-gated encoder remat) next to both caches ---
    hp.batch_size = 1024
    state_big = train_state.init_train_state(jax.random.PRNGKey(1), spec,
                                             optimizer)
    step_big = train_state.make_train_step(spec, hp, optimizer)
    it_big = train_ds.epoch_index_batches(1024, rng=np.random.default_rng(2),
                                          shuffle=True, drop_last=True)
    mb = None
    for _ in range(args.big_steps):
        state_big, mb = step_big(state_big, batcher.get_batch(next(it_big)))
    hard_sync(mb)
    report["b1024_nll_final"] = round(float(jax.device_get(mb["nll"])), 1)
    report["mem_after_b1024"] = mem_stats(dev)
    del state_big

    # --- cached-val evaluation pass ---
    eval_step = train_state.make_eval_step(spec)
    val_it = val_ds.epoch_index_batches(256, shuffle=False)
    _, vloss, _ = eval_step(state.params, val_batcher.get_batch(next(val_it)))
    report["val_nll"] = round(float(vloss), 1)

    mem = report.get("mem_after_b1024") or report.get("mem_after_b256")
    if mem and mem.get("bytes_limit"):
        report["peak_gb"] = round(mem.get("peak_bytes_in_use", 0) / 1024**3,
                                  2)
        report["hbm_limit_gb"] = round(mem["bytes_limit"] / 1024**3, 2)
        report["headroom_gb"] = round(
            (mem["bytes_limit"] - mem.get("peak_bytes_in_use", 0)) / 1024**3,
            2)
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=1) + "\n")
    print(f"wrote {out_path}")
    print(json.dumps({key: report[key] for key in report
                      if not key.startswith("mem_")}, indent=1))


if __name__ == "__main__":
    main()

"""Sampling throughput vs batch size (both matmul precisions).

The bench's headline metric is batched autoregressive sampling frames/s per
chip at B=128; this probe checks whether larger batches raise the chip
throughput ceiling.

Usage: python tools/sampling_probe.py [b1 b2 ...]
"""

import sys

import jax

jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, ".")

from bench import bench_sampling, build_full_model  # noqa: E402

if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024]
    hp, spec, params = build_full_model()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    for b in sizes:
        fps, dt = bench_sampling(hp, spec, params, batch_size=b)
        print(f"f32-highest b={b:5d}: {fps:10.1f} frames/s "
              f"({dt*1e3:.1f} ms / 100 frames)", flush=True)
    with jax.default_matmul_precision("default"):
        for b in sizes:
            fps, dt = bench_sampling(hp, spec, params, batch_size=b)
            print(f"bf16        b={b:5d}: {fps:10.1f} frames/s "
                  f"({dt*1e3:.1f} ms / 100 frames)", flush=True)

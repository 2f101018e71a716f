"""Probe layouts for the all-frames conditioning projection.

project_cond_frames must deliver [N, K, B, c] for the (time x K) scans; the
current form does a flat [B*N, F] @ [F, K*c] matmul then a 470 MB/step
transpose(1,2,0,3). Variants move the (cheap, 70 MB) [B,N,F]->[N,B,F]
transpose *before* the matmul or let einsum fuse the layout.

Times fwd and fwd+bwd at the training envelope (B=256, N=56, K=16, c=512,
F=1217). Usage: python tools/projlayout_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

B, N, K, C, F = 256, 56, 16, 512, 1217


def variant_current(w, b, cond_all):
    bsz, n, f = cond_all.shape
    k, c, _ = w.shape
    flat = cond_all.reshape(bsz * n, f)
    wt = w.transpose(2, 0, 1).reshape(f, k * c)
    proj = (flat @ wt).reshape(bsz, n, k, c).transpose(1, 2, 0, 3)
    return proj + b[None, :, None, :]


def variant_pretranspose(w, b, cond_all):
    bsz, n, f = cond_all.shape
    k, c, _ = w.shape
    nbf = jnp.swapaxes(cond_all, 0, 1).reshape(n * bsz, f)
    wt = w.transpose(2, 0, 1).reshape(f, k * c)
    proj = (nbf @ wt).reshape(n, bsz, k, c).transpose(0, 2, 1, 3)
    return proj + b[None, :, None, :]


def variant_einsum(w, b, cond_all):
    proj = jnp.einsum("bnf,kcf->nkbc", cond_all, w)
    return proj + b[None, :, None, :]


def time_fn(fn, *args, iters=10):
    from lets_face_it_tpu.utils.timing import hard_sync as sync

    sync(fn(*args))

    def timed(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    return max(timed(2 * iters) - timed(iters), 1e-9) / iters


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, C, F), jnp.float32) * 0.02
    bias = jnp.zeros((K, C))
    cond = jax.random.normal(key, (B, N, F), jnp.float32)

    ref = None
    for name, fn in [("current", variant_current),
                     ("pretranspose", variant_pretranspose),
                     ("einsum", variant_einsum)]:
        jf = jax.jit(fn)

        def loss(w_, b_, c_, f=fn):
            return jnp.sum(f(w_, b_, c_) ** 2)

        jg = jax.jit(jax.grad(loss))
        fwd = time_fn(jf, w, bias, cond)
        bwd = time_fn(jg, w, bias, cond)
        out = jf(w, bias, cond)
        if ref is None:
            ref = out
        else:
            import numpy as np

            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-3)
        print(f"{name:14s} fwd={fwd*1e3:6.2f} ms   grad={bwd*1e3:6.2f} ms",
              flush=True)

"""Normalizing-flow primitive ops as pure functions.

Semantics match the reference flow modules
(/root/reference/code/glow_pytorch/glow/modules.py, thops.py) to NLL parity:

* actnorm / invconv log-determinants are multiplied by the channel count C —
  the reference inherits image-Glow's "per-pixel" convention and applies it to
  channels (modules.py:62,171).
* the affine-coupling scale is ``clamp(sigmoid(s + 2), min=scale_eps)``
  (models.py:335).
* channel split for coupling halves is contiguous ("split"), while shift/scale
  come from even/odd interleave ("cross") of the transform-net output
  (thops.py:36-44).
* the inverse of the LU 1x1 transform is computed with triangular solves
  instead of the reference's float64 explicit inverses (modules.py:175-177) —
  float64 is unavailable on TPU; triangular solves are numerically stabler than
  an explicit f32 inverse and validated by round-trip tests.

All ops take/return ``(z, logdet)`` where logdet is per-sample ``[B]``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

LOG2PI = math.log(2.0 * math.pi)
LN2 = math.log(2.0)


# ---------------------------------------------------------------------------
# ActNorm
# ---------------------------------------------------------------------------

def init_actnorm(num_features: int, dtype=jnp.float32):
    """Zeros until data-dependent init runs (see ``actnorm_data_init``)."""
    return {
        "bias": jnp.zeros((num_features,), dtype),
        "logs": jnp.zeros((num_features,), dtype),
    }


def actnorm_data_init(x, scale: float = 1.0):
    """Data-dependent init from a batch: output has ~zero mean, unit variance.

    Mirrors modules.py:32-43: bias = -mean(x), logs = log(scale/(std+1e-6)).
    Returns fresh actnorm params; caller stores them in the train state.
    """
    bias = -jnp.mean(x, axis=0)
    var = jnp.mean((x + bias) ** 2, axis=0)
    logs = jnp.log(scale / (jnp.sqrt(var) + 1e-6))
    return {"bias": bias, "logs": logs}


def actnorm_fwd(params, x, logdet):
    """(x + bias) * exp(logs); dlogdet = sum(logs) * C."""
    z = (x + params["bias"]) * jnp.exp(params["logs"])
    c = x.shape[-1]
    return z, logdet + jnp.sum(params["logs"]) * c


def actnorm_rev(params, z, logdet):
    x = z * jnp.exp(-params["logs"]) - params["bias"]
    c = z.shape[-1]
    return x, logdet - jnp.sum(params["logs"]) * c


# ---------------------------------------------------------------------------
# Invertible 1x1 "conv" (dense CxC mix), LU-decomposed
# ---------------------------------------------------------------------------

def init_invconv_lu(key, num_channels: int, dtype=jnp.float32):
    """Random orthogonal W = P L U; P and sign(s) are frozen buffers,
    strictly-lower L, log|s| and strictly-upper U are trained."""
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel())
    w = np.linalg.qr(rng.standard_normal((num_channels, num_channels)))[0]
    import scipy.linalg

    p, l, u = scipy.linalg.lu(w.astype(np.float64))
    s = np.diag(u)
    return {
        "p": jnp.asarray(p, dtype),                       # buffer (not trained)
        "sign_s": jnp.asarray(np.sign(s), dtype),         # buffer (not trained)
        "l": jnp.asarray(np.tril(l, -1), dtype),          # trained (strict lower)
        "log_s": jnp.asarray(np.log(np.abs(s)), dtype),   # trained
        "u": jnp.asarray(np.triu(u, 1), dtype),           # trained (strict upper)
    }


def invconv_buffers(params):
    """Names of non-trained leaves inside an invconv param dict."""
    return ("p", "sign_s")


def _lu_factors(params):
    c = params["log_s"].shape[0]
    eye = jnp.eye(c, dtype=params["l"].dtype)
    l_mask = jnp.tril(jnp.ones((c, c), params["l"].dtype), -1)
    l = params["l"] * l_mask + eye
    u = params["u"] * l_mask.T + jnp.diag(params["sign_s"] * jnp.exp(params["log_s"]))
    return l, u


def invconv_fwd(params, x, logdet):
    """z = x @ (P L U); dlogdet = sum(log|s|) * C."""
    l, u = _lu_factors(params)
    w = params["p"] @ l @ u
    z = x @ w
    c = x.shape[-1]
    return z, logdet + jnp.sum(params["log_s"]) * c


def invconv_rev(params, z, logdet):
    """x = z @ (P L U)^-1 via two triangular solves and a P^T rotation.

    y @ (P L U) = z  =>  y = ((z solve U) solve L) @ P^T, solved row-wise:
    solve U^T a^T = z^T (lower), then L^T b^T = a^T (upper).
    """
    l, u = _lu_factors(params)
    a = jax.scipy.linalg.solve_triangular(u.T, z.T, lower=True).T
    b = jax.scipy.linalg.solve_triangular(l.T, a.T, lower=False, unit_diagonal=True).T
    x = b @ params["p"].T
    c = z.shape[-1]
    return x, logdet - jnp.sum(params["log_s"]) * c


# ---------------------------------------------------------------------------
# Fixed permutations (working replacements for the reference's broken Permute2d,
# modules.py:98-119 — see SURVEY.md "known bit-rot")
# ---------------------------------------------------------------------------

def init_permute(key, num_channels: int, shuffle: bool):
    if shuffle:
        perm = jax.random.permutation(key, num_channels)
    else:
        perm = jnp.arange(num_channels)[::-1]
    inv = jnp.argsort(perm)
    return {"perm": perm, "inv": inv}


def permute_fwd(params, x, logdet):
    return x[..., params["perm"]], logdet


def permute_rev(params, z, logdet):
    return z[..., params["inv"]], logdet


# ---------------------------------------------------------------------------
# Linear layers
# ---------------------------------------------------------------------------

def init_linear(key, in_features: int, out_features: int, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming-uniform(a=sqrt(5)) == U(-k, k),
    k = 1/sqrt(fan_in), for both weight and bias."""
    k = 1.0 / math.sqrt(in_features)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_features, in_features), dtype, -k, k),
        "b": jax.random.uniform(kb, (out_features,), dtype, -k, k),
    }


def linear(params, x):
    return x @ params["w"].T + params["b"]


def init_linear_zeros(in_features: int, out_features: int, dtype=jnp.float32):
    """Zero-init linear with a learned log-scale (modules.py:83-95).
    Output = (xW^T + b) * exp(logs * 3)."""
    return {
        "w": jnp.zeros((out_features, in_features), dtype),
        "b": jnp.zeros((out_features,), dtype),
        "logs": jnp.zeros((out_features,), dtype),
    }


def linear_zeros(params, x, logscale_factor: float = 3.0):
    return (x @ params["w"].T + params["b"]) * jnp.exp(params["logs"] * logscale_factor)


# ---------------------------------------------------------------------------
# Coupling-half helpers (thops.py:36-48)
# ---------------------------------------------------------------------------

def split_half(z):
    """Contiguous halves along channels: (z[:, :C//2], z[:, C//2:])."""
    c = z.shape[-1]
    return z[..., : c // 2], z[..., c // 2 :]


def split_cross(h):
    """Even/odd interleave -> (shift, scale_raw)."""
    return h[..., 0::2], h[..., 1::2]


def cat_half(z1, z2):
    return jnp.concatenate([z1, z2], axis=-1)


def affine_scale(scale_raw, scale_eps: float):
    """clamp(sigmoid(s + 2), min=scale_eps) — models.py:335."""
    return jnp.maximum(jax.nn.sigmoid(scale_raw + 2.0), scale_eps)


# ---------------------------------------------------------------------------
# Standard-normal base density (modules.py:197-235)
# ---------------------------------------------------------------------------

def gaussian_logp(z):
    """Per-sample sum over channels of log N(z; 0, 1)."""
    return jnp.sum(-0.5 * (z ** 2 + LOG2PI), axis=-1)


def gaussian_sample(key, shape, eps_std: float = 1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * eps_std

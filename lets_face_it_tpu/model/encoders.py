"""Sliding-window conditioning encoders, batched over every frame at once.

The reference re-runs each modality encoder per time step inside a Python loop
(/root/reference/code/glow_pytorch/glow/models.py:55-80, 598-615). Here all
windows for all frames are gathered into one ``[B, N, h, D]`` tensor and the
encoder runs once: the RNN becomes a length-``h`` ``lax.scan`` whose per-step
batch is ``B*N`` — large, static-shape matmuls that tile onto the MXU, instead
of ``N`` separate tiny RNN invocations.

Window semantics (models.py:598-615): the agent's own face history is
``[t-h, t)`` (strictly past), every other modality is ``(t-h, t]`` — the
interlocutor's *current* frame is visible.

Frame-level dropout (models.py:55-58): during training a dropout mask is drawn
over whole frames of the history window (shape ``[B, N, h]``), zeroing entire
frames and scaling survivors by ``1/keep``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lets_face_it_tpu.core import ops, rnn
from lets_face_it_tpu.model.spec import CondSpec, EncSpec

# Concat order of the conditioning vector (models.py:127-145).
MODALITY_ORDER = ("p1_face", "p2_face", "p1_speech", "p2_speech")

# Estimated backward-saved activation bytes above which an RNN encoder's
# scan rematerializes its gates (see encode_windows).
_REMAT_THRESHOLD_BYTES = 3 * 2**30


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_modality_encoder(key, spec: EncSpec, dtype=jnp.float32):
    if spec.enc == "rnn":
        return {"rnn": rnn.init_gru_cell(key, spec.input_dim, spec.hidden_dim, dtype)}
    if spec.enc == "lstm":
        return {"rnn": rnn.init_lstm_cell(key, spec.input_dim, spec.hidden_dim, dtype)}
    if spec.enc == "mlp":
        return {"mlp": ops.init_linear(key, spec.input_dim * spec.history,
                                       spec.hidden_dim, dtype)}
    if spec.enc == "cnn":
        k = 1.0 / math.sqrt(spec.input_dim * spec.kernel_size)
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(
                kw, (spec.hidden_dim, spec.input_dim, spec.kernel_size), dtype, -k, k),
            "b": jax.random.uniform(kb, (spec.hidden_dim,), dtype, -k, k),
        }
    if spec.enc == "none":
        return {}
    raise NotImplementedError(spec.enc)


def init_feature_encoder(key, cond: CondSpec, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    params = {"p1_face": init_modality_encoder(keys[0], cond.p1_face, dtype)}
    for i, name in enumerate(("p2_face", "p1_speech", "p2_speech"), 1):
        spec = getattr(cond, name)
        if spec is not None:
            params[name] = init_modality_encoder(keys[i], spec, dtype)
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _frame_dropout(key, windows, rate: float):
    """Zero whole history frames; windows: [B, N, h, D]."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, windows.shape[:3]).astype(windows.dtype)
    return windows * (mask / keep)[..., None]


def encode_windows(spec: EncSpec, params, windows, *, rng=None, training=False):
    """Encode [B, N, h, D] windows -> [B, N, out_dim]."""
    if training and spec.dropout > 0.0:
        assert rng is not None, "dropout requires an rng key"
        windows = _frame_dropout(rng, windows, spec.dropout)

    b, n, h, d = windows.shape
    # The backward pass saves ~6 [h, B*N, H] gate buffers per RNN encoder —
    # the allocations that OOM the b1024 training step (30.9 GiB requested on
    # a 16 GiB v5e). Shapes are static, so decide at trace time: above the
    # threshold, recompute gates in the backward (only the hidden-state chain
    # is saved). Measured: unlocks b1024 at 1644 windows/s; ~1% step cost at
    # b512; b<=256 stays on the no-remat path (see docs/PERF.md).
    remat = 6 * h * b * n * spec.hidden_dim * 4 > _REMAT_THRESHOLD_BYTES
    if spec.enc == "rnn":
        flat = windows.reshape(b * n, h, d)
        _, h_last = rnn.gru_scan(params["rnn"], flat, remat=remat)
        out = jnp.concatenate([h_last, h_last], axis=-1)
        return out.reshape(b, n, spec.out_dim)
    if spec.enc == "lstm":
        flat = windows.reshape(b * n, h, d)
        _, (h_last, _) = rnn.lstm_scan(params["rnn"], flat, remat=remat)
        out = jnp.concatenate([h_last, h_last], axis=-1)
        return out.reshape(b, n, spec.out_dim)
    if spec.enc == "mlp":
        flat = windows.reshape(b, n, h * d)
        return jax.nn.leaky_relu(ops.linear(params["mlp"], flat), 0.01)
    if spec.enc == "cnn":
        lhs = windows.reshape(b * n, h, d).transpose(0, 2, 1)  # [B*N, D, h]
        out = jax.lax.conv_general_dilated(
            lhs, params["w"], window_strides=(1,),
            padding=[(spec.kernel_size // 2, spec.kernel_size // 2)],
        ) + params["b"][None, :, None]
        out = out.transpose(0, 2, 1).reshape(b, n, -1)  # [B, N, h_out * hidden]
        return out
    if spec.enc == "none":
        return windows.reshape(b, n, h * d)
    raise NotImplementedError(spec.enc)


def own_face_windows(x, times, history: int):
    """Strictly-past windows [t-h, t). x: [B, T, D], times: [N] -> [B, N, h, D]."""
    offsets = jnp.arange(-history, 0)
    idx = times[:, None] + offsets[None, :]
    return x[:, idx]


def other_windows(x, times, history: int):
    """Windows (t-h, t] including the current frame. -> [B, N, h, D]."""
    offsets = jnp.arange(-history + 1, 1)
    idx = times[:, None] + offsets[None, :]
    return x[:, idx]


def encode_conditioning(cond: CondSpec, params, batch, prev_p1_faces, times,
                        *, frame_nbs=None, rng=None, training=False):
    """Full conditioning vector for every frame: -> [B, N, feature_dim].

    ``prev_p1_faces`` supplies the agent's own face history (teacher-forced
    during training this is just ``batch['p1_face']``); other modalities come
    from ``batch``. ``frame_nbs`` is [B, N, 1] when ``use_frame_nb``.
    """
    if rng is None:
        rngs = {m: None for m in MODALITY_ORDER}
    else:
        keys = jax.random.split(rng, 4)
        rngs = dict(zip(MODALITY_ORDER, keys))

    parts = []
    if cond.p1_face.out_dim > 0:
        parts.append(encode_windows(
            cond.p1_face, params["p1_face"],
            own_face_windows(prev_p1_faces, times, cond.p1_face.history),
            rng=rngs["p1_face"], training=training))

    for name in ("p2_face", "p1_speech", "p2_speech"):
        spec = getattr(cond, name)
        if spec is not None:
            parts.append(encode_windows(
                spec, params[name],
                other_windows(batch[name], times, spec.history),
                rng=rngs[name], training=training))

    if cond.use_frame_nb:
        assert frame_nbs is not None
        parts.append(frame_nbs)

    if not parts:
        b = prev_p1_faces.shape[0]
        return jnp.zeros((b, times.shape[0], 0), prev_p1_faces.dtype)
    return jnp.concatenate(parts, axis=-1)


def encode_fixed_conditioning(cond: CondSpec, params, batch, times,
                              *, frame_nbs=None, rng=None, training=False):
    """The non-autoregressive slice of the conditioning vector — everything
    except the agent's own face encoding — precomputed for all frames before
    the sampling scan. -> [B, N, feature_dim - p1_face.out_dim]."""
    if rng is None:
        rngs = {m: None for m in MODALITY_ORDER}
    else:
        keys = jax.random.split(rng, 4)
        rngs = dict(zip(MODALITY_ORDER, keys))

    parts = []
    for name in ("p2_face", "p1_speech", "p2_speech"):
        spec = getattr(cond, name)
        if spec is not None:
            parts.append(encode_windows(
                spec, params[name],
                other_windows(batch[name], times, spec.history),
                rng=rngs[name], training=training))
    if cond.use_frame_nb:
        assert frame_nbs is not None
        parts.append(frame_nbs)
    if not parts:
        b = batch["p1_face"].shape[0]
        return jnp.zeros((b, times.shape[0], 0), batch["p1_face"].dtype)
    return jnp.concatenate(parts, axis=-1)


def encode_p1_face_single(cond: CondSpec, params, face_hist, *, rng=None,
                          training=False):
    """Encode one own-face history window [B, h, D] -> [B, out_dim]
    (used inside the autoregressive sampling scan)."""
    out = encode_windows(cond.p1_face, params["p1_face"], face_hist[:, None],
                         rng=rng, training=training)
    return out[:, 0]

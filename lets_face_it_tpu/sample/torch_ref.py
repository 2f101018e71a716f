"""Independent PyTorch re-evaluation of the sequence NLL AND the
autoregressive generation path, used to verify parity of imported/exported
checkpoints (tests/test_torch_parity.py, tests/test_generation_oracle.py, and
the ``nll_parity_rel_err`` field of bench.py).

This is NOT the reference codebase: it is a self-contained float64
implementation of the published model semantics built from torch primitives,
parameterized by the exported state dict (sample/torch_import.py names).
``torch_sequence_nll`` mirrors the teacher-forced forward (reference
models.py:534-565); ``torch_sequence_inference`` mirrors the inference-time
decode — zero-or-GT-seeded own-face history growing by appended generated
frames, per-frame window assembly with the ``[t-h, t)`` own-face vs
``(t-h, t]`` other-modality conventions, reversed-layer flow decode with the
coupling GRU states updating in forward-time order, consuming a
caller-supplied z-stream (models.py:567-615, 345-373).
"""

import math

import numpy as np
import torch

_T = torch.float64  # run in f64 so torch itself contributes no error


def _p_loader(state):
    def P(name):
        return torch.from_numpy(np.asarray(state[name])).to(_T)

    return P


def _gru_cell(gi, gh, h_prev):
    """One torch-convention GRU cell update from precomputed gate
    projections gi = x@W_ih.T + b_ih and gh = h@W_hh.T + b_hh."""
    i_r, i_z, i_n = gi.chunk(3, dim=1)
    h_r, h_z, h_n = gh.chunk(3, dim=1)
    r = torch.sigmoid(i_r + h_r)
    z = torch.sigmoid(i_z + h_z)
    n = torch.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h_prev


def _lstm_cell(gates, h_prev, c_prev):
    """One torch-convention LSTM cell update from the summed gate
    projections (i, f, g, o chunk order); returns (h, c)."""
    i, f, g, o = gates.chunk(4, dim=1)
    i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
    c = f * c_prev + i * torch.tanh(g)
    return o * torch.tanh(c), c


def _window_rnn(P, prefix, window):
    """Single-layer GRU or LSTM over [B, h, D] (detected by the gate-count
    of W_ih); returns concat(h_T, h_T) — the reference ModalityEncoder
    quirk (models.py:64,69; for a single layer, last output == h_T in both
    cell types)."""
    w_ih, w_hh = P(f"{prefix}.weight_ih_l0"), P(f"{prefix}.weight_hh_l0")
    b_ih, b_hh = P(f"{prefix}.bias_ih_l0"), P(f"{prefix}.bias_hh_l0")
    hdim = w_hh.shape[1]
    is_lstm = w_ih.shape[0] == 4 * hdim
    h = torch.zeros(window.shape[0], hdim, dtype=_T)
    c = torch.zeros_like(h)
    for step in range(window.shape[1]):
        gi = window[:, step] @ w_ih.T + b_ih
        gh = h @ w_hh.T + b_hh
        if is_lstm:
            h, c = _lstm_cell(gi + gh, h, c)
        else:
            h = _gru_cell(gi, gh, h)
    return torch.cat([h, h], dim=1)


def _cond_vector(P, cond_cfg, prev_p1_faces, data, ts, frame_nb=None):
    """Per-frame conditioning assembly (models.py:598-615): own face sliced
    ``[t-h, t)`` from ``prev_p1_faces`` (which, at inference, grows with the
    generated frames), other modalities ``(t-h, t]`` from ``data`` through
    their GRU window encoders, optional scalar frame number last."""
    b = prev_p1_faces.shape[0]
    parts = []
    if cond_cfg["p1_face"].get("dim", prev_p1_faces.shape[-1]):
        h1 = cond_cfg["p1_face"]["history"]
        parts.append(prev_p1_faces[:, ts - h1:ts].reshape(b, -1))
    for name in ("p2_face", "p1_speech", "p2_speech"):
        h = cond_cfg[name]["history"]
        if h:
            win = data[name][:, ts - h + 1:ts + 1]
            parts.append(_window_rnn(
                P, f"seq_glow.feature_encoder.{name}_encoder.encoder", win))
    if frame_nb is not None:
        parts.append(frame_nb)
    return torch.cat(parts, dim=1)


def _coupling_f(P, pre, z1, cond, state):
    """The coupling transform f (models.py:148-214): LeakyReLU cond
    projection, GRUCell/LSTMCell advance (detected by the gate-count of
    W_ih), zero-init head with 3x logscale. Returns
    (shift, scale_raw, new_state) where state is h for GRU and (h, c) for
    LSTM; the cell-state update is the side effect that threads through
    time. (Zero initial LSTM state is the obvious reading of the
    reference's ``init_rnn_hidden`` — its literal LSTM path passes
    ``(None, None)`` to LSTMCell on the first frame and would crash
    (models.py:196-213), one more latent bug in the never-shipped LSTM
    configuration; GRU's None ⇒ zeros behavior is what it intended.)"""
    cw = P(f"{pre}.f.cond_transform.0.weight")
    cb = P(f"{pre}.f.cond_transform.0.bias")
    cond_t = torch.nn.functional.leaky_relu(cond @ cw.T + cb, 0.01)
    rnn_in = torch.cat([z1, cond_t], dim=1)
    w_ih, w_hh = P(f"{pre}.f.rnn.weight_ih"), P(f"{pre}.f.rnn.weight_hh")
    b_ih, b_hh = P(f"{pre}.f.rnn.bias_ih"), P(f"{pre}.f.rnn.bias_hh")
    hdim = w_hh.shape[1]
    is_lstm = w_ih.shape[0] == 4 * hdim
    if state is None:
        h_prev = torch.zeros(z1.shape[0], hdim, dtype=_T)
        state = (h_prev, torch.zeros_like(h_prev)) if is_lstm else h_prev
    gi = rnn_in @ w_ih.T + b_ih
    if is_lstm:
        h_prev, c_prev = state
        h_new, c_new = _lstm_cell(gi + h_prev @ w_hh.T + b_hh, h_prev,
                                  c_prev)
        new_state = (h_new, c_new)
    else:
        h_new = _gru_cell(gi, state @ w_hh.T + b_hh, state)
        new_state = h_new
    fw = P(f"{pre}.f.final_linear.weight")
    fb = P(f"{pre}.f.final_linear.bias")
    flogs = P(f"{pre}.f.final_linear.logs")
    hout = (h_new @ fw.T + fb) * torch.exp(flogs * 3.0)
    # "cross" split: shift = even, scale = odd channels (thops.py:36-44)
    return hout[:, 0::2], hout[:, 1::2], new_state


def _invconv_weight(P, pre, cc, reverse):
    """LU-composed 1x1 weight (modules.py:149-178); the reverse weight is
    built from f64 inverses exactly like the reference."""
    p_m = P(f"{pre}.invconv.p")
    sign_s = P(f"{pre}.invconv.sign_s")
    low = P(f"{pre}.invconv.l")
    log_s = P(f"{pre}.invconv.log_s")
    upp = P(f"{pre}.invconv.u")
    l_mask = torch.tril(torch.ones(cc, cc, dtype=_T), -1)
    l_m = low * l_mask + torch.eye(cc, dtype=_T)
    u_m = upp * l_mask.T + torch.diag(sign_s * torch.exp(log_s))
    if reverse:
        return torch.inverse(u_m) @ torch.inverse(l_m) @ p_m.inverse(), log_s
    return p_m @ l_m @ u_m, log_s


def _layer_forward(P, pre, z, cond, h_prev, scale_eps):
    """One FlowStep forward (models.py:311-342): actnorm -> LU invconv ->
    affine GRU coupling. Returns (z, dlogdet [B], h_new)."""
    cc = z.shape[1]
    bias = P(f"{pre}.actnorm.bias")[0]
    logs = P(f"{pre}.actnorm.logs")[0]
    z = (z + bias) * torch.exp(logs)
    logdet = torch.full((z.shape[0],), float(logs.sum()) * cc, dtype=_T)
    w, log_s = _invconv_weight(P, pre, cc, reverse=False)
    z = z @ w
    logdet = logdet + log_s.sum() * cc
    z1, z2 = z[:, :cc // 2], z[:, cc // 2:]
    shift, scale_raw, h_new = _coupling_f(P, pre, z1, cond, h_prev)
    scale = torch.sigmoid(scale_raw + 2.0).clamp(scale_eps)
    z2 = (z2 + shift) * scale
    logdet = logdet + torch.log(scale).sum(dim=1)
    return torch.cat([z1, z2], dim=1), logdet, h_new


def _layer_reverse(P, pre, z, cond, h_prev, scale_eps):
    """One FlowStep reverse (models.py:345-373): coupling inverse
    (z2/scale - shift) -> inverse invconv -> inverse actnorm. The coupling
    GRU advances here too — decode-time states update in forward-TIME order
    even though layers run in reverse order (models.py:204-214 via :356-364).
    """
    cc = z.shape[1]
    z1, z2 = z[:, :cc // 2], z[:, cc // 2:]
    shift, scale_raw, h_new = _coupling_f(P, pre, z1, cond, h_prev)
    scale = torch.sigmoid(scale_raw + 2.0).clamp(scale_eps)
    z2 = z2 / scale - shift
    z = torch.cat([z1, z2], dim=1)
    w_inv, _ = _invconv_weight(P, pre, cc, reverse=True)
    z = z @ w_inv
    bias = P(f"{pre}.actnorm.bias")[0]
    logs = P(f"{pre}.actnorm.logs")[0]
    return z * torch.exp(-logs) - bias, h_new


def torch_sequence_nll(state, hp, batch):
    """Reference-semantics teacher-forced forward in torch, parameterized by
    the exported state dict (names as in the reference module tree)."""
    P = _p_loader(state)
    cond_cfg = hp.Conditioning
    x = torch.from_numpy(batch["p1_face"]).to(_T)
    b, seq_len, c = x.shape
    start = max(cond_cfg[m]["history"] for m in
                ("p1_face", "p1_speech", "p2_face", "p2_speech"))

    data = {k: torch.from_numpy(batch[k]).to(_T)
            for k in ("p1_speech", "p2_speech", "p2_face")}

    k_steps = hp.Glow["K"]
    gru_states = [None] * k_steps
    losses = []
    for ts in range(start, seq_len):
        cond = _cond_vector(P, cond_cfg, x, data, ts)
        z = x[:, ts]
        logdet = torch.zeros(b, dtype=_T)
        for k in range(k_steps):
            z, dlogdet, gru_states[k] = _layer_forward(
                P, f"seq_glow.glow.flow.layers.{k}", z, cond, gru_states[k],
                hp.Glow["scale_eps"])
            logdet = logdet + dlogdet
        logp = (-0.5 * (z ** 2 + math.log(2 * math.pi))).sum(dim=1)
        losses.append((-(logdet + logp) / math.log(2.0)).mean())
    return float(torch.stack(losses).mean())


def torch_sequence_inference(state, hp, data, z_stream):
    """Reference-semantics autoregressive decode (models.py:567-596),
    consuming a caller-supplied z-stream so it can be compared frame-by-frame
    against ``seqglow.sequence_sample(..., z_seq=...)``.

    ``data``: numpy dict — ``p1_face`` [B, >=start, C] seeds the own-face
    history (the logger passes exactly the first ``longest_history`` frames,
    mimicry_logger.py:165-169; generate_motion zeroes them); the other
    modalities are [B, seq_len, D]. ``z_stream`` [N, B, C] supplies the
    latent of each generated frame verbatim (the reference samples
    z ~ N(0, eps^2) at models.py:508-513 — scaling by eps is the caller's
    job here). Returns the generated frames [B, N, C].

    Matches the reference exactly on: the growing ``prev_p1_faces`` history
    (generated frames enter the own-face window), the ``(t-h, t]`` other-
    modality windows, reversed-layer decode with coupling GRU states
    persisting across frames, and — when ``use_frame_nb`` — the decode-time
    frame counter that starts at ONE (not at the batch's frame_nb;
    models.py:571-575) and steps by 2.
    """
    P = _p_loader(state)
    cond_cfg = hp.Conditioning
    prev_p1 = torch.from_numpy(np.asarray(data["p1_face"])).to(_T)
    b = prev_p1.shape[0]
    start = max(cond_cfg[m]["history"] for m in
                ("p1_face", "p1_speech", "p2_face", "p2_speech"))
    prev_p1 = prev_p1[:, :start]

    tdata = {k: torch.from_numpy(np.asarray(data[k])).to(_T)
             for k in ("p1_speech", "p2_speech", "p2_face") if k in data}
    zs = torch.from_numpy(np.asarray(z_stream)).to(_T)
    n = zs.shape[0]

    frame_nb = (torch.ones((b, 1), dtype=_T)
                if cond_cfg.get("use_frame_nb") else None)

    k_steps = hp.Glow["K"]
    gru_states = [None] * k_steps
    for i in range(n):
        ts = start + i
        cond = _cond_vector(P, cond_cfg, prev_p1, tdata, ts,
                            frame_nb=frame_nb)
        z = zs[i]
        for k in reversed(range(k_steps)):
            z, gru_states[k] = _layer_reverse(
                P, f"seq_glow.glow.flow.layers.{k}", z, cond, gru_states[k],
                hp.Glow["scale_eps"])
        prev_p1 = torch.cat([prev_p1, z[:, None]], dim=1)
        if frame_nb is not None:
            frame_nb = frame_nb + 2
    return prev_p1[:, start:].numpy()

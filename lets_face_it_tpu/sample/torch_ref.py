"""Independent PyTorch re-evaluation of the sequence NLL, used to verify
parity of imported/exported checkpoints (tests/test_torch_parity.py, and the
``nll_parity_rel_err`` field of bench.py).

This is NOT the reference codebase: it is a self-contained float64
implementation of the published model semantics built from torch primitives,
parameterized by the exported state dict (sample/torch_import.py names).
"""

import math

import numpy as np
import torch


def torch_sequence_nll(state, hp, batch):
    """Reference-semantics forward in torch, parameterized by the exported
    state dict (names as in the reference module tree)."""
    t = torch.float64  # run in f64 so torch itself contributes no error

    def P(name):
        return torch.from_numpy(np.asarray(state[name])).to(t)

    cond_cfg = hp.Conditioning
    x = torch.from_numpy(batch["p1_face"]).to(t)
    b, seq_len, c = x.shape
    start = max(cond_cfg[m]["history"] for m in
                ("p1_face", "p1_speech", "p2_face", "p2_speech"))

    def gru_window(prefix, window):
        """Single-layer GRU over [B, h, D]; returns concat(h_T, h_T)."""
        w_ih, w_hh = P(f"{prefix}.weight_ih_l0"), P(f"{prefix}.weight_hh_l0")
        b_ih, b_hh = P(f"{prefix}.bias_ih_l0"), P(f"{prefix}.bias_hh_l0")
        hdim = w_hh.shape[1]
        h = torch.zeros(window.shape[0], hdim, dtype=t)
        for step in range(window.shape[1]):
            gi = window[:, step] @ w_ih.T + b_ih
            gh = h @ w_hh.T + b_hh
            i_r, i_z, i_n = gi.chunk(3, dim=1)
            h_r, h_z, h_n = gh.chunk(3, dim=1)
            r = torch.sigmoid(i_r + h_r)
            z = torch.sigmoid(i_z + h_z)
            n = torch.tanh(i_n + r * h_n)
            h = (1 - z) * n + z * h
        return torch.cat([h, h], dim=1)

    speech = {k: torch.from_numpy(batch[k]).to(t)
              for k in ("p1_speech", "p2_speech")}
    p2_face = torch.from_numpy(batch["p2_face"]).to(t)

    k_steps = hp.Glow["K"]
    gru_states = [None] * k_steps
    losses = []
    for ts in range(start, seq_len):
        # conditioning: own face [t-h, t) flattened (absent in the no_face
        # ablation, p1_face.dim 0); others (t-h, t] via GRU
        parts = []
        if cond_cfg["p1_face"].get("dim", c):
            parts.append(
                x[:, ts - cond_cfg["p1_face"]["history"]:ts].reshape(b, -1))
        for name, data in (("p2_face", p2_face),
                           ("p1_speech", speech["p1_speech"]),
                           ("p2_speech", speech["p2_speech"])):
            h = cond_cfg[name]["history"]
            if h:
                win = data[:, ts - h + 1:ts + 1]
                parts.append(gru_window(
                    f"seq_glow.feature_encoder.{name}_encoder.encoder", win))
        cond = torch.cat(parts, dim=1)

        z = x[:, ts]
        logdet = torch.zeros(b, dtype=t)
        for k in range(k_steps):
            pre = f"seq_glow.glow.flow.layers.{k}"
            # actnorm
            bias = P(f"{pre}.actnorm.bias")[0]
            logs = P(f"{pre}.actnorm.logs")[0]
            z = (z + bias) * torch.exp(logs)
            logdet = logdet + logs.sum() * c
            # LU invconv
            p_m = P(f"{pre}.invconv.p")
            sign_s = P(f"{pre}.invconv.sign_s")
            low = P(f"{pre}.invconv.l")
            log_s = P(f"{pre}.invconv.log_s")
            upp = P(f"{pre}.invconv.u")
            cc = z.shape[1]
            l_mask = torch.tril(torch.ones(cc, cc, dtype=t), -1)
            l_m = low * l_mask + torch.eye(cc, dtype=t)
            u_m = upp * l_mask.T + torch.diag(sign_s * torch.exp(log_s))
            z = z @ (p_m @ l_m @ u_m)
            logdet = logdet + log_s.sum() * cc
            # affine coupling with GRUCell
            z1, z2 = z[:, :cc // 2], z[:, cc // 2:]
            cw = P(f"{pre}.f.cond_transform.0.weight")
            cb = P(f"{pre}.f.cond_transform.0.bias")
            cond_t = torch.nn.functional.leaky_relu(cond @ cw.T + cb, 0.01)
            rnn_in = torch.cat([z1, cond_t], dim=1)
            w_ih, w_hh = P(f"{pre}.f.rnn.weight_ih"), P(f"{pre}.f.rnn.weight_hh")
            b_ih, b_hh = P(f"{pre}.f.rnn.bias_ih"), P(f"{pre}.f.rnn.bias_hh")
            hdim = w_hh.shape[1]
            h_prev = (gru_states[k] if gru_states[k] is not None
                      else torch.zeros(b, hdim, dtype=t))
            gi = rnn_in @ w_ih.T + b_ih
            gh = h_prev @ w_hh.T + b_hh
            i_r, i_z, i_n = gi.chunk(3, dim=1)
            h_r, h_z, h_n = gh.chunk(3, dim=1)
            r = torch.sigmoid(i_r + h_r)
            zz = torch.sigmoid(i_z + h_z)
            n = torch.tanh(i_n + r * h_n)
            h_new = (1 - zz) * n + zz * h_prev
            gru_states[k] = h_new
            fw = P(f"{pre}.f.final_linear.weight")
            fb = P(f"{pre}.f.final_linear.bias")
            flogs = P(f"{pre}.f.final_linear.logs")
            hout = (h_new @ fw.T + fb) * torch.exp(flogs * 3.0)
            shift, scale_raw = hout[:, 0::2], hout[:, 1::2]
            scale = torch.sigmoid(scale_raw + 2.0).clamp(hp.Glow["scale_eps"])
            z2 = (z2 + shift) * scale
            logdet = logdet + torch.log(scale).sum(dim=1)
            z = torch.cat([z1, z2], dim=1)

        logp = (-0.5 * (z ** 2 + math.log(2 * math.pi))).sum(dim=1)
        losses.append((-(logdet + logp) / math.log(2.0)).mean())
    return float(torch.stack(losses).mean())



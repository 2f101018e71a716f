"""End-to-end NLL parity against an independent PyTorch implementation.

Builds the reference's model semantics from torch.nn primitives (GRU window
encoders with the concat(last, h) quirk, K flow steps of actnorm -> LU 1x1 ->
GRUCell affine coupling, the xC logdet convention, bits loss), loads OUR
initialized weights into it via the exported state dict, and checks the
teacher-forced sequence NLL matches to float tolerance.

This is the strongest available stand-in for BASELINE config 3 (seeded parity
vs the published PyTorch checkpoint — the checkpoint itself isn't
distributable into this environment); combined with the state-dict name
mapping test it guarantees imported reference checkpoints evaluate
identically.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from lets_face_it_tpu.model import FlowSpec, init_seqglow, seqglow  # noqa: E402
from lets_face_it_tpu.sample import export_state_dict  # noqa: E402

from test_sample import final_like_hparams  # noqa: E402


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
        # conditioning: own face [t-h, t) flattened; others (t-h, t] via GRU
        parts = [x[:, ts - cond_cfg["p1_face"]["history"]:ts].reshape(b, -1)]
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


def test_sequence_nll_matches_independent_torch():
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(3), spec)
    # perturb trainable leaves so couplings/scales are non-trivial
    from lets_face_it_tpu.model import flow as flow_mod

    mask = flow_mod.trainable_mask(params.flow)
    pflow = jax.tree.map(
        lambda x, m: x + 0.05 * jax.random.normal(jax.random.PRNGKey(8), x.shape)
        if m else x, params.flow, mask)
    params = params._replace(flow=pflow)

    rng = np.random.default_rng(0)
    batch = {
        "p1_face": rng.standard_normal((3, 32, 56)).astype(np.float32),
        "p2_face": rng.standard_normal((3, 32, 56)).astype(np.float32),
        "p1_speech": rng.standard_normal((3, 32, 30)).astype(np.float32),
        "p2_speech": rng.standard_normal((3, 32, 30)).astype(np.float32),
    }

    _, loss_jax, _ = seqglow.sequence_nll(spec, params, batch)
    state = export_state_dict(params, spec)
    loss_torch = torch_sequence_nll(state, hp, batch)

    assert float(loss_jax) == pytest.approx(loss_torch, rel=2e-5), (
        float(loss_jax), loss_torch)

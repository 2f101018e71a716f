"""Import PyTorch-Lightning checkpoints from the reference implementation.

Maps the reference's ``state_dict`` names (glow_pytorch module tree) onto the
stacked parameter pytree of this framework, so checkpoints trained with the
PyTorch codebase sample/evaluate here with per-frame parity:

  seq_glow.feature_encoder.<m>_encoder.encoder.{weight_ih_l0,...}  -> encoder[m]["rnn"]
  seq_glow.feature_encoder.<m>_encoder.encoder.0.{weight,bias}     -> encoder[m]["mlp"] (MLP variant)
  seq_glow.glow.flow.layers.<k>.actnorm.{bias,logs} [1, C]         -> flow["actnorm"] (stacked [K, C])
  seq_glow.glow.flow.layers.<k>.invconv.{p,sign_s,l,log_s,u}       -> flow["perm"]
  seq_glow.glow.flow.layers.<k>.f.rnn.{weight_ih,...}              -> flow["rnn"]
  seq_glow.glow.flow.layers.<k>.f.cond_transform.0.{weight,bias}   -> flow["cond_proj"]
  seq_glow.glow.flow.layers.<k>.f.final_linear.{weight,bias,logs}  -> flow["out"]

The LU buffers p/sign_s are registered buffers in the reference
(modules.py:139-140) and frozen buffers here. ActNorm init state is implied:
an imported checkpoint is always treated as actnorm-inited
(models.py:515-518).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.model import SeqGlowParams
from lets_face_it_tpu.model.spec import FlowSpec

_ENCODERS = ("p1_face", "p2_face", "p1_speech", "p2_speech")


def load_state_dict(ckpt_path) -> dict[str, np.ndarray]:
    """Read a Lightning .ckpt (torch zip) and return numpy state_dict."""
    import torch

    payload = torch.load(Path(ckpt_path), map_location="cpu",
                         weights_only=False)
    state = payload.get("state_dict", payload)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in state.items()}


def import_torch_checkpoint(ckpt_path_or_state, spec: FlowSpec,
                            dtype=jnp.float32) -> SeqGlowParams:
    if isinstance(ckpt_path_or_state, (str, Path)):
        state = load_state_dict(ckpt_path_or_state)
    else:
        state = {k: np.asarray(v) for k, v in ckpt_path_or_state.items()}

    def arr(name):
        if name not in state:
            raise KeyError(f"missing parameter {name!r} in checkpoint "
                           f"(have e.g. {sorted(state)[:5]}...)")
        return np.asarray(state[name])

    # --- conditioning encoders ---
    encoder: dict = {}
    for m in _ENCODERS:
        espec = getattr(spec.cond, m)
        prefix = f"seq_glow.feature_encoder.{m}_encoder"
        if espec is None or espec.out_dim == 0:
            if m == "p1_face":
                encoder[m] = {}
            continue
        if espec.enc in ("rnn", "lstm"):
            encoder[m] = {"rnn": {
                "w_ih": arr(f"{prefix}.encoder.weight_ih_l0"),
                "w_hh": arr(f"{prefix}.encoder.weight_hh_l0"),
                "b_ih": arr(f"{prefix}.encoder.bias_ih_l0"),
                "b_hh": arr(f"{prefix}.encoder.bias_hh_l0"),
            }}
        elif espec.enc == "mlp":
            encoder[m] = {"mlp": {"w": arr(f"{prefix}.encoder.0.weight"),
                                  "b": arr(f"{prefix}.encoder.0.bias")}}
        elif espec.enc == "cnn":
            encoder[m] = {"w": arr(f"{prefix}.encoder.weight"),
                          "b": arr(f"{prefix}.encoder.bias")}
        else:  # "none"
            encoder[m] = {}

    # --- flow steps, stacked on a leading K axis ---
    k_steps = spec.n_steps

    def step_arr(k, name):
        return arr(f"seq_glow.glow.flow.layers.{k}.{name}")

    def stack(name, transform=lambda x: x):
        return jnp.asarray(
            np.stack([transform(step_arr(k, name)) for k in range(k_steps)]),
            dtype)

    flow = {
        "actnorm": {
            "bias": stack("actnorm.bias", lambda x: x.reshape(-1)),
            "logs": stack("actnorm.logs", lambda x: x.reshape(-1)),
        },
        "rnn": {
            "w_ih": stack("f.rnn.weight_ih"),
            "w_hh": stack("f.rnn.weight_hh"),
            "b_ih": stack("f.rnn.bias_ih"),
            "b_hh": stack("f.rnn.bias_hh"),
        },
        "cond_proj": {
            "w": stack("f.cond_transform.0.weight"),
            "b": stack("f.cond_transform.0.bias"),
        },
        "out": {
            "w": stack("f.final_linear.weight"),
            "b": stack("f.final_linear.bias"),
            "logs": stack("f.final_linear.logs"),
        },
    }
    if spec.permutation == "invconv":
        flow["perm"] = {
            "p": stack("invconv.p"),
            "sign_s": stack("invconv.sign_s"),
            "l": stack("invconv.l"),
            "log_s": stack("invconv.log_s"),
            "u": stack("invconv.u"),
        }
    else:
        raise NotImplementedError(
            "reference checkpoints only ship invconv permutations")

    encoder = {k: _tree_to_jnp(v, dtype) for k, v in encoder.items()}
    return SeqGlowParams(encoder=encoder, flow=flow)


def export_state_dict(params: SeqGlowParams, spec: FlowSpec) -> dict:
    """Inverse mapping (for round-trip tests and PyTorch interop)."""
    state: dict[str, np.ndarray] = {}
    for m in _ENCODERS:
        espec = getattr(spec.cond, m)
        if espec is None or espec.out_dim == 0 or m not in params.encoder:
            continue
        prefix = f"seq_glow.feature_encoder.{m}_encoder"
        p = params.encoder[m]
        if espec.enc in ("rnn", "lstm"):
            state[f"{prefix}.encoder.weight_ih_l0"] = np.asarray(p["rnn"]["w_ih"])
            state[f"{prefix}.encoder.weight_hh_l0"] = np.asarray(p["rnn"]["w_hh"])
            state[f"{prefix}.encoder.bias_ih_l0"] = np.asarray(p["rnn"]["b_ih"])
            state[f"{prefix}.encoder.bias_hh_l0"] = np.asarray(p["rnn"]["b_hh"])
        elif espec.enc == "mlp":
            state[f"{prefix}.encoder.0.weight"] = np.asarray(p["mlp"]["w"])
            state[f"{prefix}.encoder.0.bias"] = np.asarray(p["mlp"]["b"])

    f = params.flow
    for k in range(spec.n_steps):
        pre = f"seq_glow.glow.flow.layers.{k}"
        state[f"{pre}.actnorm.bias"] = np.asarray(f["actnorm"]["bias"][k])[None]
        state[f"{pre}.actnorm.logs"] = np.asarray(f["actnorm"]["logs"][k])[None]
        for name in ("p", "sign_s", "l", "log_s", "u"):
            state[f"{pre}.invconv.{name}"] = np.asarray(f["perm"][name][k])
        for ours, theirs in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                             ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
            state[f"{pre}.f.rnn.{theirs}"] = np.asarray(f["rnn"][ours][k])
        state[f"{pre}.f.cond_transform.0.weight"] = np.asarray(f["cond_proj"]["w"][k])
        state[f"{pre}.f.cond_transform.0.bias"] = np.asarray(f["cond_proj"]["b"][k])
        state[f"{pre}.f.final_linear.weight"] = np.asarray(f["out"]["w"][k])
        state[f"{pre}.f.final_linear.bias"] = np.asarray(f["out"]["b"][k])
        state[f"{pre}.f.final_linear.logs"] = np.asarray(f["out"]["logs"][k])
    return state


def _tree_to_jnp(tree, dtype):
    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v, dtype) for k, v in tree.items()}
    return jnp.asarray(tree, dtype)

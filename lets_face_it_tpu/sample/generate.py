"""Model-space generation: checkpoint + packed frame matrix -> de-standardized
106-D face sequences (reference generate_motion_from_model.py, with the
bit-rot fixed — the reference calls missing modules/attributes; see SURVEY.md).

Packed 273-D frame layout (generate_motion_from_model.py:73-87):
  [0:106]    p1 face  (expression at 0, jaw at 100, neck at 103)
  [106:136]  p1 speech (26 mfcc + 4 prosody)
  [136:242]  p2 face  (same block layout offset by 136)
  [242:272]  p2 speech
  [272]      frame_nb
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.data.windows import face_means_stds, load_standardization
from lets_face_it_tpu.hparams import HParams, load_hparams
from lets_face_it_tpu.model import FlowSpec, SeqGlowParams, seqglow
from lets_face_it_tpu.utils.misc import get_face_indicies


def dictify_frames(frames: np.ndarray, data_hparams: dict) -> dict:
    """[T, 273] packed rows -> modality dict (un-batched)."""
    exp, jaw, neck = (data_hparams["expression_dim"], data_hparams["jaw_dim"],
                      data_hparams["neck_dim"])
    speech = data_hparams["speech_dim"]
    left = get_face_indicies(exp, jaw, neck)
    right = get_face_indicies(exp, jaw, neck, offset=136)
    return {
        "p1_face": frames[:, left],
        "p1_speech": frames[:, 106:106 + speech],
        "p2_face": frames[:, right],
        "p2_speech": frames[:, 242:242 + speech],
    }


def expand_face_dim(seq: np.ndarray, data_hparams: dict) -> np.ndarray:
    """[B, T, exp+jaw+neck] -> [B, T, 106] packed layout
    (generate_motion_from_model.py:39-51)."""
    exp, jaw, neck = (data_hparams["expression_dim"], data_hparams["jaw_dim"],
                      data_hparams["neck_dim"])
    out = np.zeros((seq.shape[0], seq.shape[1], 106), seq.dtype)
    out[:, :, :exp] = seq[:, :, :exp]
    out[:, :, 100:100 + jaw] = seq[:, :, exp:exp + jaw]
    out[:, :, 103:103 + neck] = seq[:, :, exp + jaw:exp + jaw + neck]
    return out


class Generator:
    """Loaded model + standardization stats, ready for repeated sampling."""

    def __init__(self, hp: HParams, params: SeqGlowParams):
        self.hp = hp
        self.spec = FlowSpec.build(hp)
        self.params = params
        data_file = Path(hp.dataset_root) / hp.Data["file_name"]
        if data_file.exists():
            with h5py.File(data_file, "r") as f:
                means, stds = load_standardization(f)
            self.face_means, self.face_stds = face_means_stds(
                means, stds, hp.Data["expression_dim"])
        else:
            c = self.spec.channels
            self.face_means = np.zeros(c, np.float32)
            self.face_stds = np.ones(c, np.float32)

    @classmethod
    def from_checkpoint(cls, ckpt_path, hparams_file=None, dataset_root=None,
                        overrides=None) -> "Generator":
        """Load from an orbax checkpoint dir (ours) or a Lightning .ckpt
        (reference)."""
        ckpt_path = Path(ckpt_path)
        if ckpt_path.suffix == ".ckpt":
            import torch

            payload = torch.load(ckpt_path, map_location="cpu",
                                 weights_only=False)
            from lets_face_it_tpu.hparams import HParams as HP

            raw_hp = payload.get("hparams", payload.get("hyper_parameters"))
            if hparams_file is not None:
                hp = load_hparams(hparams_file, dataset_root=dataset_root,
                                  overrides=overrides)
            else:
                assert raw_hp is not None, (
                    "checkpoint carries no hparams; pass hparams_file")
                d = dict(raw_hp) if not isinstance(raw_hp, dict) else raw_hp
                if dataset_root is not None:
                    d["dataset_root"] = str(dataset_root)
                hp = HP(**d)
                hp.config_name = ckpt_path.name
            spec = FlowSpec.build(hp)
            from lets_face_it_tpu.sample.torch_import import (
                import_torch_checkpoint,
            )

            params = import_torch_checkpoint(
                payload["state_dict"], spec)
            return cls(hp, params)

        assert hparams_file is not None, "orbax checkpoints need hparams_file"
        hp = load_hparams(hparams_file, dataset_root=dataset_root,
                          overrides=overrides)
        spec = FlowSpec.build(hp)
        from lets_face_it_tpu.train import state as train_state
        from lets_face_it_tpu.train.checkpoint import CheckpointManager
        from lets_face_it_tpu.train.optim import build_optimizer

        optimizer = build_optimizer(hp, steps_per_epoch=1)
        template = train_state.init_train_state(
            jax.random.PRNGKey(0), spec, optimizer)
        state, _meta = CheckpointManager(ckpt_path).restore(template)
        return cls(hp, state.params)

    def standardize_face(self, x):
        return (np.asarray(x) - self.face_means) / self.face_stds

    def generate(self, frames: np.ndarray, *, eps: float | None = None,
                 seed: int = 0, use_zero_pose: bool = True) -> np.ndarray:
        """Packed [T, 273] frames -> generated [1, T - history, 106] faces.

        Mirrors generate_motion (generate_motion_from_model.py:54-70): the
        own-face seed history is zeroed (or standardized GT), interlocutor
        modalities standardized, flow sampled with Infer.eps, output
        de-standardized and re-expanded to the 106-D layout.
        """
        eps = self.hp.Infer["eps"] if eps is None else eps
        data = dictify_frames(np.asarray(frames, np.float32), self.hp.Data)
        start = self.spec.cond.longest_history

        p1_face = self.standardize_face(data["p1_face"])
        if use_zero_pose:
            p1_face = np.zeros_like(p1_face)

        cond_data = {
            "p1_face": jnp.asarray(p1_face[None]),
            "p2_face": jnp.asarray(self.standardize_face(data["p2_face"])[None]),
            "p1_speech": jnp.asarray(data["p1_speech"][None]),
            "p2_speech": jnp.asarray(data["p2_speech"][None]),
        }
        seq_len = frames.shape[0]
        out = seqglow.sequence_sample_jit(
            self.spec, self.params, cond_data, seq_len, eps_std=float(eps),
            rng=jax.random.PRNGKey(seed))
        destd = np.asarray(out) * self.face_stds + self.face_means
        return expand_face_dim(destd, self.hp.Data)


def generate_motion(frames, model_path, hparams_file=None, dataset_root=None,
                    eps: float = 1.0, seed: int = 0) -> np.ndarray:
    """One-shot convenience mirroring the reference entry point."""
    gen = Generator.from_checkpoint(model_path, hparams_file=hparams_file,
                                    dataset_root=dataset_root)
    return gen.generate(frames, eps=eps, seed=seed)

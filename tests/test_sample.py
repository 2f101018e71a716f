"""Sampling entry points and PyTorch checkpoint import round-trip."""

import numpy as np
import pytest

from lets_face_it_tpu.hparams import HParams
from lets_face_it_tpu.model import FlowSpec, init_seqglow, seqglow
from lets_face_it_tpu.sample import (
    Generator,
    dictify_frames,
    expand_face_dim,
    export_state_dict,
    import_torch_checkpoint,
)

import jax


def final_like_hparams(**overrides):
    """final_model.yaml-shaped dims but small K for test speed."""
    cfg = dict(
        Conditioning={
            "cond_dim": 64,
            "p1_face": {"dropout": 0, "enc": "none", "hidden_dim": 32,
                        "history": 5, "dim": 56},
            "p1_speech": {"dropout": 0.5, "enc": "rnn", "hidden_dim": 16,
                          "history": 2},
            "p2_face": {"dropout": 0.6, "enc": "rnn", "hidden_dim": 32,
                        "history": 8, "dim": 56},
            "p2_speech": {"dropout": 0.3, "enc": "rnn", "hidden_dim": 32,
                          "history": 6, "dim": 30},
            "use_frame_nb": False,
        },
        Data={"file_name": "none.h5", "expression_dim": 50, "jaw_dim": 3,
              "neck_dim": 3, "speech_dim": 30, "use_standardization": True},
        Glow={"K": 3, "L": 1, "LU_decomposed": True, "actnorm_scale": 1.0,
              "flow_coupling": "affine", "flow_permutation": "invconv",
              "hidden_channels": 24, "rnn_type": "gru", "scale_eps": 1e-4},
        Infer={"eps": 1.0, "seq_len": 25},
        Train={"seq_len": 32, "use_negative_nll_loss": False},
        Validation={"seq_len": 32, "scale_logging": False},
        Optim={"name": "adam", "args": {"adam": {}},
               "Schedule": {"name": None, "args": {}}},
        batch_size=2, lr=1e-4, max_epochs=1, gradient_clip_val=0,
        dataset_root="/tmp/nonexistent_lfi",
    )
    cfg.update(overrides)
    hp = HParams(**cfg)
    hp.config_name = "sample_test"
    return hp


def test_packed_frame_layout_roundtrip():
    data_hp = {"expression_dim": 50, "jaw_dim": 3, "neck_dim": 3,
               "speech_dim": 30}
    frames = np.arange(2 * 273, dtype=np.float32).reshape(2, 273)
    d = dictify_frames(frames, data_hp)
    assert d["p1_face"].shape == (2, 56)
    assert d["p1_face"][0, 0] == 0.0          # expression starts at col 0
    assert d["p1_face"][0, 50] == 100.0       # jaw at col 100
    assert d["p1_face"][0, 53] == 103.0       # neck at col 103
    assert d["p1_speech"][0, 0] == 106.0
    assert d["p2_face"][0, 0] == 136.0
    assert d["p2_speech"][0, 0] == 242.0

    face56 = d["p1_face"][None]               # [1, 2, 56]
    expanded = expand_face_dim(face56, data_hp)
    assert expanded.shape == (1, 2, 106)
    np.testing.assert_array_equal(
        dictify_frames(
            np.concatenate([expanded[0], np.zeros((2, 273 - 106),
                                                  np.float32)], axis=1),
            data_hp)["p1_face"],
        face56[0])


def test_torch_state_dict_roundtrip():
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    state = export_state_dict(params, spec)
    # names follow the reference module tree
    assert "seq_glow.glow.flow.layers.0.actnorm.bias" in state
    assert "seq_glow.feature_encoder.p2_face_encoder.encoder.weight_ih_l0" in state
    assert state["seq_glow.glow.flow.layers.1.actnorm.bias"].shape == (1, 56)

    imported = import_torch_checkpoint(state, spec)
    for a, b in zip(jax.tree.leaves(params.flow), jax.tree.leaves(imported.flow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # imported params produce identical NLL
    rng = np.random.default_rng(0)
    batch = {
        "p1_face": rng.standard_normal((2, 32, 56)).astype(np.float32),
        "p2_face": rng.standard_normal((2, 32, 56)).astype(np.float32),
        "p1_speech": rng.standard_normal((2, 32, 30)).astype(np.float32),
        "p2_speech": rng.standard_normal((2, 32, 30)).astype(np.float32),
    }
    _, loss_a, _ = seqglow.sequence_nll(spec, params, batch)
    _, loss_b, _ = seqglow.sequence_nll(spec, imported, batch)
    assert float(loss_a) == pytest.approx(float(loss_b), abs=1e-5)


def test_generator_from_packed_frames():
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(1), spec)
    gen = Generator(hp, params)
    frames = np.random.default_rng(0).standard_normal((40, 273)).astype(np.float32)
    out = gen.generate(frames, eps=1.0, seed=3)
    start = spec.cond.longest_history
    assert out.shape == (1, 40 - start, 106)
    assert np.isfinite(out).all()
    # deterministic under the same seed
    out2 = gen.generate(frames, eps=1.0, seed=3)
    np.testing.assert_array_equal(out, out2)

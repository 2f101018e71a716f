"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding is exercised on virtual CPU devices
(``--xla_force_host_platform_device_count=8``) — the TPU substitute for
multi-node test infrastructure. Tests run in float32 on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Persistent compile cache (same dir the CLIs use; entries are keyed by
# backend + compile options, so CPU test executables never collide with TPU
# ones). The suite re-compiles the same tiny-model shapes every run — on
# this 1-vCPU box the cache cuts a full-suite run by minutes, and the
# subprocess-heavy tests (tuning trials, watchdog scenarios) by more.
from lets_face_it_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache)

enable_persistent_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from lets_face_it_tpu.hparams import HParams  # noqa: E402


def tiny_hparams(**overrides) -> HParams:
    """A scaled-down final_model.yaml-shaped config for fast tests."""
    cfg = dict(
        Conditioning={
            "cond_dim": 32,
            "p1_face": {"dropout": 0, "enc": "none", "hidden_dim": 16,
                        "history": 3, "dim": 12},
            "p1_speech": {"dropout": 0.5, "enc": "rnn", "hidden_dim": 8,
                          "history": 2},
            "p2_face": {"dropout": 0.6, "enc": "rnn", "hidden_dim": 16,
                        "history": 4, "dim": 12},
            "p2_speech": {"dropout": 0.3, "enc": "rnn", "hidden_dim": 16,
                          "history": 3},
            "use_frame_nb": False,
        },
        Data={"file_name": "synthetic.h5", "expression_dim": 6, "jaw_dim": 3,
              "neck_dim": 3, "speech_dim": 7, "use_standardization": True,
              "expression_delta_dim": 0, "jaw_delta_dim": 0, "neck_delta_dim": 0},
        Glow={"K": 3, "L": 1, "LU_decomposed": True, "actnorm_scale": 1.0,
              "flow_coupling": "affine", "flow_permutation": "invconv",
              "hidden_channels": 16, "rnn_type": "gru", "scale_eps": 1e-4},
        Infer={"eps": 1.0, "seq_len": 16},
        Train={"seq_len": 16, "use_negative_nll_loss": True},
        Validation={"check_invertion": True, "inference": True, "render": False,
                    "scale_logging": False, "seq_len": 16,
                    "wrong_context_test": True},
        Mismatch={
            "shuffle_batch": {"all": ["p1_face", "p2_face", "p2_speech"],
                              "p2": ["p2_face", "p2_speech"]},
            "shuffle_time": {"p2": ["p2_face", "p2_speech"]},
        },
        Optim={"name": "adam",
               "args": {"adam": {"betas": [0.9, 0.9999], "eps": 1e-8},
                        "sgd": {"momentum": 0.9}, "rmsprop": {"eps": 1e-8}},
               "Schedule": {"name": "step",
                            "args": {"step": {"gamma": 0.73, "step_size": 3},
                                     "multiplicative": {"val": 10},
                                     "lambda": {"val": 10}},
                            "warm_up": 0}},
        batch_size=4,
        lr=1e-3,
        max_epochs=1,
        gradient_clip_val=20.0,
        dataset_root="/tmp/lfi_test_data",
    )
    cfg.update(overrides)
    hp = HParams(**cfg)
    hp.config_name = "tiny_test"
    return hp


def random_batch(hp: HParams, batch_size=4, seq_len=None, seed=0):
    """A synthetic batch shaped like MimicryDataset output."""
    rng = np.random.default_rng(seed)
    t = seq_len or hp.Train["seq_len"]
    c = hp.Conditioning["p1_face"]["dim"]
    s = hp.Data["speech_dim"]
    batch = {
        "p1_face": rng.standard_normal((batch_size, t, c)).astype(np.float32),
        "p2_face": rng.standard_normal((batch_size, t, c)).astype(np.float32),
        "p1_speech": rng.standard_normal((batch_size, t, s)).astype(np.float32),
        "p2_speech": rng.standard_normal((batch_size, t, s)).astype(np.float32),
    }
    return batch


@pytest.fixture
def hp():
    return tiny_hparams()


@pytest.fixture
def batch(hp):
    return random_batch(hp)

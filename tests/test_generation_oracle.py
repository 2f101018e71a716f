"""Decode-side parity oracle (VERDICT r4 item 1): the inference-time
generation path — zero-or-GT-seeded own-face warmup, per-frame ``(t-h, t]``
window assembly against *generated* history, reversed-layer flow decode with
coupling GRU states updating in forward-time order — checked frame-by-frame
against an independent float64 torch re-derivation consuming the identical
z-stream (reference models.py:567-615), plus the packed-273D de-standardize
+ 106-D expansion of generate_motion_from_model.py:39-51,73-87 re-derived
with hand-coded index arithmetic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lets_face_it_tpu.model import FlowSpec, seqglow  # noqa: E402
from lets_face_it_tpu.sample import Generator, export_state_dict  # noqa: E402
from lets_face_it_tpu.sample.torch_ref import (  # noqa: E402
    torch_sequence_inference,
    torch_sequence_nll,
)

from test_torch_parity import _parity_batch, _perturbed_params  # noqa: E402
from test_sample import final_like_hparams  # noqa: E402

N_GEN = 12  # > p1_face history (5), so windows cross into generated frames


def _decode_inputs(hp, spec, *, zero_seed, seed=0):
    """(data, z_stream, seq_len): conditioning + latents for a decode whose
    own-face windows must consume generated frames after the first h1."""
    rng = np.random.default_rng(seed)
    start = spec.cond.longest_history
    seq_len = start + N_GEN
    c = spec.channels
    s = hp.Data["speech_dim"]
    b = 2
    seed_faces = (np.zeros((b, start, c), np.float32) if zero_seed
                  else rng.standard_normal((b, start, c)).astype(np.float32))
    data = {
        "p1_face": seed_faces,
        "p2_face": rng.standard_normal((b, seq_len, c)).astype(np.float32),
        "p1_speech": rng.standard_normal((b, seq_len, s)).astype(np.float32),
        "p2_speech": rng.standard_normal((b, seq_len, s)).astype(np.float32),
    }
    z_stream = (0.7 * rng.standard_normal((N_GEN, b, c))).astype(np.float32)
    return data, z_stream, seq_len


@pytest.mark.parametrize("zero_seed", [True, False],
                         ids=["zero_seed", "gt_seed"])
def test_sequence_sample_matches_torch_decode(zero_seed):
    """sequence_sample fed a fixed z-stream reproduces the torch decode
    per-frame — the inference-time conditioning assembly (not just the flow
    inverse) is pinned against reference semantics."""
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    data, z_stream, seq_len = _decode_inputs(hp, spec, zero_seed=zero_seed)

    ours = seqglow.sequence_sample_jit(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()}, seq_len,
        rng=jax.random.PRNGKey(0), z_seq=jnp.asarray(z_stream))
    oracle = torch_sequence_inference(export_state_dict(params, spec), hp,
                                      data, z_stream)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)


def test_decode_consumes_generated_history():
    """Sanity check ON the oracle itself: with the own-face history
    conditioned (dim > 0), frames beyond h1 must depend on earlier generated
    frames — perturbing z_0 must change frame h1+1. Guards against the
    oracle accidentally teacher-forcing (the reference bug class this test
    family exists to catch)."""
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    data, z_stream, _ = _decode_inputs(hp, spec, zero_seed=True)
    state = export_state_dict(params, spec)

    base = torch_sequence_inference(state, hp, data, z_stream)
    z_kick = z_stream.copy()
    z_kick[0] += 1.0
    kicked = torch_sequence_inference(state, hp, data, z_kick)
    h1 = hp.Conditioning["p1_face"]["history"]
    assert np.abs(kicked[:, h1 + 1] - base[:, h1 + 1]).max() > 1e-6


def test_frame_nb_decode_matches_torch():
    """use_frame_nb decode: the counter starts at ONE and steps by 2
    (models.py:571-575) — independent of the batch's frame_nb."""
    hp = final_like_hparams()
    hp.Conditioning["use_frame_nb"] = True
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    data, z_stream, seq_len = _decode_inputs(hp, spec, zero_seed=False)

    ours = seqglow.sequence_sample_jit(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()}, seq_len,
        rng=jax.random.PRNGKey(0), z_seq=jnp.asarray(z_stream))
    oracle = torch_sequence_inference(export_state_dict(params, spec), hp,
                                      data, z_stream)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)


def test_no_face_ablation_decode_matches_torch():
    """The face-free ablation (own-face dim 0): no autoregressive feedback,
    pure speech-driven decode."""
    hp = final_like_hparams()
    hp.Conditioning["p1_face"] = {"dropout": 0, "enc": "none",
                                  "hidden_dim": 32, "history": 5, "dim": 0}
    hp.Conditioning["p2_face"] = {"dropout": 0.6, "enc": "rnn",
                                  "hidden_dim": 32, "history": 0, "dim": 0}
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    data, z_stream, seq_len = _decode_inputs(hp, spec, zero_seed=True)
    data.pop("p2_face")

    ours = seqglow.sequence_sample_jit(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()}, seq_len,
        rng=jax.random.PRNGKey(0), z_seq=jnp.asarray(z_stream))
    oracle = torch_sequence_inference(export_state_dict(params, spec), hp,
                                      data, z_stream)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)


def test_lstm_coupling_and_encoders_match_torch():
    """The LSTM configuration (Glow rnn_type 'lstm' + 'lstm' window
    encoders — supported by the framework, latent-buggy in the reference,
    see torch_ref._coupling_f) is oracled both ways: teacher-forced NLL and
    the z-stream decode."""
    hp = final_like_hparams()
    hp.Glow["rnn_type"] = "lstm"
    hp.Conditioning["p2_face"]["enc"] = "lstm"
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    state = export_state_dict(params, spec)

    batch = _parity_batch()
    _, loss_jax, _ = seqglow.sequence_nll(spec, params, batch)
    loss_torch = torch_sequence_nll(state, hp, batch)
    assert float(loss_jax) == pytest.approx(loss_torch, rel=2e-5)

    data, z_stream, seq_len = _decode_inputs(hp, spec, zero_seed=False)
    ours = seqglow.sequence_sample_jit(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()}, seq_len,
        rng=jax.random.PRNGKey(0), z_seq=jnp.asarray(z_stream))
    oracle = torch_sequence_inference(state, hp, data, z_stream)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)


def test_nll_refactor_unchanged():
    """The torch_ref refactor (shared layer helpers between forward and
    decode) must leave the forward-NLL oracle's value bit-compatible with
    the JAX path — same assertion as test_torch_parity, pinned here so a
    helper regression is caught next to the decode tests that motivated it."""
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    batch = _parity_batch()
    _, loss_jax, _ = seqglow.sequence_nll(spec, params, batch)
    loss_torch = torch_sequence_nll(export_state_dict(params, spec), hp, batch)
    assert float(loss_jax) == pytest.approx(loss_torch, rel=2e-5)


def test_generator_destandardize_and_expansion_oracle():
    """End-to-end Generator.generate (packed 273-D rows in, de-standardized
    106-D faces out) vs an independent re-derivation: hand-coded packed
    layout slices (exp at +0, jaw at +100, neck at +103; p1 at 0, p1 speech
    at 106, p2 at 136, p2 speech at 242 — generate_motion_from_model.py:73-87),
    the torch decode on the identical z-stream, then destd + expansion with
    explicit index arithmetic (:39-51)."""
    hp = final_like_hparams()
    spec = FlowSpec.build(hp)
    params = _perturbed_params(spec)
    gen = Generator(hp, params)
    rng = np.random.default_rng(3)
    # non-trivial standardization stats so destd is actually exercised
    gen.face_means = rng.standard_normal(56).astype(np.float32)
    gen.face_stds = (0.5 + rng.random(56)).astype(np.float32)

    start = spec.cond.longest_history
    seq_len = start + N_GEN
    frames = rng.standard_normal((seq_len, 273)).astype(np.float32)

    eps, seed = 0.8, 5
    out = gen.generate(frames, eps=eps, seed=seed, use_zero_pose=True)

    # --- independent re-derivation ---
    p2_face_raw = np.concatenate(
        [frames[:, 136:186], frames[:, 236:239], frames[:, 239:242]], axis=1)
    data = {
        "p1_face": np.zeros((1, seq_len, 56), np.float32),
        "p2_face": ((p2_face_raw - gen.face_means) / gen.face_stds)[None]
        .astype(np.float32),
        "p1_speech": frames[None, :, 106:136],
        "p2_speech": frames[None, :, 242:272],
    }
    # the z-stream Generator.generate draws internally (sequence_sample with
    # z_seq=None: normal(rng, [N, B, C]) * eps_std)
    zs = np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                      (N_GEN, 1, 56), jnp.float32)) * eps
    decoded = torch_sequence_inference(export_state_dict(params, spec), hp,
                                       data, zs)                  # [1, N, 56]
    destd = decoded * gen.face_stds + gen.face_means
    expected = np.zeros((1, N_GEN, 106), np.float64)
    expected[:, :, 0:50] = destd[:, :, 0:50]
    expected[:, :, 100:103] = destd[:, :, 50:53]
    expected[:, :, 103:106] = destd[:, :, 53:56]

    assert out.shape == (1, N_GEN, 106)
    np.testing.assert_allclose(out, expected, atol=2e-4)
    # columns 50..100 of the packed layout are structurally zero
    assert np.all(out[:, :, 50:100] == 0)

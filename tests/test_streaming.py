"""Streaming generator: per-call stepping must reproduce the offline scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lets_face_it_tpu.model import FlowSpec, init_seqglow, seqglow
from lets_face_it_tpu.sample.streaming import (
    StreamingGenerator,
    run_paced_session,
)

from conftest import tiny_hparams


def test_streaming_matches_offline_mean_path():
    """With eps=0 (mean path) and zero warm-up, pushing frames one by one
    must equal the offline sequence_sample on the same data."""
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)

    b, t = 2, 16
    start = spec.cond.longest_history
    rng = np.random.default_rng(0)
    c, s = spec.channels, hp.Data["speech_dim"]
    data = {
        "p1_face": np.zeros((b, t, c), np.float32),
        "p2_face": rng.standard_normal((b, t, c)).astype(np.float32),
        "p1_speech": rng.standard_normal((b, t, s)).astype(np.float32),
        "p2_speech": rng.standard_normal((b, t, s)).astype(np.float32),
    }
    # offline: windows for frames < start see zeros -> zero out the prefix
    for k in ("p2_face", "p1_speech", "p2_speech"):
        data[k][:, :start] = 0.0

    offline = seqglow.sequence_sample(
        spec, params, {k: jnp.asarray(v) for k, v in data.items()},
        t, eps_std=0.0, rng=jax.random.PRNGKey(1))

    gen = StreamingGenerator(spec, params, batch_size=b, eps_std=0.0,
                             use_fused=False)
    outs = []
    for ts in range(start, t):
        outs.append(np.asarray(gen.push(
            p2_face=data["p2_face"][:, ts],
            p1_speech=data["p1_speech"][:, ts],
            p2_speech=data["p2_speech"][:, ts])))
    streaming = np.stack(outs, axis=1)

    np.testing.assert_allclose(streaming, np.asarray(offline), atol=1e-4)


def test_push_many_matches_per_frame_pushes():
    """The k-frame catch-up dispatch must be semantically identical to k
    single pushes: same outputs, same PRNG stream, same rolling state (a
    session that recovered via push_many continues exactly where a healthy
    one would be)."""
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    b, k = 2, 5
    c, s = spec.channels, hp.Data["speech_dim"]
    rng = np.random.default_rng(2)
    frames = {
        "p2_face": rng.standard_normal((b, k, c)).astype(np.float32),
        "p1_speech": rng.standard_normal((b, k, s)).astype(np.float32),
        "p2_speech": rng.standard_normal((b, k, s)).astype(np.float32),
    }
    tail = {name: rng.standard_normal(arr.shape[:1] + arr.shape[2:]
                                      ).astype(np.float32)
            for name, arr in frames.items()}

    gen_a = StreamingGenerator(spec, params, batch_size=b, eps_std=1.0,
                               seed=7, use_fused=False)
    gen_b = StreamingGenerator(spec, params, batch_size=b, eps_std=1.0,
                               seed=7, use_fused=False)

    singles = np.stack([np.asarray(gen_a.push(
        **{n: frames[n][:, i] for n in frames})) for i in range(k)], axis=1)
    many = np.asarray(gen_b.push_many(**frames))

    np.testing.assert_allclose(many, singles, atol=1e-5)
    # the post-catch-up state continues the same trajectory
    np.testing.assert_allclose(np.asarray(gen_b.push(**tail)),
                               np.asarray(gen_a.push(**tail)), atol=1e-5)

    # mismatched per-modality frame counts must fail at the API boundary,
    # not as an opaque scan shape error inside the jitted step
    bad = dict(frames)
    bad["p1_speech"] = frames["p1_speech"][:, :-1]
    with pytest.raises(ValueError, match="frames"):
        gen_b.push_many(**bad)


def _session_frames(spec, hp, n, b=1, seed=3):
    rng = np.random.default_rng(seed)
    c, s = spec.channels, hp.Data["speech_dim"]
    return [
        {"p2_face": rng.standard_normal((b, c)).astype(np.float32),
         "p1_speech": rng.standard_normal((b, s)).astype(np.float32),
         "p2_speech": rng.standard_normal((b, s)).astype(np.float32)}
        for _ in range(n)
    ]


def test_push_staged_matches_per_frame_pushes():
    """The staged-stream dispatch (device-resident [n, B, D] conditioning,
    in-jit dynamic_slice — the zero-upload serving path) is semantically
    identical to per-frame pushes under ANY partition of the stream, and the
    post-dispatch state continues the same trajectory."""
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    n = 5
    frames = _session_frames(spec, hp, n, b=2, seed=9)

    gen_a = StreamingGenerator(spec, params, batch_size=2, eps_std=1.0,
                               seed=7, use_fused=False)
    singles = np.concatenate(
        [np.asarray(gen_a.push(**f))[:, None] for f in frames], axis=1)

    gen_b = StreamingGenerator(spec, params, batch_size=2, eps_std=1.0,
                               seed=7, use_fused=False)
    staged = gen_b.stage_session(frames)
    out1, cur = gen_b.push_staged(staged, 0, 3)
    out2, cur = gen_b.push_staged(staged, cur, 1)   # device-resident cursor
    assert int(cur) == 4
    out3, _ = gen_b.push_staged(staged, 4, 1)       # explicit host index
    mixed = np.concatenate([np.asarray(out1), np.asarray(out2),
                            np.asarray(out3)], axis=1)
    np.testing.assert_allclose(mixed, singles, atol=1e-5)

    tail = _session_frames(spec, hp, 1, b=2, seed=10)[0]
    np.testing.assert_allclose(np.asarray(gen_b.push(**tail)),
                               np.asarray(gen_a.push(**tail)), atol=1e-5)


def test_paced_session_values_independent_of_pacing():
    """The jitter buffer only affects TIMING: a real-clock paced session
    (whatever push/push_many partition the clock produced) emits exactly the
    frames a plain push loop emits on the same PRNG seed."""
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    n = 30
    frames = _session_frames(spec, hp, n)

    gen_a = StreamingGenerator(spec, params, batch_size=1, eps_std=1.0,
                               seed=11, use_fused=False)
    plain = np.stack([np.asarray(gen_a.push(**f)) for f in frames], axis=1)

    gen_b = StreamingGenerator(spec, params, batch_size=1, eps_std=1.0,
                               seed=11, use_fused=False)
    # fps=500 on a CPU box forces real backlogs -> mixed dispatch sizes
    report = run_paced_session(gen_b, frames, depth=2, fps=500.0,
                               precompile=False)
    assert report.frames.shape == (1, n, spec.channels)
    np.testing.assert_allclose(report.frames, plain, atol=1e-5)


def test_paced_session_report_accounting():
    """Underruns and min_depth are pure functions of the lateness vector:
    underrun iff completion exceeds the depth-d playout slot, and min_depth
    is the smallest depth with zero underruns."""
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    n = 40
    frames = _session_frames(spec, hp, n, seed=4)
    gen = StreamingGenerator(spec, params, batch_size=1, eps_std=1.0,
                             use_fused=False)
    fps = 200.0
    report = run_paced_session(gen, frames, depth=2, fps=fps,
                               precompile=True)

    period = 1.0 / fps
    completion = report.lateness_s + np.arange(n) * period
    expect_underruns = int(np.sum(
        completion > (np.arange(n) + report.depth) * period))
    assert report.underruns == expect_underruns
    assert report.min_depth == max(
        int(np.ceil(report.lateness_s.max() * fps - 1e-9)), 0)
    # at depth >= min_depth the same session would have had zero underruns
    assert np.sum(completion > (np.arange(n) + report.min_depth) * period) == 0
    assert 1 <= report.max_dispatch <= 8
    # lateness is positive (completion follows arrival) and finite
    assert (report.lateness_s > 0).all() and np.isfinite(report.frames).all()


def test_catchup_sizes():
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    gen = StreamingGenerator(spec, params, batch_size=1, use_fused=False)
    assert gen.catchup_sizes(8) == [1, 2, 4, 8]
    assert gen.catchup_sizes(1) == [1]
    assert gen.catchup_sizes(6) == [1, 2, 4]


def test_streaming_reset():
    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)
    gen = StreamingGenerator(spec, params, batch_size=1, eps_std=0.0,
                             use_fused=False)
    rng = np.random.default_rng(1)
    c, s = spec.channels, hp.Data["speech_dim"]

    def push():
        return np.asarray(gen.push(
            p2_face=rng.standard_normal((1, c)).astype(np.float32),
            p1_speech=rng.standard_normal((1, s)).astype(np.float32),
            p2_speech=rng.standard_normal((1, s)).astype(np.float32)))

    first = push()
    push()
    gen.reset()
    # state cleared: the face history is zeroed again
    assert float(np.abs(np.asarray(gen.face_hist)).max()) == 0.0
    assert np.isfinite(first).all()


def test_streaming_fused_step_matches_xla(monkeypatch):
    """The fused serving step (interpret mode) through the REAL push path —
    window rolls + encoders + flow inversion — must match the XLA step,
    including when the batch spans multiple kernel segments
    (frame_rev_fused_chunked; FRAME_FUSED_MAX_BATCH shrunk to force 2+1
    chunking at b=3). Same seed => identical z stream on both paths."""
    from lets_face_it_tpu.ops import pallas_flow

    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)

    b = 3
    rng = np.random.default_rng(3)
    c, s = spec.channels, hp.Data["speech_dim"]
    frames = [
        {"p2_face": rng.standard_normal((b, c)).astype(np.float32),
         "p1_speech": rng.standard_normal((b, s)).astype(np.float32),
         "p2_speech": rng.standard_normal((b, s)).astype(np.float32)}
        for _ in range(4)
    ]

    def run(use_fused):
        gen = StreamingGenerator(spec, params, batch_size=b, eps_std=1.0,
                                 seed=5, use_fused=use_fused)
        return np.stack([np.asarray(gen.push(**f)) for f in frames], axis=1)

    ref = run(False)
    monkeypatch.setattr(pallas_flow, "FRAME_FUSED_MAX_BATCH", 2)
    monkeypatch.setattr(pallas_flow, "INTERPRET", True)
    got = run(True)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_streaming_auto_gate_resolution(monkeypatch):
    """use_fused=None resolves from (kernel envelope, batch, backend): never
    fused on CPU; on a TPU backend, fused up to the chunked-gate cap
    (FRAME_FUSED_MAX_BATCH * FRAME_FUSED_MAX_SEGMENTS rows) and the XLA
    step beyond — the measured crossover (docs/PERF.md)."""
    from lets_face_it_tpu.ops import pallas_flow

    hp = tiny_hparams()
    spec = FlowSpec.build(hp)
    params = init_seqglow(jax.random.PRNGKey(0), spec)

    # real backend here is CPU: auto must refuse even an in-envelope batch
    monkeypatch.setattr(pallas_flow, "pallas_supported", lambda s: True)
    gen = StreamingGenerator(spec, params, batch_size=1)
    assert gen._fused_weights is None

    # fake a TPU backend; shrink the envelope so the boundary is testable
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pallas_flow, "FRAME_FUSED_MAX_BATCH", 2)
    monkeypatch.setattr(pallas_flow, "FRAME_FUSED_MAX_SEGMENTS", 2)
    gen = StreamingGenerator(spec, params, batch_size=4)
    assert gen._fused_weights is not None
    gen = StreamingGenerator(spec, params, batch_size=5)
    assert gen._fused_weights is None

    # the tiny spec is actually outside the Mosaic envelope: with the real
    # support check the gate refuses regardless of backend/batch
    monkeypatch.undo()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    gen = StreamingGenerator(spec, params, batch_size=1)
    assert gen._fused_weights is None

"""Streaming duplex generation (BASELINE config 5): a stateful stepper that
emits one generated face frame per call, for live-avatar serving.

Unlike offline ``sequence_sample`` (which precomputes all conditioning before
one scan), the streaming stepper consumes the conversation as it happens: the
caller pushes the latest interlocutor-face/speech frames, and the stepper
maintains the rolling history windows, the own-face ring buffer, and the K
coupling-GRU states on device. The per-frame step is one jit-compiled call
(the fused Pallas kernel on TPU), so a live session costs one dispatch per
25-fps frame — and when the host falls behind, ``push_many`` drains a
k-frame backlog in ONE dispatch (a scan over the same step), so the tail
latency of a stall is bounded by one round trip, not k.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lets_face_it_tpu.model import FlowSpec, SeqGlowParams, encoders, flow


class StreamingGenerator:
    """Holds rolling device state for one (batched) live dyadic session."""

    def __init__(self, spec: FlowSpec, params: SeqGlowParams, *,
                 batch_size: int = 1, eps_std: float = 1.0, seed: int = 0,
                 use_fused: bool | None = None):
        self.spec = spec
        self.params = params
        self.eps_std = float(eps_std)
        b = batch_size
        c = spec.channels
        cond = spec.cond

        if use_fused is None:
            from lets_face_it_tpu.ops import pallas_flow

            # beyond FRAME_FUSED_MAX_BATCH the step runs the kernel per
            # 512-row segment (frame_rev_fused_chunked), worth it up to
            # FRAME_FUSED_MAX_SEGMENTS segments (measured crossover)
            use_fused = (pallas_flow.pallas_supported(spec)
                         and pallas_flow.frame_fused_auto_ok(b)
                         and jax.default_backend() == "tpu")
        self._fused_weights = None
        if use_fused:
            from lets_face_it_tpu.ops import pallas_flow

            self._fused_weights = jax.jit(
                lambda p: pallas_flow.prepare_sampling_weights(spec, p)
            )(params.flow)

        # rolling windows per modality (zeros until warmed up)
        def zeros(h, d):
            return jnp.zeros((b, h, d), jnp.float32)

        self.face_hist = zeros(max(cond.p1_face.history, 1), c)
        self.windows = {}
        for name, dim in (("p2_face", c),
                          ("p1_speech", getattr(cond.p1_speech, "input_dim", 0)
                           if cond.p1_speech else 0),
                          ("p2_speech", getattr(cond.p2_speech, "input_dim", 0)
                           if cond.p2_speech else 0)):
            espec = getattr(cond, name)
            if espec is not None:
                self.windows[name] = zeros(espec.history, espec.input_dim)
        self.states = flow.init_flow_states(spec, b)
        self.rng = jax.random.PRNGKey(seed)
        self._step = jax.jit(self._make_step())
        self._step_many = jax.jit(self._make_step_many())
        self._step_staged = {}   # k -> jitted staged-slice step

    def _make_step(self):
        spec = self.spec
        params = self.params
        fused_weights = self._fused_weights

        def step(face_hist, windows, states, rng, inputs, eps_std):
            # roll the modality windows with the incoming frames (the current
            # interlocutor frame IS visible — (t-h, t] semantics)
            new_windows = {}
            for name, win in windows.items():
                new_windows[name] = jnp.concatenate(
                    [win[:, 1:], inputs[name][:, None]], axis=1)

            parts = []
            if spec.cond.p1_face.out_dim > 0:
                parts.append(encoders.encode_p1_face_single(
                    spec.cond, params.encoder, face_hist))
            for name in ("p2_face", "p1_speech", "p2_speech"):
                espec = getattr(spec.cond, name)
                if espec is not None:
                    parts.append(encoders.encode_windows(
                        espec, params.encoder[name],
                        new_windows[name][:, None])[:, 0])
            cond_t = jnp.concatenate(parts, axis=-1)

            rng, sub = jax.random.split(rng)
            z = jax.random.normal(sub, face_hist[:, 0].shape) * eps_std
            if fused_weights is not None:
                from lets_face_it_tpu.ops import pallas_flow

                proj = flow._project_cond(params.flow, cond_t)
                x_t, states = pallas_flow.frame_rev_fused_chunked(
                    spec, fused_weights, z, proj, states,
                    interpret=pallas_flow.INTERPRET)
            else:
                x_t, _, states = flow.frame_rev(spec, params.flow, z, cond_t,
                                                states)
            face_hist = jnp.concatenate([face_hist[:, 1:], x_t[:, None]],
                                        axis=1)
            return face_hist, new_windows, states, rng, x_t

        return step

    def _make_step_many(self):
        """k frames in ONE dispatch (lax.scan over the per-frame step) — the
        catch-up path: after a host stall of k frames the session drains the
        backlog in a single device round trip instead of k, so a late frame
        never snowballs. One compile per distinct k (jit specializes on the
        leading time axis)."""
        step = self._make_step()

        def step_many(face_hist, windows, states, rng, inputs_kbd, eps_std):
            def body(carry, inputs_t):
                face_hist, windows, states, rng = carry
                face_hist, windows, states, rng, x_t = step(
                    face_hist, windows, states, rng, inputs_t, eps_std)
                return (face_hist, windows, states, rng), x_t

            (face_hist, windows, states, rng), xs = jax.lax.scan(
                body, (face_hist, windows, states, rng), inputs_kbd)
            return face_hist, windows, states, rng, jnp.moveaxis(xs, 0, 1)

        return step_many

    def push(self, p2_face=None, p1_speech=None, p2_speech=None):
        """Feed the current conversation frame; returns the generated agent
        face frame [B, C]."""
        inputs = {}
        for name, val in (("p2_face", p2_face), ("p1_speech", p1_speech),
                          ("p2_speech", p2_speech)):
            if name in self.windows:
                assert val is not None, f"{name} is conditioned on; provide it"
                inputs[name] = jnp.asarray(val, jnp.float32)
        (self.face_hist, self.windows, self.states, self.rng,
         x_t) = self._step(self.face_hist, self.windows, self.states,
                           self.rng, inputs, self.eps_std)
        return x_t

    def push_many(self, p2_face=None, p1_speech=None, p2_speech=None):
        """Feed k conversation frames in one dispatch; returns the k generated
        agent face frames [B, k, C].

        Inputs are [B, k, D] per conditioned modality. Semantically identical
        to k ``push`` calls (same PRNG stream, same rolling windows) but costs
        one host->device round trip — the recovery mode for a live session
        that fell k frames behind the 25-fps budget."""
        inputs = {}
        k = None
        for name, val in (("p2_face", p2_face), ("p1_speech", p1_speech),
                          ("p2_speech", p2_speech)):
            if name in self.windows:
                assert val is not None, f"{name} is conditioned on; provide it"
                arr = jnp.asarray(val, jnp.float32)
                # scan consumes xs along the leading axis: [B,k,D] -> [k,B,D]
                inputs[name] = jnp.moveaxis(arr, 1, 0)
                if k is None:
                    k = arr.shape[1]
                elif arr.shape[1] != k:
                    raise ValueError(
                        f"push_many: {name} carries {arr.shape[1]} frames "
                        f"but an earlier modality carries {k}")
        (self.face_hist, self.windows, self.states, self.rng,
         x_kt) = self._step_many(self.face_hist, self.windows, self.states,
                                 self.rng, inputs, self.eps_std)
        return x_kt

    def stage_session(self, frames) -> dict:
        """Stage a session's conditioning stream on device: a list of n
        per-frame input dicts ``{modality: [B, D]}`` becomes
        ``{modality: [n, B, D]}`` device arrays — ONE upload per modality.

        In production the receiver thread stages frames as they arrive off
        the wire; the generation critical path then never uploads:
        ``push_staged`` slices the staged stream *inside* its jitted step,
        so each dispatch is one host->device call and one result fetch.
        (Per-frame ``device_put``s are ~free next to a local chip but cost a
        blocking round trip each over a remote transport — measured round 5,
        they tripled per-frame session lateness.)"""
        import numpy as np

        return {name: jnp.asarray(np.stack([np.asarray(f[name])
                                            for f in frames]))
                for name in self.windows}

    def push_staged(self, staged: dict, idx, k: int = 1):
        """Consume frames [idx, idx+k) of a staged stream in ONE dispatch.

        Semantically identical to k ``push`` calls on those frames (same
        PRNG stream, same rolling state); returns ``(frames [B, k, C],
        next_idx)``. The slice happens inside the compiled step
        (``lax.dynamic_slice``) and ``next_idx`` (= idx + k) comes back as a
        DEVICE scalar: feed it to the next call and the serving loop ships
        nothing to the device at all — even a 4-byte eager ``jnp.asarray``
        of the index costs a full blocking round trip on a remote transport
        (measured round 5: it alone tripled per-frame session lateness).
        One compile per distinct k."""
        if k not in self._step_staged:
            step_many = self._make_step_many()

            def staged_step(face_hist, windows, states, rng, staged, idx,
                            eps_std):
                inputs = {n: jax.lax.dynamic_slice_in_dim(a, idx, k, axis=0)
                          for n, a in staged.items()}
                out = step_many(face_hist, windows, states, rng, inputs,
                                eps_std)
                return out + (idx + k,)

            self._step_staged[k] = jax.jit(staged_step)
        if not isinstance(idx, jax.Array):
            idx = jnp.asarray(idx, jnp.int32)
        (self.face_hist, self.windows, self.states, self.rng,
         x_kt, next_idx) = self._step_staged[k](
            self.face_hist, self.windows, self.states, self.rng, staged,
            idx, self.eps_std)
        return x_kt, next_idx

    def catchup_sizes(self, max_catchup: int = 8):
        """The power-of-two dispatch sizes the paced session draws from
        (jit specializes on k, so each size is one compile)."""
        sizes = [1]
        while sizes[-1] * 2 <= max_catchup:
            sizes.append(sizes[-1] * 2)
        return sizes

    def reset(self, seed_faces=None):
        """Start a new sequence: zero (or seed) the own-face history and reset
        the coupling-RNN states (the reference resets states at every sequence
        start, models.py:535)."""
        b = self.face_hist.shape[0]
        if seed_faces is not None:
            self.face_hist = jnp.asarray(seed_faces, jnp.float32)
        else:
            self.face_hist = jnp.zeros_like(self.face_hist)
        self.states = flow.init_flow_states(self.spec, b)


class SessionReport(NamedTuple):
    """What a depth-d jitter buffer experienced over one paced session."""

    frames: np.ndarray       # [B, n, C] generated output, playout order
    lateness_s: np.ndarray   # [n] completion wall time - frame arrival time
    underruns: int           # frames NOT ready at their depth-d playout slot
    min_depth: int           # smallest integer depth with zero underruns
    max_dispatch: int        # largest catch-up block dispatched
    depth: int               # the depth the session was run at


def run_paced_session(gen: StreamingGenerator, frames, *, depth: int = 2,
                      fps: float = 25.0, max_catchup: int = 8,
                      precompile: bool = True) -> SessionReport:
    """Drive a real-clock live session through a depth-``depth`` jitter
    buffer (BASELINE config 5's serving finish line).

    ``frames`` is a sequence of per-frame input dicts ``{modality: [B, D]}``
    arriving on the ``fps`` clock. Playout of frame j is scheduled at
    ``t0 + (j + depth) / fps`` — the buffer trades ``depth`` frame periods of
    fixed delay for immunity to completion lateness up to ``depth/fps``. A
    frame whose generation completes after its playout slot is an
    **underrun** (a live avatar would freeze for a frame); ``min_depth`` is
    the smallest buffer that would have absorbed this session's worst
    lateness, ``ceil(max_lateness * fps)``.

    Backlogs are drained in power-of-two blocks up to ``max_catchup`` (one
    dispatch per block — the catch-up path measured in bench.py), so a
    stall's tail cost is one round trip, not k. The conditioning stream is
    staged on device ONCE before the clock starts (``gen.stage_session`` —
    the receiver thread's job in production) and every dispatch slices it
    inside the compiled step (``push_staged``), so the per-frame critical
    path is one dispatch plus one result fetch: no uploads, no host-side
    assembly. The generated frame VALUES are independent of the dispatch
    partitioning (push_staged ≡ k pushes on the same PRNG stream,
    tests/test_streaming.py), so pacing only affects timing, never content.
    """
    n = len(frames)
    period = 1.0 / fps
    sizes = gen.catchup_sizes(max_catchup)
    staged = gen.stage_session(frames)

    if precompile:
        # compile every dispatch size outside the timed session, then
        # rewind the session state (the PRNG advances; values are the
        # caller's concern only via the rng seed, timing is ours)
        for k in sizes:
            np.asarray(gen.push_staged(staged, 0, k)[0])
        gen.reset()

    outputs = []
    completion = np.zeros(n)
    dispatch_sizes = []
    idx_dev = jnp.zeros((), jnp.int32)   # stream cursor STAYS on device:
    #                                      after this, the loop ships nothing
    t0 = time.perf_counter()
    next_idx = 0
    while next_idx < n:
        now = time.perf_counter()
        arrived = min(n, int((now - t0) / period) + 1)
        backlog = arrived - next_idx
        if backlog <= 0:
            time.sleep(max(0.0, t0 + next_idx * period - now))
            continue
        k = next(sz for sz in reversed(sizes)
                 if sz <= backlog and next_idx + sz <= n)
        out, idx_dev = gen.push_staged(staged, idx_dev, k)
        arr = np.asarray(out)                 # the one blocking round trip
        done = time.perf_counter()
        outputs.append(arr)
        dispatch_sizes.append(k)
        completion[next_idx:next_idx + k] = done - t0
        next_idx += k

    arrival = np.arange(n) * period
    lateness = completion - arrival
    playout = (np.arange(n) + depth) * period
    underruns = int(np.sum(completion > playout))
    min_depth = int(np.ceil(lateness.max() * fps - 1e-9))
    return SessionReport(
        frames=np.concatenate(outputs, axis=1),
        lateness_s=lateness,
        underruns=underruns,
        min_depth=max(min_depth, 0),
        max_dispatch=int(max(dispatch_sizes)),
        depth=depth,
    )

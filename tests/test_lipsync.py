"""Lipsync (VOCA stage) tests: envelope articulation model, the extract_voca
driver conventions, and the mesh->FLAME-params->get_vocas round trip
(reference voca.py:126-202 + generate_test_sequences.py:27-48)."""

import numpy as np

from lets_face_it_tpu.features.lipsync import (
    EnvelopeLipsync,
    extract_voca,
    voca_to_flame_params,
)
from lets_face_it_tpu.render import flame

MODEL = flame.synthetic_flame_model(80, seed=5)
FS = 16000


def _speech_like(duration=2.0):
    """silence | loud vowel | silence."""
    t = np.arange(int(duration * FS)) / FS
    x = np.sin(2 * np.pi * 150 * t) * 0.5
    env = np.zeros_like(x)
    third = len(x) // 3
    env[third:2 * third] = 1.0
    return (x * env).astype(np.float32)


def test_envelope_lipsync_tracks_audio():
    model = EnvelopeLipsync(MODEL, out_fps=60.0)
    audio = _speech_like()
    p = model.params_for_audio(audio, FS)
    n = p["jaw"].shape[0]
    assert abs(n - 120) <= 1                      # 2 s @ 60 fps
    third = n // 3
    jaw_pitch = p["jaw"][:, 0]
    assert jaw_pitch[third + 5:2 * third].mean() > 5 * max(
        jaw_pitch[:third - 5].mean(), 1e-9), "jaw must open during speech"
    assert jaw_pitch.max() <= 0.35                # bounded articulation

    template = np.asarray(MODEL.v_template)
    meshes = model(audio, FS, template)
    assert meshes.shape == (n, template.shape[0], 3)
    # silent frames sit on the template; loud frames deviate
    d_silent = np.abs(meshes[2] - template).max()
    d_loud = np.abs(meshes[third + third // 2] - template).max()
    assert d_loud > 3 * max(d_silent, 1e-9)


def test_extract_voca_driver(tmp_path):
    from lets_face_it_tpu.features.audio_io import write_wav
    from lets_face_it_tpu.render.flame import write_ply

    part = tmp_path / "S1" / "P1"
    part.mkdir(parents=True)
    write_ply(part / "neutral_mesh.ply", np.asarray(MODEL.v_template),
              MODEL.faces)
    write_wav(part / "audio.wav", _speech_like(), FS)

    model = EnvelopeLipsync(MODEL, out_fps=60.0)
    out = extract_voca(tmp_path, 25, model=model,
                       nb_frames_lookup={"P1": 50})
    assert out == [part / "voca_mesh_25fps.npy"]
    meshes = np.load(out[0])
    assert meshes.shape == (50, np.asarray(MODEL.v_template).shape[0], 3)
    assert np.isfinite(meshes).all()
    # idempotent: second run skips
    assert extract_voca(tmp_path, 25, model=model,
                        nb_frames_lookup={"P1": 50}) == []


def test_voca_to_flame_params_get_vocas_roundtrip(tmp_path):
    from lets_face_it_tpu.stimulus import get_vocas

    model = EnvelopeLipsync(MODEL, out_fps=50.0)
    audio = _speech_like(1.0)
    meshes = model(audio, FS, np.asarray(MODEL.v_template))[:6]

    voca_dir = tmp_path / "Sessions_50fps_voca" / "S1" / "Sess_P1_x"
    files = voca_to_flame_params(meshes, MODEL, voca_dir, n_steps=25)
    assert len(files) == 6 and files[0].name == "000001.npy"
    d = np.load(files[0], allow_pickle=True).item()
    assert d["tf_pose"].shape == (1, 12) and d["tf_exp"].shape[0] == 1

    vad_dir = tmp_path / "Sessions_vad" / "S1"
    vad_dir.mkdir(parents=True)
    np.save(vad_dir / "P1.npy", np.ones(64, np.float32))

    # 50-fps frame numbers spaced by 2 (the 25-fps model frames)
    frame_nbs = [f"{i:06d}" for i in range(2, 7, 2)]
    out = get_vocas(tmp_path, "P1", "S1", frame_nbs)
    assert out["pose"].shape == (3, 12)
    assert out["expression"].shape[0] == 3

    # zero VAD suppresses the lipsync entirely
    np.save(vad_dir / "P1.npy", np.zeros(64, np.float32))
    out0 = get_vocas(tmp_path, "P1", "S1", frame_nbs)
    np.testing.assert_array_equal(out0["pose"], 0.0)


def test_envelope_lipsync_quantified():
    """Quantify the EnvelopeLipsync fallback (VERDICT r2 item 7): how
    audio-locked is the articulation, and how well does it live in FLAME
    parameter space (the MeshFitter round trip, reference voca.py:27-123)?

    Measured on the graded (unsaturated) synthetic fixture:
    jaw-vs-raw-RMS-envelope Pearson r = 0.79 with a 50 ms articulation lag
    (the designed attack/release smoothing); FLAME fit round-trip RMS vertex
    deviation = 3.4% of the articulation amplitude; fitted jaw pitch tracks
    the driving jaw at r = 0.97. Numbers recorded in PARITY.md.
    """
    from lets_face_it_tpu.features.flame_fit import fit_to_vertices
    from lets_face_it_tpu.render.flame import flame_vertices

    fps = 60.0
    t = np.arange(int(2.0 * FS)) / FS
    carrier = np.sin(2 * np.pi * 150 * t)
    am = (0.5 * np.clip(np.sin(2 * np.pi * 1.5 * t), 0, None) ** 2
          + 0.15 * np.clip(np.sin(2 * np.pi * 2.3 * t + 1), 0, None))
    x = (carrier * am * 0.12).astype(np.float32)   # stays below full-scale

    model = EnvelopeLipsync(MODEL, out_fps=fps)
    jaw = model.params_for_audio(x, FS)["jaw"][:, 0]

    # independent raw per-frame RMS envelope (no smoothing, no clipping)
    hop = FS // int(fps)
    pad = (-len(x)) % hop
    env = np.sqrt((np.pad(x, (0, pad)).reshape(-1, hop) ** 2
                   ).mean(axis=1))[:len(jaw)]

    r = np.corrcoef(jaw, env)[0, 1]
    assert r > 0.7, f"jaw-vs-envelope correlation {r:.3f}"

    j0, e0 = jaw - jaw.mean(), env - env.mean()
    lag = int(np.argmax(np.correlate(j0, e0, mode="full"))) - (len(jaw) - 1)
    assert 0 <= lag <= 6, f"articulation lag {lag} frames (> 100 ms)"

    # FLAME-space round trip: meshes -> fit_to_vertices -> re-evaluation
    template = np.asarray(MODEL.v_template)
    meshes = model(x, FS, template)[:40]
    params, _ = fit_to_vertices(MODEL, meshes, n_steps=40)
    re_eval = (np.asarray(flame_vertices(
        MODEL, params["shape"], params["exp"], params["jaw"],
        params["neck"])) + np.asarray(params["trans"])[:, None, :])
    vert_rms = np.sqrt(((re_eval - meshes) ** 2).sum(-1)).mean()
    amplitude = np.abs(meshes - template[None]).max()
    assert vert_rms < 0.08 * amplitude, (
        f"fit round-trip RMS {vert_rms:.4f} vs amplitude {amplitude:.4f}")

    jaw_fit = np.asarray(params["jaw"])[:, 0]
    r_jaw = np.corrcoef(jaw_fit, jaw[:40])[0, 1]
    assert r_jaw > 0.9, f"fitted-vs-driving jaw correlation {r_jaw:.3f}"

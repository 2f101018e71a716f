#!/usr/bin/env python
"""Feature-extraction pipeline: dyadic session recordings -> ``lets_face_it.h5``.

The TPU-native rebuild of the reference pipeline
(/root/reference/code/extract_features.py): ffmpeg stages stay subprocess IO,
audio DSP (prosody / MFCC / VAD) runs as jit-compiled JAX whole-utterance
batches, FLAME landmark fitting runs as batched L-BFGS over frames in XLA
(replacing the reference's Ray actor pool), and the heavyweight external
stages have in-framework defaults with documented drop-in file interfaces for
the originals: RingNet -> landmark-driven init (features/ringnet_lite.py),
VOCA -> envelope lipsync (features/lipsync.py), OpenFace -> docker adapter.

Every stage is idempotent — it checks for its output and skips — so the
pipeline is resumable at file granularity, like the reference.

Layout expected under --dataset_dir:
    <session>/audio_c1_c2.wav        stereo session recording  (or
    <session>/<P1|P2>/audio.wav      pre-split per-participant audio)
    <session>/<P1|P2>/video.mp4      per-participant video (any fps)

Usage:
    python extract_features.py --dataset_dir DIR --splits data/train_val_test.json
        [--fps 25] [--stages audio,video,openface,flame,combine] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ALL_STAGES = ("video", "audio", "openface", "ringnet", "voca", "flame",
              "combine")


def log(msg: str):
    print(f"[extract_features] {msg}", flush=True)


def stage_video(sessions, fps):
    from lets_face_it_tpu.features import video

    if not video.have_ffmpeg():
        log("video stage: ffmpeg not found — skipping (provide "
            "video_{fps}fps.mp4 files directly)")
        return
    for session in sessions:
        for part_dir in (session / "P1", session / "P2"):
            src = part_dir / "video.mp4"
            if not src.exists():
                continue
            dst = part_dir / f"video_{fps}fps.mp4"
            video.convert_video_to_fps(src, dst, fps)
            video.extract_images(dst, part_dir / "images")
            log(f"video: {dst}")


def _frame_count(part_dir, fps) -> int | None:
    """Frames for this participant: ffprobe of the resampled video, or a
    sidecar ``frames_{fps}fps.txt`` for video-less (audio-only) runs."""
    sidecar = part_dir / f"frames_{fps}fps.txt"
    if sidecar.exists():
        return int(sidecar.read_text().strip())
    video_file = part_dir / f"video_{fps}fps.mp4"
    if video_file.exists():
        from lets_face_it_tpu.features.video import count_video_frames

        return count_video_frames(video_file)
    return None


def stage_audio(sessions, fps):
    import numpy as np

    from lets_face_it_tpu.features import audio_io, mfcc, prosody, vad

    for session in sessions:
        stereo = next(iter(session.glob("*c1_c2.wav")), None)
        if stereo is not None:
            audio_io.split_audio_channels(stereo, session)

        frame_counts = {}
        for part in ("P1", "P2"):
            part_dir = session / part
            wav_file = part_dir / "audio.wav"
            if not wav_file.exists():
                continue
            nb_frames = _frame_count(part_dir, fps)
            if nb_frames is None:
                log(f"audio: no frame count for {part_dir} — skipping")
                continue
            frame_counts[part] = nb_frames
            fs, samples = audio_io.read_wav(wav_file)

            audio_io.chunk_audio_file(wav_file, part_dir / "audio_chunks")

            pros_file = part_dir / f"prosodic_features_{fps}fps.npy"
            if not pros_file.exists():
                feats = prosody.extract_prosodic_features(samples, fs, nb_frames)
                np.save(pros_file, np.asarray(feats))
                log(f"prosody: {pros_file}")

            mfcc_file = part_dir / f"mfcc_{fps}fps.npy"
            if not mfcc_file.exists():
                # reference feeds raw int16-scale samples to psf mfcc
                feats = mfcc.extract_mfcc_to_frames(
                    samples * 32768.0, fs, nb_frames)
                np.save(mfcc_file, np.asarray(feats))
                log(f"mfcc: {mfcc_file}")

        p1_vad = session / "P1" / f"crosstalk_vad_{fps}fps.npy"
        p2_vad = session / "P2" / f"crosstalk_vad_{fps}fps.npy"
        if (len(frame_counts) == 2 and not p1_vad.exists()
                and not p2_vad.exists()):
            assert frame_counts["P1"] == frame_counts["P2"]
            fs1, x1 = audio_io.read_wav(session / "P1" / "audio.wav")
            fs2, x2 = audio_io.read_wav(session / "P2" / "audio.wav")
            assert fs1 == fs2
            s1, s2 = vad.crosstalk_vad(x1, x2, fs1, frame_counts["P1"])
            np.save(p1_vad, np.asarray(s1))
            np.save(p2_vad, np.asarray(s2))
            log(f"vad: {session.name}")


def stage_openface(sessions, fps):
    from lets_face_it_tpu.features import external

    for session in sessions:
        for part in ("P1", "P2"):
            part_dir = session / part
            video_file = part_dir / f"video_{fps}fps.mp4"
            out_csv = part_dir / f"openface_{fps}fps.csv"
            if out_csv.exists() or not video_file.exists():
                continue
            try:
                external.extract_openface(video_file, out_csv, fps)
                log(f"openface: {out_csv}")
            except external.StageUnavailable as exc:
                log(str(exc))
                return


def _flame_assets():
    """(FlameModel, LandmarkEmbedding) from config.toml's [flame] paths, or
    None with a log line when the official assets aren't installed or fail
    to load — the multi-stage pipeline must keep going (reference stages are
    independently resumable)."""
    try:
        from lets_face_it_tpu.config import CONFIG
        from lets_face_it_tpu.features import flame_fit
        from lets_face_it_tpu.render.flame import load_flame

        flame_cfg = CONFIG.get("flame", {})
        model_path = flame_cfg.get("model_path_generic")
        emb_path = flame_cfg.get("static_landmark_embedding_path")
        if (not model_path or not Path(model_path).exists()
                or not emb_path or not Path(emb_path).exists()):
            log("flame assets not found ([flame].model_path_generic / "
                ".static_landmark_embedding_path in config.toml) — skipping")
            return None
        model = load_flame(model_path)
        emb = flame_fit.load_landmark_embedding(emb_path, model.faces)
        return model, emb
    except Exception as exc:
        log(f"flame assets unavailable ({type(exc).__name__}: {exc}) "
            "— skipping FLAME stages")
        return None


def stage_ringnet(sessions, fps):
    """FLAME initialisation for the fitter. A real RingNet drop-in
    (features/external.py contract) takes precedence: this stage skips any
    participant whose ``ringnet_{fps}fps.h5`` already exists and otherwise
    estimates the init from the OpenFace landmarks (features/ringnet_lite.py)."""
    from lets_face_it_tpu.features import ringnet_lite

    assets = _flame_assets()
    if assets is None:
        return
    model, emb = assets
    for session in sessions:
        for part in ("P1", "P2"):
            part_dir = session / part
            out = part_dir / f"ringnet_{fps}fps.h5"
            if (out.exists()
                    or not (part_dir / f"openface_{fps}fps.csv").exists()):
                continue
            ringnet_lite.extract_ringnet_lite(part_dir, fps, model=model,
                                              emb=emb)
            log(f"ringnet(-lite): {out}")


def stage_flame(sessions, fps):
    import jax

    from lets_face_it_tpu.features import flame_fit

    assets = _flame_assets()
    if assets is None:
        return
    model, emb = assets
    # The fit is frame-independent: on a multi-chip host, shard the frame
    # axis over all devices (one sharded dispatch covers n_devices× the
    # frames — the reference's Ray GPU actor pool role, flame.py:266-291)
    mesh = None
    if len(jax.devices()) > 1:
        from lets_face_it_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        # per-device batch 256 is the measured per-chip throughput knee
        batch_frames = 256 * mesh.devices.size
        log(f"flame: sharding frames over {mesh.devices.size} devices")
    else:
        batch_frames = 256
    for session in sessions:
        for part in ("P1", "P2"):
            part_dir = session / part
            out_h5 = part_dir / f"flame_{fps}fps.h5"
            csv_file = part_dir / f"openface_{fps}fps.csv"
            if out_h5.exists() or not csv_file.exists():
                continue
            flame_fit.fit_session_participant(
                part_dir, fps, model=model, emb=emb, mesh=mesh,
                batch_frames=batch_frames)
            log(f"flame: {out_h5}")


def stage_voca(dataset_dir, fps):
    """Lipsync meshes per participant (reference voca.py:180-202). Uses the
    built-in envelope articulation model on the configured FLAME model; plug
    the real VOCA via features/lipsync.extract_voca(model=...)."""
    try:
        from lets_face_it_tpu.config import CONFIG
        from lets_face_it_tpu.features.lipsync import (
            EnvelopeLipsync,
            extract_voca,
        )
        from lets_face_it_tpu.render.flame import load_flame

        flame_path = CONFIG.get("flame", {}).get("model_path_generic")
        if not flame_path or not Path(flame_path).exists():
            log("voca stage: [flame].model_path_generic not found — "
                "skipping")
            return
        model = EnvelopeLipsync(load_flame(flame_path))
    except Exception as exc:
        log(f"voca stage unavailable: {exc}")
        return
    from lets_face_it_tpu.features.lipsync import voca_to_flame_params

    for f in extract_voca(dataset_dir, fps, model=model):
        log(f"voca: {f}")
    # convert lipsync meshes into the per-frame FLAME-parameter layout the
    # stimulus tooling consumes (stimulus.get_vocas:
    # Sessions_50fps_voca/<session>/<participant>/flame_params/<frame>.npy)
    import numpy as np

    for mesh_file in sorted(Path(dataset_dir).glob(f"*/*/voca_mesh_{fps}fps.npy")):
        participant = mesh_file.parent
        out_dir = (Path(dataset_dir) / "Sessions_50fps_voca"
                   / participant.parent.name / participant.name)
        if (out_dir / "flame_params").is_dir():
            continue
        voca_to_flame_params(np.load(mesh_file), model.model, out_dir)
        log(f"voca flame_params: {out_dir}")


def stage_combine(dataset_dir, splits_file, fps, output):
    from lets_face_it_tpu.features import combine

    if output.exists():
        log(f"combine: {output} exists — skipping")
        return
    _validate_splits_dir(splits_file)
    spec = combine.load_split_spec(splits_file)
    combine.combine_features(dataset_dir, output, spec, fps=fps,
                             progress=lambda s, n: log(f"combine {s}/{n}"))
    log(f"combine: wrote {output}")


def _validate_splits_dir(splits_file):
    """Schema-check the dataset-definition JSONs next to the splits file
    before spending hours in the pipeline (tools/validate_data_jsons.py);
    hard-fails on schema errors, logs warnings."""
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    from validate_data_jsons import validate_data_dir

    errors, warnings, _ = validate_data_dir(Path(splits_file).parent,
                                            splits_file=splits_file)
    # The combine stage consumes ONLY the splits file; schema errors in
    # optional sibling JSONs (annotations.json, meta_data.json, ...) must
    # not block an otherwise valid combine run — demote them to warnings.
    # Every finding is prefixed with its source file's name (either
    # "name: msg" or "name['key']...: msg" — match on the bare name).
    splits_name = Path(splits_file).name
    blocking = [e for e in errors if e.startswith(splits_name)]
    warnings = warnings + [e for e in errors if e not in blocking]
    for w in warnings:
        log(f"data-json WARNING: {w}")
    if blocking:
        for e in blocking:
            log(f"data-json ERROR: {e}")
        sys.exit(f"{len(blocking)} splits-file schema error(s); see "
                 "tools/validate_data_jsons.py")


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--splits", default=None,
                        help="train_val_test.json (required for combine)")
    parser.add_argument("--output", default=None,
                        help="combined HDF5 path (default <dataset_dir>/lets_face_it.h5)")
    parser.add_argument("--fps", type=int, default=25)
    parser.add_argument("--stages", default=",".join(ALL_STAGES))
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset_dir = Path(args.dataset_dir)
    sessions = sorted(p for p in dataset_dir.iterdir() if p.is_dir())
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(ALL_STAGES)
    if unknown:
        sys.exit(f"unknown stages: {sorted(unknown)}; valid: {ALL_STAGES}")
    log(f"{len(sessions)} sessions, stages: {stages}")

    if "video" in stages:
        stage_video(sessions, args.fps)
    if "audio" in stages:
        stage_audio(sessions, args.fps)
    if "openface" in stages:
        stage_openface(sessions, args.fps)
    if "ringnet" in stages:
        stage_ringnet(sessions, args.fps)
    if "voca" in stages:
        stage_voca(dataset_dir, args.fps)
    if "flame" in stages:
        stage_flame(sessions, args.fps)
    if "combine" in stages:
        if not args.splits:
            sys.exit("--splits is required for the combine stage")
        output = Path(args.output or dataset_dir / "lets_face_it.h5")
        stage_combine(dataset_dir, args.splits, args.fps, output)


if __name__ == "__main__":
    main()

"""Infra configuration: ``config.toml`` merged with optional
``config.local.toml`` (recursive dict update), exposing project paths, the
random seed, FLAME asset locations, and logger/tuning settings — the same
three-tier config system as the reference (misc/shared.py:7-42,
config.toml), with the TOML files read from the repo root.
"""

from __future__ import annotations

import tomllib
from collections import abc
from pathlib import Path

BASE_PATH = Path(__file__).resolve().parents[1]

_DEFAULTS: dict = {
    "project": {
        "data_dir": str(BASE_PATH / "data_store"),
        "base_dir": str(BASE_PATH),
        "random_seed": 1234,
    },
    "features": {"frame_rate": 25, "seq_len": 60000},
    "ml": {"train_ratio": 0.83, "validation_ratio": 0.1, "test_ratio": 0.07},
    "flame": {
        "model_path_generic": "models/flame_model/FLAME2019/generic_model.pkl",
        "model_path_female": "models/flame_model/FLAME2019/female_model.pkl",
        "model_path_male": "models/flame_model/FLAME2019/male_model.pkl",
        "template_mesh": "models/flame_model/FLAME_sample.ply",
        "static_landmark_embedding_path":
            "models/flame_model/flame_static_embedding.pkl",
        "dynamic_landmark_embedding_path":
            "models/flame_model/flame_dynamic_embedding.npy",
    },
    "tuning": {"rdbs_storage": ""},
    "comet": {"api_key": "", "project_name": "lets_face_it"},
}


def _update(d: dict, u: dict) -> dict:
    for k, v in u.items():
        if isinstance(v, abc.Mapping):
            d[k] = _update(dict(d.get(k, {})), v)
        else:
            d[k] = v
    return d


def load_config(base_path: Path | None = None) -> dict:
    base = Path(base_path) if base_path else BASE_PATH
    cfg = {k: dict(v) for k, v in _DEFAULTS.items()}
    main = base / "config.toml"
    if main.exists():
        _update(cfg, tomllib.loads(main.read_text()))
    local = base / "config.local.toml"
    if local.exists():
        _update(cfg, tomllib.loads(local.read_text()))
    return cfg


CONFIG = load_config()
RANDOM_SEED = CONFIG["project"]["random_seed"]
DATA_DIR = Path(CONFIG["project"]["data_dir"])
BASE_DIR = Path(CONFIG["project"]["base_dir"])
DATASET_DIR = DATA_DIR / "dataset"

"""Lazy builder/loader for the native C++ components (ctypes).

``load_library("rasterizer")`` compiles ``native/rasterizer.cpp`` on first use
(g++ -O3 -fopenmp) and caches the .so next to the source; rebuilt when the
source is newer than the binary.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


class NativeBuildError(RuntimeError):
    pass


def build(name: str) -> Path:
    src = NATIVE_DIR / f"{name}.cpp"
    lib = NATIVE_DIR / f"lib{name}.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-fopenmp", "-Wall",
           "-std=c++17", "-shared", "-o", str(lib), str(src)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(
            f"building {name} failed:\n{proc.stderr[-3000:]}")
    return lib


_cache: dict[str, ctypes.CDLL] = {}


def load_library(name: str) -> ctypes.CDLL:
    if name not in _cache:
        _cache[name] = ctypes.CDLL(str(build(name)))
    return _cache[name]

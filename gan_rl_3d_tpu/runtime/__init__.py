"""Native runtime bindings (ctypes over libgrl_runtime.so).

The C++ side (cpp/loader.cpp) provides the host data pipeline's hot paths:
text/PLY parsing, unit-sphere normalisation, resampling. Built lazily with
`make` (plain g++, no pybind11) on first import; raises ImportError when no
toolchain is available so callers fall back to numpy
(data/dataset.py::load_txt).

ctypes releases the GIL during calls, so `load_files_parallel` gets real
parallel parsing from a thread pool.
"""

from __future__ import annotations

import ctypes
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libgrl_runtime.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        raise ImportError("libgrl_runtime.so unavailable and build failed")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.grl_parse_xyz_file.restype = ctypes.c_long
    lib.grl_parse_xyz_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.grl_parse_ply_file.restype = ctypes.c_long
    lib.grl_parse_ply_file.argtypes = lib.grl_parse_xyz_file.argtypes
    lib.grl_normalize_unit_sphere.restype = None
    lib.grl_normalize_unit_sphere.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.grl_resample.restype = ctypes.c_long
    lib.grl_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_uint64]
    _lib = lib
    return lib


_MAX_ROWS = 1 << 20


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_xyz_file(path: str, max_rows: int = _MAX_ROWS) -> np.ndarray:
    """Parse a .txt/.pts cloud (first 3 columns per row) -> (N, 3) f32."""
    lib = _load()
    out = np.empty((max_rows, 3), np.float32)
    n = lib.grl_parse_xyz_file(path.encode(), _fptr(out), max_rows)
    if n <= 0:
        raise IOError(f"cannot parse {path} (rows={n})")
    return out[:n].copy()


def parse_ply_file(path: str, max_rows: int = _MAX_ROWS) -> np.ndarray:
    lib = _load()
    out = np.empty((max_rows, 3), np.float32)
    n = lib.grl_parse_ply_file(path.encode(), _fptr(out), max_rows)
    if n <= 0:
        raise IOError(f"cannot parse {path} (rows={n})")
    return out[:n].copy()


def normalize_unit_sphere(pts: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    lib.grl_normalize_unit_sphere(_fptr(pts), len(pts))
    return pts


def resample(pts: np.ndarray, target: int, seed: int = 1) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((target, 3), np.float32)
    n = lib.grl_resample(_fptr(pts), len(pts), _fptr(out), target,
                         ctypes.c_uint64(seed or 1))
    if n < 0:
        raise ValueError("resample failed (empty input?)")
    return out


def load_files_parallel(paths: Sequence[str], target: int,
                        seed: int = 1, workers: int = 8) -> np.ndarray:
    """Parse + resample many files in parallel -> (len(paths), target, 3)."""
    lib = _load()

    def one(args):
        i, path = args
        out = np.empty((_MAX_ROWS, 3), np.float32)
        if path.endswith(".ply"):
            n = lib.grl_parse_ply_file(path.encode(), _fptr(out), _MAX_ROWS)
        else:
            n = lib.grl_parse_xyz_file(path.encode(), _fptr(out), _MAX_ROWS)
        if n <= 0:
            raise IOError(f"cannot parse {path} (rows={n})")
        res = np.empty((target, 3), np.float32)
        r = lib.grl_resample(_fptr(out), n, _fptr(res), target,
                             ctypes.c_uint64(seed + i))
        if r < 0:
            raise IOError(f"resample failed for {path}")
        return i, res

    result = np.empty((len(paths), target, 3), np.float32)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for i, res in ex.map(one, enumerate(paths)):
            result[i] = res
    return result

"""ctypes binding for the native host library (csrc/pointutil.cpp) — the
replacement for the reference's external ``libPointUtil`` CUDA extension
(SURVEY.md §2.3).  Auto-builds with make on first use; every caller has a
pure-numpy fallback, so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libpcspointutil.so")

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.pcs_grid_downsample.restype = ctypes.c_int
    lib.pcs_grid_downsample.argtypes = [_f32p, ctypes.c_int, ctypes.c_float,
                                        _i32p]
    lib.pcs_radius_neighbors.restype = None
    lib.pcs_radius_neighbors.argtypes = [
        _f32p, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_float,
        ctypes.c_int, _i32p, _i32p]
    lib.pcs_knn.restype = None
    lib.pcs_knn.argtypes = [_f32p, ctypes.c_int, _f32p, ctypes.c_int,
                            ctypes.c_int, ctypes.c_float, _i32p, _f32p]
    lib.pcs_compute_covars.restype = None
    lib.pcs_compute_covars.argtypes = [_f32p, ctypes.c_int, _i32p,
                                       ctypes.c_int, ctypes.c_float, _f32p]
    lib.pcs_interpolate_probs.restype = None
    lib.pcs_interpolate_probs.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, _f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, _f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def ensure_built(force: bool = False) -> None:
    """Build csrc/ from source and load it; raise (don't skip) on failure.

    The test suite calls this so a broken toolchain or source tree fails
    loudly instead of silently falling back to the numpy paths — the .so
    is NOT committed, so this is the only way the lib ever exists.

    ``force=True`` rebuilds from scratch and verifies the FRESH artifact
    loads by dlopen-ing a uniquely-named copy (dlopen caches by path, so
    re-loading ``_SO`` itself would return any stale in-process handle and
    never exercise the new binary).  The module-level handle still serves
    whichever library was first loaded in this process.

    Concurrent callers (parallel test workers) are serialized with an
    exclusive flock on the Makefile so two ``make`` runs never rewrite the
    .so under each other.
    """
    global _LIB, _TRIED
    import fcntl

    cmd = ["make", "-C", _CSRC] + (["-B"] if force else [])
    with open(os.path.join(_CSRC, "Makefile")) as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=300)
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed:\n{proc.stdout}\n{proc.stderr}")
    if force:
        # verify the just-built binary (not a cached handle) is loadable
        import shutil
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".so", delete=False) as tf:
            tmp = tf.name
        try:
            shutil.copy2(_SO, tmp)
            ctypes.CDLL(tmp)
        finally:
            os.unlink(tmp)
    _LIB, _TRIED = None, False
    if _load() is None:
        raise RuntimeError(f"built {_SO} but ctypes failed to load it")


def grid_downsample(xyz: np.ndarray, stride: float) -> np.ndarray:
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    out = np.empty(len(xyz), np.int32)
    kept = lib.pcs_grid_downsample(xyz, len(xyz), stride, out)
    return out[:kept].copy()


def radius_neighbors(xyz: np.ndarray, query: np.ndarray, radius: float,
                     k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-K nearest in-radius neighbors; returns (idx [nq,k], cnt [nq])."""
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    idx = np.empty((len(query), k), np.int32)
    cnt = np.empty(len(query), np.int32)
    lib.pcs_radius_neighbors(xyz, len(xyz), query, len(query), radius, k,
                             idx, cnt)
    return idx, cnt


def knn(support: np.ndarray, query: np.ndarray, k: int,
        cell_hint: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    support = np.ascontiguousarray(support, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    idx = np.empty((len(query), k), np.int32)
    d2 = np.empty((len(query), k), np.float32)
    lib.pcs_knn(support, len(support), query, len(query), k, cell_hint,
                idx, d2)
    return idx, d2


def compute_covars(xyz: np.ndarray, query_idx: np.ndarray,
                   radius: float) -> np.ndarray:
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    query_idx = np.ascontiguousarray(query_idx, np.int32)
    out = np.empty((len(query_idx), 9), np.float32)
    lib.pcs_compute_covars(xyz, len(xyz), query_idx, len(query_idx),
                           radius, out)
    return out


def interpolate_probs(sxyz: np.ndarray, sprobs: np.ndarray,
                      qxyz: np.ndarray, k: int, ratio: float,
                      cell_hint: float = 0.5) -> np.ndarray:
    lib = _load()
    sxyz = np.ascontiguousarray(sxyz, np.float32)
    sprobs = np.ascontiguousarray(sprobs, np.float32)
    qxyz = np.ascontiguousarray(qxyz, np.float32)
    out = np.empty((len(qxyz), sprobs.shape[1]), np.float32)
    lib.pcs_interpolate_probs(sxyz, sprobs, len(sxyz), sprobs.shape[1],
                              qxyz, len(qxyz), k, ratio, cell_hint, out)
    return out

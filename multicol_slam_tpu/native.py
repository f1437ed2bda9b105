"""ctypes binding for the native map-table ops (native/mapops.cpp).

Compiles the shared library on first use (cached next to the source) and
falls back to vectorized numpy when no compiler is available — behavior is
identical either way (tests/test_native.py asserts it).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "mapops.cpp")
_LIB = os.path.join(_HERE, "native", "libmapops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB)
            lib.covisibility_counts.argtypes = [
                _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p,
            ]
            lib.covisibility_counts2.argtypes = [
                _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, _i32p,
            ]
            lib.count_observations.argtypes = [
                _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p,
            ]
            lib.redundancy_counts_fast.argtypes = [
                _i32p, _i32p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p,
            ]
            lib.vote_counts.argtypes = [
                _i32p, _u8p, ctypes.c_int64, ctypes.c_int64,
                _u8p, ctypes.c_int64, _i32p,
            ]
            lib.find_slots.argtypes = [
                _i32p, _u8p, ctypes.c_int64, ctypes.c_int64,
                _u8p, ctypes.c_int64, _i32p, _i32p, _i32p, ctypes.c_int64,
            ]
            lib.find_slots.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def covisibility_counts(kf_point: np.ndarray, kf_valid: np.ndarray, k: int,
                        n_points: int = 0) -> np.ndarray:
    """counts[j] = shared map points between KF k and KF j. Pass `n_points`
    (the point-id capacity) to use the dense-bitmap scan — ~10x the
    hash-probe variant on large maps."""
    K, F = kf_point.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(K, np.int32)
        if n_points > 0:
            lib.covisibility_counts2(
                np.ascontiguousarray(kf_point, np.int32),
                np.ascontiguousarray(kf_valid, np.uint8),
                K, F, k, n_points, out,
            )
        else:
            lib.covisibility_counts(
                np.ascontiguousarray(kf_point, np.int32),
                np.ascontiguousarray(kf_valid, np.uint8),
                K, F, k, out,
            )
        return out
    pts = kf_point[k]
    pts = np.unique(pts[pts >= 0])
    if len(pts) == 0:
        return np.zeros(K, np.int32)
    mask = np.isin(kf_point, pts) & (kf_point >= 0)
    counts = mask.sum(axis=1).astype(np.int32)
    counts[k] = 0
    counts[~kf_valid.astype(bool)] = 0
    return counts


def count_observations(kf_point: np.ndarray, kf_valid: np.ndarray, pt_ids: np.ndarray) -> np.ndarray:
    K, F = kf_point.shape
    pt_ids = np.ascontiguousarray(pt_ids, np.int32)
    lib = _load()
    if lib is not None and len(pt_ids):
        out = np.zeros(len(pt_ids), np.int32)
        lib.count_observations(
            np.ascontiguousarray(kf_point, np.int32),
            np.ascontiguousarray(kf_valid, np.uint8),
            K, F, pt_ids, len(pt_ids), out,
        )
        return out
    vp = kf_point[kf_valid.astype(bool)]
    flat = vp[vp >= 0]
    if len(flat) == 0:
        return np.zeros(len(pt_ids), np.int32)
    counts = np.bincount(flat, minlength=int(pt_ids.max(initial=0)) + 1)
    return counts[pt_ids].astype(np.int32)


def vote_counts(kf_point: np.ndarray, kf_valid: np.ndarray,
                seed_pts: np.ndarray, n_points: int) -> np.ndarray:
    """votes[j] = feature slots of KF j assigned to a point in seed_pts (the
    tracker's per-frame local-map vote). One C pass over the table; numpy
    fallback is the np.isin scan it replaces."""
    K, F = kf_point.shape
    lib = _load()
    if lib is not None:
        mask = np.zeros(n_points, np.uint8)
        sp = np.asarray(seed_pts, np.int64)
        mask[sp[(sp >= 0) & (sp < n_points)]] = 1
        out = np.zeros(K, np.int32)
        lib.vote_counts(
            np.ascontiguousarray(kf_point, np.int32),
            np.ascontiguousarray(kf_valid, np.uint8),
            K, F, mask, n_points, out,
        )
        return out
    obs_mask = np.isin(kf_point, seed_pts) & (kf_point >= 0)
    votes = obs_mask.sum(axis=1).astype(np.int32)
    votes[~kf_valid.astype(bool)] = 0
    return votes


def find_slots(kf_point: np.ndarray, kf_valid: np.ndarray,
               pt_ids: np.ndarray, n_points: int,
               expected_hits: int):
    """All (kf, feat, point) slots observing any of pt_ids, over valid KFs.
    `expected_hits` sizes the output buffers (callers pass the incremental
    pt_nobs sum); if the table holds more hits than expected the scan re-runs
    with the true count. Returns (ks, fs, pid) int64 arrays."""
    K, F = kf_point.shape
    lib = _load()
    if lib is not None:
        mask = np.zeros(n_points, np.uint8)
        sp = np.asarray(pt_ids, np.int64)
        mask[sp[(sp >= 0) & (sp < n_points)]] = 1
        kf_point_c = np.ascontiguousarray(kf_point, np.int32)
        kf_valid_c = np.ascontiguousarray(kf_valid, np.uint8)
        cap = max(int(expected_hits), 1)
        while True:
            ok = np.zeros(cap, np.int32)
            of = np.zeros(cap, np.int32)
            op = np.zeros(cap, np.int32)
            n = lib.find_slots(kf_point_c, kf_valid_c, K, F, mask, n_points,
                               ok, of, op, cap)
            if n <= cap:
                return (ok[:n].astype(np.int64), of[:n].astype(np.int64),
                        op[:n].astype(np.int64))
            cap = int(n)
    hit = np.isin(kf_point, pt_ids) & kf_valid.astype(bool)[:, None]
    ks, fs = np.nonzero(hit)
    return ks, fs, kf_point[ks, fs].astype(np.int64)


def redundancy_counts(
    kf_point: np.ndarray, kf_octave: np.ndarray, kf_valid: np.ndarray, j: int
) -> np.ndarray:
    """For each feature slot of KF j: #other KFs observing its point at
    octave <= level+1 (KeyFrameCulling support)."""
    K, F = kf_point.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(F, np.int32)
        lib.redundancy_counts_fast(
            np.ascontiguousarray(kf_point, np.int32),
            np.ascontiguousarray(kf_octave, np.int32),
            np.ascontiguousarray(kf_valid, np.uint8),
            K, F, j, out,
        )
        return out
    out = np.zeros(F, np.int32)
    row_j = kf_point[j]
    for g in np.nonzero(row_j >= 0)[0]:
        p = row_j[g]
        ks, fs = np.nonzero((kf_point == p) & kf_valid.astype(bool)[:, None])
        keep = ks != j
        out[g] = int((kf_octave[ks[keep], fs[keep]] <= kf_octave[j, g] + 1).sum())
    return out

"""ctypes loader for the cpfn_native C++ host library.

Compiles the shared library on first use (cached next to the source) and
exposes NumPy-typed wrappers. Every entry point has a pure-NumPy/SciPy
fallback so the package works without a toolchain; `available()` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpfn_native.cpp")
_LIB = os.path.join(_HERE, "libcpfn_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.lsa_minimize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.heuristic_merge_solver.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fps_host.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fps_per_label_host.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def lsa_minimize_batch(cost: np.ndarray, n_rows: np.ndarray) -> np.ndarray:
    """Batched linear sum assignment (minimization).

    cost: [B, R, C] float32; n_rows: [B] int32 active rows per element.
    Returns [B, R] int32: out[b, i] = column matched to row i (0 for inactive
    rows). Falls back to scipy.optimize.linear_sum_assignment.
    """
    cost = np.ascontiguousarray(cost, np.float32)
    n_rows = np.ascontiguousarray(n_rows, np.int32)
    B, R, C = cost.shape
    out = np.zeros((B, R), np.int32)
    lib = _load()
    if lib is not None:
        lib.lsa_minimize_batch(
            _ptr(cost, ctypes.c_float), _ptr(n_rows, ctypes.c_int32),
            B, R, C, _ptr(out, ctypes.c_int32),
        )
        return out
    from scipy.optimize import linear_sum_assignment

    for b in range(B):
        r = int(min(n_rows[b], C))
        if r <= 0:
            continue
        _, cols = linear_sum_assignment(cost[b, :r].astype(np.float64))
        out[b, :r] = cols
    return out


def heuristic_merge_solver(
    similarity: np.ndarray,
    nb_patches: int,
    max_label_per_object: int,
    max_label_per_patch: int,
    threshold: float = 0.0,
) -> np.ndarray:
    """Greedy cross-scale merge (see merging docstring). Returns int64 [n]."""
    sim = np.ascontiguousarray(similarity, np.float64)
    n = sim.shape[0]
    out = np.zeros((n,), np.int64)
    lib = _load()
    if lib is not None:
        lib.heuristic_merge_solver(
            _ptr(sim, ctypes.c_double), n, nb_patches,
            max_label_per_patch, max_label_per_object,
            float(threshold), _ptr(out, ctypes.c_int64),
        )
        return out
    return _merge_solver_numpy(
        sim, nb_patches, max_label_per_object, max_label_per_patch, threshold
    )


def _merge_solver_numpy(
    sim, nb_patches, max_label_per_object, max_label_per_patch, threshold
):
    n = sim.shape[0]
    ii, jj = np.where(sim > threshold)
    keep = ii < jj
    p1, p2, w = ii[keep], jj[keep], sim[ii[keep], jj[keep]]
    segment = np.arange(n, dtype=np.int64)
    patch_id = np.concatenate(
        [
            np.repeat(np.arange(nb_patches), max_label_per_patch),
            nb_patches * np.ones(max_label_per_object, dtype=int),
        ]
    )
    patch_1hot = np.eye(nb_patches + 1)[patch_id]
    while len(p1) > 0:
        t = int(np.argmax(w))
        a, b = p1[t], p2[t]
        segment[segment == segment[b]] = segment[a]
        rows = segment == segment[a]
        patch_1hot[rows] = np.sum(patch_1hot[rows], axis=0)
        inter = np.sum(patch_1hot[p1] * patch_1hot[p2], axis=1)
        alive = inter == 0
        p1, p2, w = p1[alive], p2[alive], w[alive]
    labels = segment.copy()
    flag = np.diag(sim)
    replacement = np.concatenate(
        [
            np.tile(np.arange(-max_label_per_patch, 0), nb_patches),
            np.arange(-max_label_per_object, 0),
        ]
    )
    labels[flag < threshold] = replacement[flag < threshold]
    _, inv = np.unique(labels, return_inverse=True)
    return inv.astype(np.int64)


def fps_host(
    points: np.ndarray, num_samples: int, seed_idx: np.ndarray | None = None
) -> np.ndarray:
    """Host FPS (euclidean, 1e6 init, seeds zeroed; preprocessing variant)."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    if seed_idx is None:
        seed_idx = np.zeros((0,), np.int32)
    seed_idx = np.ascontiguousarray(seed_idx, np.int32)
    out = np.zeros((num_samples,), np.int32)
    lib = _load()
    if lib is not None:
        lib.fps_host(
            _ptr(pts, ctypes.c_float), n, _ptr(seed_idx, ctypes.c_int32),
            len(seed_idx), num_samples, _ptr(out, ctypes.c_int32),
        )
        return out
    mind = np.full(n, 1e6)
    mind[seed_idx] = 0.0
    idx = int(np.argmax(mind))
    for i in range(num_samples):
        out[i] = idx
        d = np.sqrt(np.sum((pts - pts[idx]) ** 2, axis=1))
        mind = np.minimum(mind, d)
        idx = int(np.argmax(mind))
    return out


def fps_per_label_host(
    points: np.ndarray, labels: np.ndarray, start: int
) -> np.ndarray:
    """FPS guaranteeing >= 1 sample per label (preprocessing variant)."""
    pts = np.ascontiguousarray(points, np.float32)
    lab = np.ascontiguousarray(labels, np.int32)
    n_unique = len(np.unique(lab))
    out = np.zeros((n_unique,), np.int32)
    lib = _load()
    if lib is not None:
        lib.fps_per_label_host(
            _ptr(pts, ctypes.c_float), _ptr(lab, ctypes.c_int32),
            pts.shape[0], n_unique, np.int32(start),
            _ptr(out, ctypes.c_int32),
        )
        return out
    mind = np.full(pts.shape[0], 1e6)
    idx = int(start)
    for i in range(n_unique):
        cur = lab[idx]
        out[i] = idx
        d = np.sqrt(np.sum((pts - pts[idx]) ** 2, axis=1))
        mind = np.minimum(mind, d)
        mind[lab == cur] = 0.0
        idx = int(np.argmax(mind))
    return out

"""Native (C++) runtime helpers, exposed via ctypes.

Builds ``libsdfnative.so`` from ``voxelize.cpp`` on first use (g++ -O3
-fopenmp), caching the binary next to the source.  Provides:

  * :func:`fsm_redistance`   — exact sequential 8-sweep fast-sweeping
    eikonal solver (oracle for / CPU-fallback of the JAX Jacobi-Godunov
    redistancing; the reference's external ``fastsweep`` package).
  * :func:`mesh_occupancy`   — ray-parity occupancy of a triangle mesh on
    the unit-cube voxel lattice (mesh_to_sdf.py:20-26).
  * :func:`mesh_min_distance`— exact closest-point-on-triangle distances
    for near-surface refinement (mesh_to_sdf.py:31-55).

All functions fall back to (slower) pure-numpy implementations if no C++
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "fsm_redistance", "mesh_occupancy", "mesh_min_distance"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxelize.cpp")
_LIB_PATH = os.path.join(_DIR, "libsdfnative.so")
_lib = None
_tried = False


def _build():
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],  # no-OpenMP fallback
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, i32p, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.float32)
    lib.fsm_redistance.argtypes = [f32p, f32p, i64, ctypes.c_int]
    lib.mesh_occupancy.argtypes = [f32p, i64, i32p, i64, i64, f32p]
    lib.mesh_min_distance.argtypes = [f32p, i64, i32p, i64, f32p, i64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def fsm_redistance(phi: np.ndarray, n_passes: int = 2) -> np.ndarray:
    """Exact FSM signed-distance (res³ cubes only)."""
    phi = np.ascontiguousarray(np.asarray(phi, np.float32))
    if phi.ndim == 4:
        phi = phi[..., 0]
    res = phi.shape[0]
    assert phi.shape == (res, res, res)
    lib = _load()
    out = np.empty_like(phi)
    if lib is not None:
        lib.fsm_redistance(phi.ravel(), out.ravel(), res, n_passes)
        return out.reshape(phi.shape)
    # numpy fallback: reuse the JAX Jacobi solver
    from ..ops.redistance import redistance as _jr

    return np.asarray(_jr(phi))


def mesh_occupancy(verts: np.ndarray, tris: np.ndarray, res: int) -> np.ndarray:
    """(res,res,res) float32 occupancy: −1 inside, +1 outside."""
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty(res**3, np.float32)
        lib.mesh_occupancy(verts.ravel(), len(verts), tris.ravel(), len(tris), res, out)
        return out.reshape(res, res, res)
    return _occupancy_np(verts, tris, res)


def _occupancy_np(verts, tris, res):
    """Vectorized numpy fallback (slow for large meshes)."""
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    centers = (np.arange(res) + 0.5) / res
    out = np.ones((res, res, res), np.float32)
    for iz, pz in enumerate(centers):
        for ix, px in enumerate(centers):
            ax, az = a[:, 0] - px, a[:, 2] - pz
            bx, bz = b[:, 0] - px, b[:, 2] - pz
            cx, cz = c[:, 0] - px, c[:, 2] - pz
            d1 = ax * bz - az * bx
            d2 = bx * cz - bz * cx
            d3 = cx * az - cz * ax
            inside = ~(((d1 < 0) | (d2 < 0) | (d3 < 0)) & ((d1 > 0) | (d2 > 0) | (d3 > 0)))
            area = d1 + d2 + d3
            ok = inside & (np.abs(area) > 1e-18)
            if not ok.any():
                continue
            w0 = d2[ok] / area[ok]
            w1 = d3[ok] / area[ok]
            w2 = d1[ok] / area[ok]
            hits = np.sort(w0 * a[ok, 1] + w1 * b[ok, 1] + w2 * c[ok, 1])
            crossings = len(hits) - np.searchsorted(hits, centers, side="right")
            out[iz, crossings % 2 == 1, ix] = -1.0
    return out


def mesh_min_distance(verts: np.ndarray, tris: np.ndarray, points: np.ndarray) -> np.ndarray:
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    out = np.empty(len(points), np.float32)
    if lib is not None:
        lib.mesh_min_distance(verts.ravel(), len(verts), tris.ravel(), len(tris), points.ravel(), len(points), out)
        return out
    # numpy fallback: chunked exact point-triangle distance
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    for i in range(0, len(points), 256):
        p = points[i : i + 256, None, :]
        out[i : i + 256] = np.sqrt(_tri_dist2_np(p, a[None], b[None], c[None]).min(-1))
    return out


def _tri_dist2_np(p, A, B, C):
    ab, ac, ap = B - A, C - A, p - A
    d1 = (ab * ap).sum(-1)
    d2 = (ac * ap).sum(-1)
    bp = p - B
    d3 = (ab * bp).sum(-1)
    d4 = (ac * bp).sum(-1)
    cp = p - C
    d5 = (ab * cp).sum(-1)
    d6 = (ac * cp).sum(-1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    v_ab = np.clip(d1 / np.where(d1 - d3 != 0, d1 - d3, 1.0), 0, 1)
    w_ac = np.clip(d2 / np.where(d2 - d6 != 0, d2 - d6, 1.0), 0, 1)
    w_bc = np.clip(
        (d4 - d3) / np.where((d4 - d3) + (d5 - d6) != 0, (d4 - d3) + (d5 - d6), 1.0), 0, 1
    )
    denom = np.where(va + vb + vc != 0, va + vb + vc, 1.0)
    v = vb / denom
    w = vc / denom
    cand = [
        A,
        B,
        C,
        A + v_ab[..., None] * ab,
        A + w_ac[..., None] * ac,
        B + w_bc[..., None] * (C - B),
        A + v[..., None] * ab + w[..., None] * ac,
    ]
    d2s = [((p - q) ** 2).sum(-1) for q in cand]
    return np.minimum.reduce(d2s)

# coding=utf-8
"""ctypes bindings for the native C++ mesh kernels (native/fem_native.cpp).

Auto-builds ``libfemnative.so`` with g++ on first use (cached next to the
source); every entry point degrades gracefully to the numpy implementations in
``fem_tpu.models.mesh`` when the toolchain or library is unavailable, so the
framework has no hard native dependency (unlike the reference, which cannot
load any 3D mesh without the tetgen/trimesh/pyvista wheels —
reference object.py:8-10).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _build_library(src_dir: str) -> Optional[str]:
    src = os.path.join(src_dir, "fem_native.cpp")
    out = os.path.join(src_dir, "libfemnative.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-fPIC", "-shared", "-o", out, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        try:  # toolchains without OpenMP
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", out, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return out
        except Exception:
            return None


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build_library(_native_dir())
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.extract_surface.restype = ctypes.c_int64
    lib.extract_surface.argtypes = [
        i64p, ctypes.c_int64, f64p, ctypes.c_int64, i64p,
    ]
    lib.winding_number.restype = None
    lib.winding_number.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, i64p, ctypes.c_int64, f64p,
    ]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.ray_parity_inside.restype = None
    lib.ray_parity_inside.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, i64p, ctypes.c_int64, u8p,
    ]
    lib.nearest_vertex.restype = None
    lib.nearest_vertex.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, i64p,
    ]
    lib.element_init.restype = ctypes.c_int32
    lib.element_init.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double, f64p, f64p, f64p,
    ]
    _LIB = lib
    return _LIB


def native_extract_surface(
    nodes: np.ndarray, tets: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_library()
    if lib is None:
        return None
    nodes64 = np.ascontiguousarray(nodes, np.float64)
    tets64 = np.ascontiguousarray(tets, np.int64)
    out = np.empty((4 * tets64.shape[0], 3), np.int64)
    n = lib.extract_surface(
        tets64, tets64.shape[0], nodes64, nodes64.shape[0], out
    )
    surface = out[:n].copy()
    surface_vertex = np.unique(surface.reshape(-1))
    return surface, surface_vertex


def native_winding_number(
    points: np.ndarray, vertices: np.ndarray, faces: np.ndarray
) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    verts = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.empty(pts.shape[0], np.float64)
    lib.winding_number(
        pts, pts.shape[0], verts, verts.shape[0], f, f.shape[0], out
    )
    return out


def native_points_inside(
    points: np.ndarray, vertices: np.ndarray, faces: np.ndarray
) -> Optional[np.ndarray]:
    """Grid-accelerated +z ray-parity inside test — bit-identical arithmetic
    to ``fem_tpu.models.mesh.points_inside_mesh``'s numpy path (verified in
    tests/test_native.py), ~100× faster at mesher workloads."""
    lib = get_library()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    verts = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.empty(pts.shape[0], np.uint8)
    lib.ray_parity_inside(
        pts, pts.shape[0], verts, verts.shape[0], f, f.shape[0], out
    )
    return out.astype(bool)


def native_nearest_vertex(
    queries: np.ndarray, targets: np.ndarray
) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    q = np.ascontiguousarray(queries, np.float64)
    t = np.ascontiguousarray(targets, np.float64)
    out = np.empty(q.shape[0], np.int64)
    lib.nearest_vertex(q, q.shape[0], t, t.shape[0], out)
    return out


def native_element_init(
    vertices: np.ndarray, elements: np.ndarray, rho: float
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = get_library()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float64)
    e = np.ascontiguousarray(elements, np.int64)
    dim = v.shape[1]
    ref_inv = np.empty((e.shape[0], dim, dim), np.float64)
    volume = np.empty(e.shape[0], np.float64)
    mass = np.empty(v.shape[0], np.float64)
    rc = lib.element_init(
        v, v.shape[0], e, e.shape[0], dim, rho, ref_inv, volume, mass
    )
    if rc != 0:
        return None
    return ref_inv, volume, mass

"""numpy-facing wrappers for the native mesh distance queries."""

from __future__ import annotations

import ctypes

import numpy as np

from curobo_tpu.native.build import get_lib


def _as_c(verts: np.ndarray, faces: np.ndarray, points: np.ndarray):
    v = np.ascontiguousarray(verts, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    p = np.ascontiguousarray(points, dtype=np.float64)
    if v.ndim != 2 or v.shape[1] != 3:
        raise ValueError(f"verts must be (V, 3), got {v.shape}")
    if f.ndim != 2 or f.shape[1] != 3:
        raise ValueError(f"faces must be (T, 3), got {f.shape}")
    if p.ndim != 2 or p.shape[1] != 3:
        raise ValueError(f"points must be (P, 3), got {p.shape}")
    return v, f, p


def _call(name: str, verts, faces, points) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (use native_available())")
    v, f, p = _as_c(verts, faces, points)
    out = np.empty(len(p), dtype=np.float32)
    rc = getattr(lib, name)(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(f),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"{name} failed with code {rc}")
    return out


def mesh_sdf(verts: np.ndarray, faces: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Signed distance (negative inside, even-odd parity) -> (P,) float32."""
    return _call("curobo_mesh_sdf", verts, faces, points)


def mesh_udf(verts: np.ndarray, faces: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Unsigned closest-surface distance -> (P,) float32."""
    return _call("curobo_mesh_udf", verts, faces, points)

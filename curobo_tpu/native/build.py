"""Compile-on-first-use loader for the native library.

Mirrors the reference's NVRTC runtime-compile-and-cache backend
(`curobolib/backends/cuda_core_backend/kernel_cache.py:35`): the C++
source is hashed, compiled once into a per-source-hash shared object
under the cache dir, and memory-mapped thereafter. No pybind — the
library exposes a tiny C ABI consumed with ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "mesh_sdf.cpp")


def _cache_dir() -> str:
    d = os.environ.get(
        "CUROBO_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "curobo_tpu")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"mesh_sdf_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", src, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        # no -march=native support or no g++: retry generic, then give up
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError, ValueError):
            return None
    os.replace(tmp, out)  # atomic: concurrent builders converge on one file
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable (no compiler)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CUROBO_TPU_NO_NATIVE"):
            return None
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        import ctypes as ct

        dbl_p = ct.POINTER(ct.c_double)
        i64 = ct.c_int64
        i64_p = ct.POINTER(ct.c_int64)
        f32_p = ct.POINTER(ct.c_float)
        for name in ("curobo_mesh_sdf", "curobo_mesh_udf"):
            fn = getattr(lib, name)
            fn.argtypes = [dbl_p, i64, i64_p, i64, dbl_p, i64, f32_p]
            fn.restype = ct.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None

"""ctypes wrapper for the native binned-SAH BVH builder.

Compiles accel/cpp/bvh_builder.cpp on first use with g++ (no pybind11 in
this image; plain C ABI + ctypes per the project constraints) and caches the
shared object. Falls back to the numpy Morton builder (accel/bvh.py) when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from .bvh import BVHArrays

_LIB = None
_LIB_FAILED = False


def _source_path() -> Path:
    return Path(__file__).parent / "cpp" / "bvh_builder.cpp"


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = _source_path()
    cache_dir = Path(
        os.environ.get(
            "LUISARENDER_TPU_CACHE", Path.home() / ".cache" / "luisarender_tpu"
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    so = cache_dir / f"bvh_builder_{tag}.so"
    try:
        if not so.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src), "-o", str(so)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.lr_build_bvh.restype = ctypes.c_int32
        lib.lr_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _LIB = lib
    except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
        import logging

        logging.getLogger("luisarender_tpu").warning(
            "native BVH builder unavailable (%s); using numpy fallback", e
        )
        _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_bvh_sah(positions, triangles, leaf_size: int = 4):
    """Binned-SAH build via the native library; returns BVHArrays or None."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(positions, dtype=np.float32)
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    t = tris.shape[0]
    max_nodes = 2 * (t // 1 + 1)
    aabb_min = np.empty((max_nodes, 3), np.float32)
    aabb_max = np.empty((max_nodes, 3), np.float32)
    skip = np.empty(max_nodes, np.int32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    order = np.empty(t, np.int32)
    n = lib.lr_build_bvh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t,
        leaf_size,
        aabb_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        aabb_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_nodes,
    )
    if n < 0:
        return None
    return BVHArrays(
        aabb_min=aabb_min[:n].copy(),
        aabb_max=aabb_max[:n].copy(),
        skip=skip[:n].copy(),
        node_first=first[:n].copy(),
        node_count=count[:n].copy(),
        prim_index=order,
        leaf_size=leaf_size,
    )

"""Native (C++) host-side components, bound via ctypes.

Compiled on first import with g++ (cached next to the source). Every entry
point has a NumPy fallback in the pure-Python modules; ``available()``
reports whether the fast path loaded.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

LOG = logging.getLogger("zeldaengine.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "zeldanative.cpp")
_LIB_PATH = os.path.join(_HERE, "libzeldanative.so")

_lib: Optional[ctypes.CDLL] = None


class _ZeObjData(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_uint32)),
        ("n_verts", ctypes.c_int64),
        ("n_tris", ctypes.c_int64),
    ]


def _compile() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if (
            os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= src_mtime
        ):
            return True
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", _SRC, "-o", _LIB_PATH,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception as e:  # noqa: BLE001
        LOG.warning("native build failed (%s); using NumPy fallbacks", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _compile():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ze_morton_sort_triangles.argtypes = [
        f32p, ctypes.c_int64, u32p, ctypes.c_int64, u32p
    ]
    lib.ze_build_meshlets.restype = ctypes.c_int64
    lib.ze_build_meshlets.argtypes = [
        f32p, ctypes.c_int64, u32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, u32p, ctypes.POINTER(ctypes.c_uint8), i64p, i64p,
    ]
    lib.ze_load_obj.restype = ctypes.c_int32
    lib.ze_load_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_ZeObjData)]
    lib.ze_free_obj.argtypes = [ctypes.POINTER(_ZeObjData)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_MESHLET_REC = np.dtype(
    [
        ("vertex_offset", "<u4"),
        ("vertex_count", "<u4"),
        ("triangle_offset", "<u4"),
        ("triangle_count", "<u4"),
        ("bounds_center", "<f4", 3),
        ("bounds_radius", "<f4"),
        ("cone_apex", "<f4", 3),
        ("cone_axis", "<f4", 3),
        ("cone_cutoff", "<f4"),
        ("pad", "<f4"),
    ]
)


def build_meshlets_native(positions: np.ndarray, indices: np.ndarray,
                          max_vertices: int = 64, max_triangles: int = 124,
                          spatial_sort: bool = True):
    """Returns (records structured array, meshlet_vertices u32,
    meshlet_triangles u8) or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.uint32).reshape(-1)
    n_tris = idx.shape[0] // 3
    recs = np.zeros(max(n_tris, 1), _MESHLET_REC)
    mv = np.zeros(max(n_tris * 3, 1), np.uint32)
    mt = np.zeros(max(n_tris * 3, 1), np.uint8)
    mv_count = ctypes.c_int64()
    mt_count = ctypes.c_int64()
    n = lib.ze_build_meshlets(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_tris,
        max_vertices,
        max_triangles,
        1 if spatial_sort else 0,
        recs.ctypes.data,
        mv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(mv_count),
        ctypes.byref(mt_count),
    )
    return recs[:n].copy(), mv[: mv_count.value].copy(), mt[: mt_count.value].copy()


def morton_sort_triangles_native(positions: np.ndarray,
                                 indices: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.uint32).reshape(-1)
    out = np.zeros_like(idx)
    lib.ze_morton_sort_triangles(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        idx.shape[0] // 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out.reshape(-1, 3)


def load_obj_native(path: str):
    """Returns (positions, normals, uvs, indices) or None."""
    lib = _load()
    if lib is None:
        return None
    data = _ZeObjData()
    rc = lib.ze_load_obj(path.encode(), ctypes.byref(data))
    if rc != 0:
        return None
    nv, nt = data.n_verts, data.n_tris
    pos = np.ctypeslib.as_array(data.positions, (nv, 3)).copy()
    nrm = np.ctypeslib.as_array(data.normals, (nv, 3)).copy()
    uv = np.ctypeslib.as_array(data.uvs, (nv, 2)).copy()
    idx = np.ctypeslib.as_array(data.indices, (nt, 3)).astype(np.int32)
    lib.ze_free_obj(ctypes.byref(data))
    return pos, nrm, uv, idx

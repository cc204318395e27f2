"""Binary .meshlet serde — byte-compatible with MeshletSet::save/load
(ZeldaMeshlet.cpp:51-122): five length-prefixed (size_t) arrays of
Meshlet (64 B), uint32, uint8, Vertex (32 B: pos3+normal3+uv2 float32),
uint32, so caches baked by either tool interoperate.
"""

from __future__ import annotations

import struct
from typing import BinaryIO

import numpy as np

from zeldaengine_tpu.meshlet.build import Meshlet, MeshletSet

_MESHLET_DTYPE = np.dtype(
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
assert _MESHLET_DTYPE.itemsize == 64


def _write_size(f: BinaryIO, n: int) -> None:
    f.write(struct.pack("<Q", n))


def _read_size(f: BinaryIO) -> int:
    return struct.unpack("<Q", f.read(8))[0]


def save_meshlet_set(path: str, ms: MeshletSet) -> None:
    recs = np.zeros(len(ms.meshlets), _MESHLET_DTYPE)
    for i, m in enumerate(ms.meshlets):
        recs[i]["vertex_offset"] = m.vertex_offset
        recs[i]["vertex_count"] = m.vertex_count
        recs[i]["triangle_offset"] = m.triangle_offset
        recs[i]["triangle_count"] = m.triangle_count
        recs[i]["bounds_center"] = m.bounds_center
        recs[i]["bounds_radius"] = m.bounds_radius
        recs[i]["cone_apex"] = m.cone_apex
        recs[i]["cone_axis"] = m.cone_axis
        recs[i]["cone_cutoff"] = m.cone_cutoff
    with open(path, "wb") as f:
        for arr in (
            recs,
            np.ascontiguousarray(ms.meshlet_vertices, "<u4"),
            np.ascontiguousarray(ms.meshlet_triangles, "u1"),
            np.ascontiguousarray(ms.vertices, "<f4"),
            np.ascontiguousarray(ms.indices, "<u4"),
        ):
            _write_size(f, arr.shape[0])
            f.write(arr.tobytes())


def load_meshlet_set(path: str) -> MeshletSet:
    with open(path, "rb") as f:
        n = _read_size(f)
        recs = np.frombuffer(f.read(n * 64), _MESHLET_DTYPE)
        n = _read_size(f)
        mv = np.frombuffer(f.read(n * 4), "<u4").copy()
        n = _read_size(f)
        mt = np.frombuffer(f.read(n), "u1").copy()
        n = _read_size(f)
        verts = np.frombuffer(f.read(n * 32), "<f4").reshape(n, 8).copy()
        n = _read_size(f)
        idx = np.frombuffer(f.read(n * 4), "<u4").copy()
    meshlets = [
        Meshlet(
            vertex_offset=int(r["vertex_offset"]),
            vertex_count=int(r["vertex_count"]),
            triangle_offset=int(r["triangle_offset"]),
            triangle_count=int(r["triangle_count"]),
            bounds_center=np.asarray(r["bounds_center"], np.float32),
            bounds_radius=float(r["bounds_radius"]),
            cone_apex=np.asarray(r["cone_apex"], np.float32),
            cone_axis=np.asarray(r["cone_axis"], np.float32),
            cone_cutoff=float(r["cone_cutoff"]),
        )
        for r in recs
    ]
    return MeshletSet(
        meshlets=meshlets,
        meshlet_vertices=mv,
        meshlet_triangles=mt,
        vertices=verts,
        indices=idx,
    )

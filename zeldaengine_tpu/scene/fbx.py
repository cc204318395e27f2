"""Binary FBX import/export.

The reference ships an OpenFBX code path that parses the file and then
discards everything it read (LoadMeshAsset FBX branch,
ZeldaEngine.cpp:6950-7038 — builds no vertices). This module is a working
replacement: a from-scratch Kaydara binary-FBX reader (node tree +
typed/compressed properties per the public FBX binary layout) that extracts
Geometry into a Mesh, plus a minimal writer for round-trips and export.

Supported on read: FBX binary versions < 7500 (32-bit records) and >= 7500
(64-bit records); zlib-compressed array properties; polygon fans of any
arity (triangulated here); normals/UVs in ByPolygonVertex / ByVertice
mapping with Direct / IndexToDirect referencing.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import List, Optional

import numpy as np

from zeldaengine_tpu.scene.mesh import Mesh, _compute_normals_inplace

MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"

_SCALAR = {
    b"Y": ("<h", 2),
    b"C": ("<B", 1),
    b"I": ("<i", 4),
    b"F": ("<f", 4),
    b"D": ("<d", 8),
    b"L": ("<q", 8),
}
_ARRAY = {
    b"f": np.float32,
    b"d": np.float64,
    b"l": np.int64,
    b"i": np.int32,
    b"b": np.uint8,
}


@dataclasses.dataclass
class FbxNode:
    name: str
    props: list
    children: List["FbxNode"]

    def find(self, name: str) -> Optional["FbxNode"]:
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str) -> List["FbxNode"]:
        return [c for c in self.children if c.name == name]

    def prop(self, index: int = 0, default=None):
        return self.props[index] if len(self.props) > index else default


def _read_property(buf: memoryview, pos: int):
    t = bytes(buf[pos : pos + 1])
    pos += 1
    if t in _SCALAR:
        fmt, size = _SCALAR[t]
        (val,) = struct.unpack_from(fmt, buf, pos)
        return (bool(val) if t == b"C" else val), pos + size
    if t in _ARRAY:
        n, enc, comp_len = struct.unpack_from("<III", buf, pos)
        pos += 12
        dtype = _ARRAY[t]
        if enc == 0:
            raw = bytes(buf[pos : pos + n * dtype().itemsize])
            pos += n * dtype().itemsize
        else:
            raw = zlib.decompress(bytes(buf[pos : pos + comp_len]))
            pos += comp_len
        return np.frombuffer(raw, dtype=dtype, count=n), pos
    if t in (b"S", b"R"):
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        raw = bytes(buf[pos : pos + n])
        pos += n
        return (raw.decode("utf-8", errors="replace") if t == b"S" else raw), pos
    raise ValueError(f"unknown FBX property type {t!r}")


def _read_node(buf: memoryview, pos: int, big: bool):
    """Returns (FbxNode | None, next_pos); None marks the null sentinel."""
    if big:
        end, n_props, _prop_len = struct.unpack_from("<QQQ", buf, pos)
        pos += 24
    else:
        end, n_props, _prop_len = struct.unpack_from("<III", buf, pos)
        pos += 12
    (name_len,) = struct.unpack_from("<B", buf, pos)
    pos += 1
    if end == 0 and n_props == 0 and name_len == 0:
        return None, pos
    name = bytes(buf[pos : pos + name_len]).decode("ascii", errors="replace")
    pos += name_len
    props = []
    for _ in range(n_props):
        val, pos = _read_property(buf, pos)
        props.append(val)
    children: List[FbxNode] = []
    while pos < end:
        child, pos = _read_node(buf, pos, big)
        if child is None:
            break
        children.append(child)
    return FbxNode(name, props, children), end


def parse_fbx(data: bytes) -> FbxNode:
    """Parse binary FBX bytes into a root node tree."""
    if not data.startswith(MAGIC[:20]):
        raise ValueError("not a binary FBX file (ASCII FBX not supported)")
    (version,) = struct.unpack_from("<I", data, 23)
    big = version >= 7500
    buf = memoryview(data)
    pos = 27
    root = FbxNode("", [version], [])
    while pos < len(data):
        node, pos = _read_node(buf, pos, big)
        if node is None:
            break
        root.children.append(node)
    return root


def _layer_values(elem: FbxNode, value_name: str, index_name: str,
                  n_corners: int, pos_index: np.ndarray, width: int):
    """Resolve a LayerElement to per-corner values (n_corners, width)."""
    vals = elem.find(value_name)
    if vals is None:
        return None
    arr = np.asarray(vals.prop(0), np.float64).reshape(-1, width)
    mapping = elem.find("MappingInformationType")
    ref = elem.find("ReferenceInformationType")
    mapping = (mapping.prop(0) if mapping else "ByPolygonVertex")
    ref = (ref.prop(0) if ref else "Direct")
    idx_node = elem.find(index_name)
    if ref == "IndexToDirect" and idx_node is not None:
        idx = np.asarray(idx_node.prop(0), np.int64)
        arr = arr[np.clip(idx, 0, len(arr) - 1)]
    if mapping in ("ByVertice", "ByVertex"):
        return arr[pos_index]
    if mapping == "AllSame":
        return np.broadcast_to(arr[:1], (n_corners, width))
    return arr[:n_corners]  # ByPolygonVertex


def geometry_to_mesh(geo: FbxNode) -> Mesh:
    """Extract one Geometry node into a deduped, triangulated Mesh."""
    verts = np.asarray(geo.find("Vertices").prop(0), np.float64).reshape(-1, 3)
    pvi = np.asarray(geo.find("PolygonVertexIndex").prop(0), np.int64)

    # Split the corner stream into polygons (negative index = last corner,
    # stored as ~index), then fan-triangulate like the OBJ path.
    corner_pos = np.where(pvi < 0, ~pvi, pvi)
    poly_ends = np.flatnonzero(pvi < 0)
    tri_corners = []  # indices INTO the corner stream (for per-corner attrs)
    start = 0
    for end in poly_ends:
        for k in range(start + 1, end):
            tri_corners.extend((start, k, k + 1))
        start = end + 1
    tri_corners = np.asarray(tri_corners, np.int64)

    n_corners = len(pvi)
    normals = None
    uvs = None
    ln = geo.find("LayerElementNormal")
    if ln is not None:
        normals = _layer_values(ln, "Normals", "NormalsIndex", n_corners,
                                corner_pos, 3)
    lu = geo.find("LayerElementUV")
    if lu is not None:
        uvs = _layer_values(lu, "UV", "UVIndex", n_corners, corner_pos, 2)

    c_pos = corner_pos[tri_corners]
    c_nrm = (normals[tri_corners] if normals is not None
             else np.zeros((len(tri_corners), 3)))
    c_uv = (uvs[tri_corners] if uvs is not None
            else np.zeros((len(tri_corners), 2)))
    # FBX V coordinate is bottom-up; the engine (like the reference's OBJ
    # path, ZeldaEngine.cpp:6936) flips to top-down.
    if uvs is not None:
        c_uv = np.stack([c_uv[:, 0], 1.0 - c_uv[:, 1]], -1)

    # Dedup (pos, normal, uv) tuples like LoadMeshAsset's unordered_map.
    key = np.concatenate(
        [verts[c_pos], c_nrm, c_uv], axis=1
    ).astype(np.float32)
    uniq, first_idx, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    remap = np.argsort(first_idx)  # unique rows in first-occurrence order
    rank = np.empty(len(remap), np.int64)
    rank[remap] = np.arange(len(remap))

    mesh = Mesh(
        positions=uniq[remap, 0:3].astype(np.float32),
        normals=uniq[remap, 3:6].astype(np.float32),
        colors=np.ones((len(uniq), 3), np.float32),
        uvs=uniq[remap, 6:8].astype(np.float32),
        indices=rank[inverse].reshape(-1, 3).astype(np.int32),
    )
    if not np.abs(mesh.normals).any():
        _compute_normals_inplace(mesh)
    return mesh


def load_fbx(path: str) -> Mesh:
    """Load the first Geometry of a binary FBX file as a Mesh."""
    with open(path, "rb") as f:
        data = f.read()
    root = parse_fbx(data)
    objects = root.find("Objects")
    if objects is None:
        raise ValueError("FBX has no Objects node")
    geos = objects.find_all("Geometry")
    if not geos:
        raise ValueError("FBX has no Geometry")
    return geometry_to_mesh(geos[0])


# --------------------------------------------------------------------- write


def _write_property(out: bytearray, val) -> None:
    if isinstance(val, bool):
        out += b"C" + struct.pack("<B", val)
    elif isinstance(val, int):
        out += b"L" + struct.pack("<q", val)
    elif isinstance(val, float):
        out += b"D" + struct.pack("<d", val)
    elif isinstance(val, str):
        raw = val.encode("utf-8")
        out += b"S" + struct.pack("<I", len(raw)) + raw
    elif isinstance(val, np.ndarray):
        code = {np.float64: b"d", np.int32: b"i", np.float32: b"f",
                np.int64: b"l"}[val.dtype.type]
        raw = val.tobytes()
        out += code + struct.pack("<III", val.size, 0, len(raw)) + raw
    else:
        raise TypeError(type(val))


def _write_node(out: bytearray, name: str, props=(), children=()) -> None:
    start = len(out)
    out += struct.pack("<III", 0, len(props), 0)
    out += struct.pack("<B", len(name)) + name.encode("ascii")
    p0 = len(out)
    for p in props:
        _write_property(out, p)
    prop_len = len(out) - p0
    for cname, cprops, cchildren in children:
        _write_node(out, cname, cprops, cchildren)
    if children:
        out += b"\x00" * 13  # null sentinel closes the child list
    struct.pack_into("<III", out, start, len(out), len(props), prop_len)


def save_fbx(path: str, mesh: Mesh) -> None:
    """Write a minimal binary FBX (version 7400) with one Geometry."""
    tri = mesh.indices.astype(np.int64)
    pvi = tri.copy().reshape(-1)
    pvi[2::3] = ~pvi[2::3]  # last corner of each triangle is bit-inverted
    n_corners = tri.size
    normals = mesh.normals[tri.reshape(-1)].astype(np.float64)
    uvs = mesh.uvs[tri.reshape(-1)].astype(np.float64)
    uvs = np.stack([uvs[:, 0], 1.0 - uvs[:, 1]], -1)  # store bottom-up

    geometry = (
        "Geometry", [1000001, "Mesh::mesh", "Mesh"], [
            ("Vertices", [mesh.positions.astype(np.float64).reshape(-1)], []),
            ("PolygonVertexIndex", [pvi.astype(np.int32)], []),
            ("GeometryVersion", [124], []),
            ("LayerElementNormal", [0], [
                ("Version", [101], []),
                ("Name", [""], []),
                ("MappingInformationType", ["ByPolygonVertex"], []),
                ("ReferenceInformationType", ["Direct"], []),
                ("Normals", [normals.reshape(-1)], []),
            ]),
            ("LayerElementUV", [0], [
                ("Version", [101], []),
                ("Name", ["UVMap"], []),
                ("MappingInformationType", ["ByPolygonVertex"], []),
                ("ReferenceInformationType", ["IndexToDirect"], []),
                ("UV", [uvs.reshape(-1)], []),
                ("UVIndex", [np.arange(n_corners, dtype=np.int32)], []),
            ]),
            ("Layer", [0], [
                ("Version", [100], []),
                ("LayerElement", [], [
                    ("Type", ["LayerElementNormal"], []),
                    ("TypedIndex", [0], []),
                ]),
                ("LayerElement", [], [
                    ("Type", ["LayerElementUV"], []),
                    ("TypedIndex", [0], []),
                ]),
            ]),
        ]
    )

    out = bytearray()
    out += MAGIC
    out += struct.pack("<I", 7400)
    _write_node(out, "FBXHeaderExtension", [], [
        ("FBXHeaderVersion", [1003], []),
        ("FBXVersion", [7400], []),
    ])
    _write_node(out, "GlobalSettings", [], [("Version", [1000], [])])
    _write_node(out, "Objects", [], [geometry])
    out += b"\x00" * 13  # top-level null sentinel
    with open(path, "wb") as f:
        f.write(bytes(out))

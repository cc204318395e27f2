"""Binary FBX import/export round trips (the reference's OpenFBX branch
parses and discards — ZeldaEngine.cpp:6950-7038 — so any working load
exceeds it)."""

import numpy as np
import pytest

from zeldaengine_tpu.scene.fbx import load_fbx, parse_fbx, save_fbx
from zeldaengine_tpu.scene.mesh import load_mesh, make_cube, make_sphere


def test_roundtrip_cube(tmp_path):
    mesh = make_cube(1.0)
    path = str(tmp_path / "cube.fbx")
    save_fbx(path, mesh)
    back = load_mesh(path)
    assert back.num_triangles == mesh.num_triangles
    # Same triangle soup: compare corner positions triangle-by-triangle.
    orig = np.sort(mesh.positions[mesh.indices].reshape(-1, 9), axis=0)
    got = np.sort(back.positions[back.indices].reshape(-1, 9), axis=0)
    np.testing.assert_allclose(got, orig, atol=1e-6)


def test_roundtrip_sphere_normals_uvs(tmp_path):
    mesh = make_sphere(1.0, rings=8, sectors=12)
    path = str(tmp_path / "sphere.fbx")
    save_fbx(path, mesh)
    back = load_fbx(path)
    assert back.num_triangles == mesh.num_triangles
    # Normals survive (unit length, mostly radial for a sphere).
    n = back.normals
    lens = np.linalg.norm(n, axis=-1)
    assert np.allclose(lens[lens > 0], 1.0, atol=1e-3)
    radial = np.abs(np.sum(back.normals * back.positions, -1))
    assert radial.mean() > 0.9
    assert back.uvs.min() >= -1e-6 and back.uvs.max() <= 1.0 + 1e-6


def test_compressed_arrays(tmp_path):
    """zlib-compressed property arrays decode correctly."""
    import struct
    import zlib

    mesh = make_cube(1.0)
    path = str(tmp_path / "c.fbx")
    save_fbx(path, mesh)
    with open(path, "rb") as f:
        data = f.read()
    root = parse_fbx(data)
    verts = root.find("Objects").find_all("Geometry")[0].find("Vertices")
    arr = verts.prop(0)
    # Re-encode that array compressed and parse again via a synthetic node.
    raw = np.asarray(arr, np.float64).tobytes()
    comp = zlib.compress(raw)
    blob = b"d" + struct.pack("<III", len(arr), 1, len(comp)) + comp
    from zeldaengine_tpu.scene.fbx import _read_property

    val, _ = _read_property(memoryview(blob), 0)
    np.testing.assert_allclose(val, arr)


def test_quad_polygons_triangulate(tmp_path):
    """Writer emits triangles; hand-build a quad PVI to test fans."""
    import struct

    from zeldaengine_tpu.scene.fbx import geometry_to_mesh, FbxNode

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
    )
    pvi = np.array([0, 1, 2, ~3], np.int64)  # one quad
    geo = FbxNode("Geometry", [1, "Mesh::q", "Mesh"], [
        FbxNode("Vertices", [verts.reshape(-1)], []),
        FbxNode("PolygonVertexIndex", [pvi], []),
    ])
    mesh = geometry_to_mesh(geo)
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 4


def test_ascii_rejected(tmp_path):
    p = tmp_path / "a.fbx"
    p.write_bytes(b"; FBX 7.4.0 project file\nFBXHeaderExtension: {}\n")
    with pytest.raises(ValueError):
        load_fbx(str(p))


def test_profab_discovery_accepts_fbx(tmp_path):
    """An .fbx under Profabs/<name>/models loads through the scanner."""
    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.scene.assets import load_profab
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder

    root = tmp_path / "root"
    mdir = root / "Profabs" / "thing" / "models"
    tdir = root / "Profabs" / "thing" / "textures"
    mdir.mkdir(parents=True)
    tdir.mkdir(parents=True)
    save_fbx(str(mdir / "thing.fbx"), make_cube(1.0))
    b = SceneBuilder(TEST_CONFIG)
    found = load_profab(b, "thing", [str(root)], None, deferred=True)
    assert found
    scene, meta = b.build()
    assert meta.num_triangles == 12

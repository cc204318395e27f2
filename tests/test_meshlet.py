"""Meshlet baking, binary serde round-trip, and culling."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.meshlet import (
    build_meshlets,
    save_meshlet_set,
    load_meshlet_set,
)
from zeldaengine_tpu.ops.culling import (
    frustum_planes,
    frustum_cull_spheres,
    cone_cull,
    meshlet_cull,
    expand_meshlet_mask,
)
from zeldaengine_tpu.scene.mesh import make_sphere
from zeldaengine_tpu.math import look_at, perspective_vk
from zeldaengine_tpu.math.transforms import matmul_f32


def test_build_meshlets_limits_and_coverage():
    mesh = make_sphere(1.0, rings=16, sectors=24)
    ms = build_meshlets(mesh.positions, mesh.indices, max_vertices=64,
                        max_triangles=124, normals=mesh.normals, uvs=mesh.uvs)
    assert len(ms.meshlets) >= 2
    total_tris = sum(m.triangle_count for m in ms.meshlets)
    assert total_tris == mesh.num_triangles
    for m in ms.meshlets:
        assert m.vertex_count <= 64
        assert m.triangle_count <= 124
        # local indices stay within the meshlet's vertex window
        tris = ms.meshlet_triangles[
            m.triangle_offset : m.triangle_offset + m.triangle_count * 3
        ]
        assert tris.max() < m.vertex_count
        # bounds actually bound the meshlet's vertices
        vids = ms.meshlet_vertices[
            m.vertex_offset : m.vertex_offset + m.vertex_count
        ]
        d = np.linalg.norm(mesh.positions[vids] - m.bounds_center, axis=1)
        assert (d <= m.bounds_radius + 1e-4).all()


def test_meshlet_reconstruction_matches_original():
    """Re-expanding meshlets reproduces the original triangle set."""
    mesh = make_sphere(1.0, rings=8, sectors=12)
    ms = build_meshlets(mesh.positions, mesh.indices)
    rebuilt = []
    for m in ms.meshlets:
        tris = ms.meshlet_triangles[
            m.triangle_offset : m.triangle_offset + m.triangle_count * 3
        ].reshape(-1, 3)
        rebuilt.append(
            ms.meshlet_vertices[tris + 0]
            if m.vertex_offset == 0
            else ms.meshlet_vertices[m.vertex_offset:][tris]
        )
    rebuilt = np.sort(np.concatenate(rebuilt), axis=0)
    # compare as unordered sets of (sorted) triangles
    orig = {tuple(sorted(t)) for t in mesh.indices.tolist()}
    got = set()
    for m in ms.meshlets:
        tris = ms.meshlet_triangles[
            m.triangle_offset : m.triangle_offset + m.triangle_count * 3
        ].reshape(-1, 3)
        for t in tris:
            got.add(tuple(sorted(ms.meshlet_vertices[m.vertex_offset + t].tolist())))
    assert got == orig


def test_meshlet_binary_roundtrip(tmp_path):
    mesh = make_sphere(1.0, rings=8, sectors=12)
    ms = build_meshlets(mesh.positions, mesh.indices, normals=mesh.normals,
                        uvs=mesh.uvs)
    path = str(tmp_path / "sphere.meshlet")
    save_meshlet_set(path, ms)
    ms2 = load_meshlet_set(path)
    assert len(ms2.meshlets) == len(ms.meshlets)
    np.testing.assert_array_equal(ms2.meshlet_vertices, ms.meshlet_vertices)
    np.testing.assert_array_equal(ms2.meshlet_triangles, ms.meshlet_triangles)
    np.testing.assert_allclose(ms2.vertices, ms.vertices)
    np.testing.assert_array_equal(ms2.indices, ms.indices)
    for a, b in zip(ms.meshlets, ms2.meshlets):
        np.testing.assert_allclose(a.bounds_center, b.bounds_center)
        assert abs(a.cone_cutoff - b.cone_cutoff) < 1e-6
    # byte-level: record stride is 64B like the reference struct
    import os
    expected = 8 + len(ms.meshlets) * 64
    with open(path, "rb") as f:
        header = f.read(8)
    assert int.from_bytes(header, "little") == len(ms.meshlets)


def test_frustum_cull():
    eye = np.array([0.0, -10.0, 0.0])
    view = look_at(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]))
    proj = perspective_vk(np.radians(60.0), 1.0, 0.1, 100.0)
    vp = matmul_f32(proj, view)
    planes = frustum_planes(vp)
    centers = jnp.array(
        [
            [0.0, 0.0, 0.0],  # dead center: visible
            [0.0, -20.0, 0.0],  # behind camera
            [200.0, 50.0, 0.0],  # far off to the side
            [0.0, 150.0, 0.0],  # beyond far plane
            [8.0, 0.0, 0.0],  # outside frustum but sphere overlaps
        ]
    )
    radii = jnp.array([1.0, 1.0, 1.0, 1.0, 6.0])
    vis = np.asarray(frustum_cull_spheres(planes, centers, radii))
    assert vis.tolist() == [True, False, False, False, True]


def test_cone_cull_back_hemisphere():
    """Meshlets of a sphere facing away from the camera get cone-culled."""
    mesh = make_sphere(1.0, rings=24, sectors=32)
    ms = build_meshlets(mesh.positions, mesh.indices, max_triangles=32)
    recs = jnp.asarray(ms.arrays())
    cam = jnp.array([0.0, -5.0, 0.0])
    vis = np.asarray(
        cone_cull(recs[:, 4:7], recs[:, 7], recs[:, 11:14], recs[:, 14], cam)
    )
    # some back-facing meshlets culled, all front-facing kept
    centers = np.asarray(recs[:, 4:7])
    front = centers[:, 1] < -0.3  # facing the camera at -Y
    assert vis[front].all(), "front meshlets must never be culled"
    assert (~vis).sum() > 0, "some back meshlets should be culled"
    # culled fraction should be meaningful but conservative
    assert 0.1 < (~vis).mean() < 0.6


def test_meshlet_cull_end_to_end_mask():
    mesh = make_sphere(1.0, rings=24, sectors=32)
    ms = build_meshlets(mesh.positions, mesh.indices, max_triangles=32)
    recs = jnp.asarray(ms.arrays())
    eye = np.array([0.0, -5.0, 0.0])
    view = look_at(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]))
    proj = perspective_vk(np.radians(60.0), 1.0, 0.1, 100.0)
    vp = matmul_f32(proj, view)
    vis = meshlet_cull(recs, vp, jnp.asarray(eye, jnp.float32))
    tri_meshlet = np.concatenate(
        [np.full(m.triangle_count, i) for i, m in enumerate(ms.meshlets)]
    )
    tri_mask = np.asarray(expand_meshlet_mask(vis, jnp.asarray(tri_meshlet)))
    assert tri_mask.shape[0] == mesh.num_triangles
    assert 0.3 < tri_mask.mean() < 1.0

"""GPU-driven meshlet path: bake -> scene -> cull -> render."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.meshlet import build_meshlets
from zeldaengine_tpu.scene.mesh import make_sphere, make_plane
from zeldaengine_tpu.scene.scenebuild import SceneBuilder
from zeldaengine_tpu.scene.world import World, CameraDesc, LightDesc
from zeldaengine_tpu.passes import build_view_state, render_frame


@pytest.fixture(scope="module")
def meshlet_scene():
    cfg = TEST_CONFIG
    b = SceneBuilder(cfg)
    b.enable_skydome = False
    mesh = make_sphere(1.0, rings=24, sectors=32)
    ms = build_meshlets(mesh.positions, mesh.indices, max_triangles=64,
                        normals=mesh.normals, uvs=mesh.uvs)
    b.add_meshlet_object(ms, b.add_material({}))
    b.add_object(make_plane(5.0, z=-1.2), b.add_material({}))
    scene, meta = b.build()
    assert meta.has_meshlets and meta.num_meshlets > 4

    w = World()
    w.enable_skydome = False
    w.main_camera = CameraDesc(position=np.array([0.0, -4.0, 1.0], np.float32),
                               lookat=np.zeros(3, np.float32))
    moon = np.array([10.0, -10.0, 20.0], np.float32)
    w.directional_lights = [LightDesc(position=moon, type=0, intensity=3.0,
                                      direction=moon / np.linalg.norm(moon))]
    view = build_view_state(w, cfg, light_capacities=(2, 2, 2),
                            animate_point_lights=False)
    return cfg, scene, meta, view, ms


def test_meshlet_object_renders(meshlet_scene):
    cfg, scene, meta, view, ms = meshlet_scene
    color, aux = render_frame(scene, view, meta, cfg)
    tid = np.asarray(aux["tri_id"])
    # sphere visible in the middle of the frame
    assert tid[cfg.height // 2, cfg.width // 2] >= 0
    assert np.isfinite(np.asarray(color)).all()


def test_meshlet_culling_reduces_work(meshlet_scene):
    """Back-facing meshlets are culled: the set of drawn triangle ids must
    exclude triangles whose meshlet faces away, and the sphere must still
    silhouette correctly (no visible holes vs a no-cull render)."""
    cfg, scene, meta, view, ms = meshlet_scene
    _, aux = render_frame(scene, view, meta, cfg)
    tid = np.asarray(aux["tri_id"])
    drawn = np.unique(tid[tid >= 0])
    tri_meshlet = np.asarray(scene.tri_meshlet)
    drawn_meshlets = np.unique(tri_meshlet[drawn])
    drawn_meshlets = drawn_meshlets[drawn_meshlets >= 0]
    # far fewer meshlets visible than exist (front hemisphere only)
    assert 0 < len(drawn_meshlets) < meta.num_meshlets

    # no-cull render (meshlet ids erased) must produce the same image
    scene_nc = scene._replace(
        tri_meshlet=jnp.full_like(scene.tri_meshlet, -1)
    )
    meta_nc = meta  # has_meshlets stays True; mask becomes all-pass
    color_c, aux_c = render_frame(scene, view, meta, cfg)
    color_nc, aux_nc = render_frame(scene_nc, view, meta_nc, cfg)
    np.testing.assert_array_equal(
        np.asarray(aux_c["tri_id"]), np.asarray(aux_nc["tri_id"])
    )
    np.testing.assert_allclose(
        np.asarray(color_c), np.asarray(color_nc), atol=1e-6
    )


def test_meshlet_instanced_object():
    """Indirect-INSTANCED class (ZeldaEngine.cpp:3597-3635): one baked
    meshlet object replicated with per-instance transforms; culling
    operates per (meshlet, instance)."""
    cfg = TEST_CONFIG
    b = SceneBuilder(cfg)
    b.enable_skydome = False
    mesh = make_sphere(0.5, rings=12, sectors=16)
    ms = build_meshlets(mesh.positions, mesh.indices, max_triangles=64,
                        normals=mesh.normals, uvs=mesh.uvs)
    inst = np.zeros((3, 8), np.float32)
    inst[:, 0] = [-1.5, 0.0, 1.5]  # x positions
    inst[:, 4] = [0.0, 1.0, 0.0]   # middle instance rotated (yaw)
    inst[:, 6] = [1.0, 1.0, 0.5]   # last instance half scale
    b.add_meshlet_object(ms, b.add_material({}), instances=inst)
    scene, meta = b.build()
    n_single = len(ms.meshlets)
    assert meta.num_meshlets == 3 * n_single
    assert meta.num_instances == 3

    w = World()
    w.enable_skydome = False
    w.main_camera = CameraDesc(
        position=np.array([0.0, -5.0, 0.5], np.float32),
        lookat=np.zeros(3, np.float32))
    moon = np.array([10.0, -10.0, 20.0], np.float32)
    w.directional_lights = [LightDesc(position=moon, type=0, intensity=3.0,
                                      direction=moon / np.linalg.norm(moon))]
    view = build_view_state(w, cfg, light_capacities=(2, 2, 2),
                            animate_point_lights=False)
    color, aux = render_frame(scene, view, meta, cfg)
    tid = np.asarray(aux["tri_id"])
    covered_cols = np.unique(np.nonzero(tid >= 0)[1])
    # three separated spheres: coverage on the left, center and right
    assert (covered_cols < cfg.width // 3).any()
    assert ((covered_cols >= cfg.width // 3)
            & (covered_cols < 2 * cfg.width // 3)).any()
    assert (covered_cols >= 2 * cfg.width // 3).any()
    # per-instance culling records: all three spheres' meshlets in front
    # of the camera survive, and the scaled instance is smaller on screen
    left = (tid >= 0)[:, : cfg.width // 3].sum()
    right = (tid >= 0)[:, 2 * cfg.width // 3 :].sum()
    assert right < left

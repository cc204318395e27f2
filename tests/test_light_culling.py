"""Tiled point-light culling: the usable form of the reference's 512-light
capacity (ZeldaEngine.cpp:85; brute-force loop BaseLighting.frag:182-207).

Exactness argument: a surface point lit by a (finite-radius) point light
lies inside the light's sphere, so its screen projection lies inside the
sphere's conservative screen rect — tile culling can only drop lights whose
attenuation at every tile pixel is exactly zero."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.passes.frame import render_rows
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene.mesh import make_plane
from zeldaengine_tpu.scene.scenebuild import SceneBuilder
from zeldaengine_tpu.scene.world import World, CameraDesc, LightDesc

# capacity > 64 triggers the tiled path (TEST_CONFIG is 128x128;
# light tiles 8x128 divide it)
CONFIG = TEST_CONFIG.replace(enable_shadow=False, enable_skydome=False,
                             max_point_lights=96)


def _scene():
    b = SceneBuilder(CONFIG)
    b.enable_skydome = False
    b.add_object(make_plane(12.0), b.add_material({}))
    return b.build()


def _world(n_lights, rng):
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([0.0, -6.0, 6.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    for _ in range(n_lights):
        w.point_lights.append(LightDesc(
            position=np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), 0.7],
                              np.float32),
            type=1,
            color=np.array([rng.uniform(0.3, 1), rng.uniform(0.3, 1),
                            rng.uniform(0.3, 1)], np.float32),
            intensity=4.0, radius=1.2,
        ))
    return w


def _render(world, max_point, animate=False):
    scene, meta = _scene()
    view = build_view_state(world, CONFIG, light_capacities=(2, max_point, 2),
                            animate_point_lights=animate)
    color, _ = render_rows(scene, view, meta, CONFIG)
    return np.asarray(color)


def test_tiled_matches_bruteforce(rng):
    # K must exceed the densest tile's light count for bit-parity (the cap
    # is the standard Forward+ per-tile budget; saturation drops lights).
    global CONFIG
    saved = CONFIG
    CONFIG = CONFIG.replace(max_tile_lights=80)
    try:
        # 60 live lights: fits the 64-capacity brute table AND no tile
        # exceeds K, so both paths shade the identical light set
        world = _world(60, rng)
        tiled = _render(world, 96)   # capacity 96 > 64 -> tiled path
        brute = _render(world, 64)   # capacity 64 -> unrolled brute force
        np.testing.assert_allclose(tiled, brute, atol=2e-6)
    finally:
        CONFIG = saved


def test_tile_cull_lists_are_sane(rng):
    from zeldaengine_tpu.ops.lighting import cull_point_lights_tiled

    world = _world(70, rng)
    view = build_view_state(world, CONFIG, light_capacities=(2, 96, 2),
                            animate_point_lights=False)
    tile_idx, tile_cnt, _drops = cull_point_lights_tiled(
        view.point_lights, view.lights_count[1], view, CONFIG.width,
        CONFIG.height, CONFIG.light_tile_h, CONFIG.light_tile_w,
        CONFIG.max_tile_lights,
    )
    cnt = np.asarray(tile_cnt)
    assert cnt.max() <= CONFIG.max_tile_lights
    # Scattered small-radius lights: the average tile sees far fewer
    # lights than the total (otherwise culling buys nothing).
    assert cnt.mean() < 35, cnt.mean()
    assert np.asarray(tile_idx).max() < 96


def test_depth_bounds_cull_occluded_lights():
    """VERDICT r3 #6: a wall hides 100 lights — with depth bounds (the
    per-tile world AABB of the visible surface) they stop occupying the
    k_max slots, where the screen-rect test alone saturates every tile."""
    from zeldaengine_tpu.ops.lighting import cull_point_lights_tiled
    from zeldaengine_tpu.passes.view import build_view_state

    h = w = 128
    rng = np.random.RandomState(7)
    world = World()
    world.main_camera = CameraDesc(
        position=np.array([0.0, -6.0, 0.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    # 100 lights far behind the visible wall (y >> 0), small radius.
    for _ in range(100):
        world.point_lights.append(LightDesc(
            position=np.array(
                [rng.uniform(-3, 3), 50.0, rng.uniform(-3, 3)], np.float32),
            type=1, intensity=5.0, radius=1.0,
        ))
    cfg = CONFIG.replace(max_point_lights=128, max_tile_lights=8)
    # keep the authored positions (the default re-scatters point lights
    # into the reference's spinning ring, :4637-4646)
    view = build_view_state(world, cfg, time=0.0,
                            animate_point_lights=False)
    # The visible surface: a wall at y=0 filling the screen.
    xs = np.linspace(-4, 4, w, dtype=np.float32)
    zs = np.linspace(4, -4, h, dtype=np.float32)
    wall = np.stack(np.broadcast_arrays(
        xs[None, :], np.zeros((h, w), np.float32), zs[:, None]), -1)
    covered = jnp.ones((h, w), bool)

    # Screen-rect only: every light's rect covers mid-screen tiles and
    # the 8-slot cap drops most of them.
    _, cnt0, drops0 = cull_point_lights_tiled(
        view.point_lights, view.lights_count[1], view, w, h, 8, 128, 8)
    assert int(drops0) > 0 and int(jnp.max(cnt0)) == 8

    # With depth bounds every occluded light is culled: no drops, no
    # slots wasted.
    _, cnt1, drops1 = cull_point_lights_tiled(
        view.point_lights, view.lights_count[1], view, w, h, 8, 128, 8,
        world_pos=jnp.asarray(wall), covered=covered)
    assert int(drops1) == 0
    assert int(jnp.max(cnt1)) == 0


def test_depth_bounds_keep_reaching_lights():
    """Lights that DO reach the visible surface survive depth bounds and
    the lit result matches the brute-force loop exactly."""
    rng = np.random.RandomState(3)
    scene, meta = _scene()
    world = _world(24, rng)
    view = build_view_state(world, CONFIG, time=0.0)
    img_tiled, _ = render_rows(scene, view, meta, CONFIG)
    img_brute, _ = render_rows(
        scene, view, meta, CONFIG.replace(tiled_lights_min=4096))
    assert np.allclose(np.asarray(img_tiled), np.asarray(img_brute),
                       atol=1e-6)

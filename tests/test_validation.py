"""Validation mode (EngineConfig.validation) — the analogue of the
reference's VK_LAYER_KHRONOS_validation + debug messenger
(ZeldaEngine.cpp:799-829): opt-in counters for conditions that otherwise
fail silently. Each test forces one condition and asserts it is
reported."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.passes import build_view_state, render_frame
from zeldaengine_tpu.scene import make_cube, make_plane
from zeldaengine_tpu.scene.scenebuild import SceneBuilder
from zeldaengine_tpu.scene.world import CameraDesc, LightDesc, World


def _scene(cfg):
    b = SceneBuilder(cfg)
    b.add_object(make_plane(6.0), b.add_material({}), deferred=True)
    b.add_object(make_cube(1.0, center=(0, 0, 0.5)), b.add_material({}),
                 deferred=True)
    return b.build()


def _world(n_point=1, intensity=5.0):
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([3.0, -3.0, 2.5], np.float32),
        lookat=np.array([0.0, 0.0, 0.5], np.float32),
    )
    sun = np.array([20.0, 0.0, 20.0], np.float32)
    w.directional_lights = [
        LightDesc(position=sun, type=0, intensity=4.0,
                  direction=sun / np.linalg.norm(sun))
    ]
    rng = np.random.RandomState(0)
    for _ in range(n_point):
        w.point_lights.append(LightDesc(
            position=np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.0],
                              np.float32),
            type=1, intensity=intensity, radius=4.0,
            color=np.array([1.0, 0.5, 0.2], np.float32),
        ))
    return w


def test_validation_off_by_default():
    cfg = TEST_CONFIG
    scene, meta = _scene(cfg)
    view = build_view_state(_world(), cfg, light_capacities=(2, 2, 2))
    _, aux = render_frame(scene, view, meta, cfg)
    assert "validation" not in aux


def test_validation_clean_frame_reports_zero_nonfinite():
    cfg = TEST_CONFIG.replace(validation=True)
    scene, meta = _scene(cfg)
    view = build_view_state(_world(), cfg, light_capacities=(2, 2, 2))
    _, aux = render_frame(scene, view, meta, cfg)
    v = aux["validation"]
    assert int(v["nonfinite_color"]) == 0
    assert int(v["nonfinite_shadowmap"]) == 0
    assert int(v["light_drops"]) == 0


def test_validation_counts_nonfinite_color():
    cfg = TEST_CONFIG.replace(validation=True)
    scene, meta = _scene(cfg)
    view = build_view_state(_world(intensity=float("inf")), cfg,
                            light_capacities=(2, 2, 2))
    _, aux = render_frame(scene, view, meta, cfg)
    assert int(aux["validation"]["nonfinite_color"]) > 0


def test_validation_counts_tile_light_drops():
    # 80 coincident big lights with a per-tile cap of 1: covered tiles
    # must report dropped lights.
    cfg = TEST_CONFIG.replace(validation=True, max_tile_lights=1,
                              max_point_lights=128,
                              adaptive_light_capacity=False)
    scene, meta = _scene(cfg)
    view = build_view_state(_world(n_point=80), cfg,
                            light_capacities=(2, 128, 2))
    assert view.point_lights.shape[0] > 64  # tiled path engaged
    _, aux = render_frame(scene, view, meta, cfg)
    assert int(aux["validation"]["light_drops"]) > 0


def test_validation_counts_oversized_tris():
    """The counter reports GLOBAL-bucket triangles: bbox over both the
    per-tile (pair_expand) and supertile (SUPER_EXPAND) budgets. The
    128x128 test screen holds only 2 supertiles, so a frame there can
    never produce one (asserted 0); the positive case uses a synthetic
    full-screen triangle on a 16-supertile virtual screen."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import count_oversized

    cfg = TEST_CONFIG.replace(validation=True, pair_expand=1)
    scene, meta = _scene(cfg)
    view = build_view_state(_world(), cfg, light_capacities=(2, 2, 2))
    _, aux = render_frame(scene, view, meta, cfg)
    assert int(aux["validation"]["oversized_tris"]) == 0

    w, h = 1024, 512  # 8x2 supertiles at tile 8x128 (64x512 px each)
    clip = jnp.asarray([[[-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0],
                         [0.0, 8.0, 0.5, 1.0]]], jnp.float32)
    setup = triangle_setup(clip, w, h, two_sided=True)
    n = count_oversized(setup, w, h, cfg.tile_h, cfg.tile_w, expand=1)
    assert int(n) == 1

"""Pallas tile-restricted point lighting == the unrolled XLA loop.

The kernel (ops/lighting_pallas.py) accumulates each block's CULLED
point lights onto the directional partial sum; exact-zero falloff
beyond the light radius (pbr.apply_point_light) makes skipped lights
contribute +0.0, so the result must match the unrolled reference
path. Interpret mode runs the same jnp ops as XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeldaengine_tpu.ops.lighting import (
    cull_point_lights_tiled,
    direct_lighting,
)
from zeldaengine_tpu.ops import pbr


class _View:
    pass


def _scene(h=48, w=256, n_lights=5, seed=0):
    rng = np.random.RandomState(seed)
    # A plausible visible surface: a tilted ground plane in world space.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    p = np.stack([xs / w * 20 - 10, ys / h * 20 - 10,
                  0.1 * np.sin(xs / 9.0)], -1)
    n = np.tile(np.asarray([0.1, 0.0, 1.0], np.float32), (h, w, 1))
    n = np.asarray(pbr.normalize(jnp.asarray(n)))
    cam = np.asarray([0.0, -6.0, 8.0], np.float32)
    v = np.asarray(pbr.normalize(jnp.asarray(cam - p)))
    ndotv = np.clip(np.sum(n * v, -1), 0.0, 1.0)
    dc = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    rough = rng.uniform(0.05, 1.0, (h, w)).astype(np.float32)

    lights = np.zeros((8, 4, 4), np.float32)
    for i in range(n_lights):
        lights[i, 0, :3] = [rng.uniform(-9, 9), rng.uniform(-9, 9),
                            rng.uniform(0.5, 2.0)]
        lights[i, 1, :3] = rng.uniform(0.2, 1.0, 3)
        lights[i, 1, 3] = rng.uniform(1.0, 8.0)   # intensity
        lights[i, 2, 3] = rng.uniform(1.0, 6.0)   # radius
    view = _View()
    view.camera_pos = jnp.asarray(cam)
    # view_proj: a simple perspective looking at the plane.
    from zeldaengine_tpu.math.transforms import look_at, perspective

    view.view_proj = jnp.asarray(
        perspective(45.0, w / h, 0.1, 100.0)
        @ look_at(cam, np.zeros(3, np.float32),
                  np.asarray([0, 0, 1], np.float32)))
    view.camera_fov = 45.0
    return (jnp.asarray(dc), jnp.asarray(rough), jnp.asarray(n),
            jnp.asarray(p), jnp.asarray(v), jnp.asarray(ndotv),
            jnp.asarray(lights), n_lights, view)


@pytest.mark.parametrize("block_h", [8, 24])
def test_pallas_points_match_unrolled(block_h):
    dc, rough, n, p, v, ndotv, lights, n_live, view = _scene()
    h, w = rough.shape
    dirs = jnp.zeros((1, 4, 4), jnp.float32)
    sf = jnp.ones((h, w), jnp.float32)

    ref = direct_lighting(dc, rough, n, p, v, ndotv, sf,
                          dirs, jnp.int32(0), lights, jnp.int32(n_live))

    tile_idx, tile_cnt, drops = cull_point_lights_tiled(
        lights, jnp.int32(n_live), view, w, h, block_h, 128, k_max=8,
        world_pos=p, covered=jnp.ones((h, w), bool))
    assert int(drops) == 0
    got = direct_lighting(
        dc, rough, n, p, v, ndotv, sf, dirs, jnp.int32(0),
        lights, jnp.int32(n_live),
        pallas_points=(tile_idx, tile_cnt, block_h, True))

    # A handful of pixels differ by ~1e-5 absolute (FMA-contraction
    # ulps in the per-light chain); the u8 swapchain quantum is 3.9e-3,
    # so anything below 1e-4 is invisible in every output path.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
    # The culled evaluation must still light the lit regions.
    assert float(jnp.max(got)) > 0.01


def test_render_rows_pallas_points_full_frame():
    """Full deferred frame: point_light_kernel='pallas' (interpret on
    CPU) vs 'unroll' — images must agree everywhere."""
    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.passes.frame import render_frame
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene
    from zeldaengine_tpu.scene.world import LightDesc

    config = TEST_CONFIG.replace(enable_shadow=False)
    scene, meta, world = build_demo_scene(config, grass=40, rocks=4)
    rng = np.random.RandomState(7)
    for i in range(6):
        a = rng.uniform(0, 2 * np.pi)
        d = rng.uniform(0.5, 6.0)
        world.point_lights.append(LightDesc(
            position=np.array([np.sin(a) * d, np.cos(a) * d, 1.0],
                              np.float32),
            type=1, color=np.array([0.9, 0.5, 0.2], np.float32),
            intensity=6.0, radius=2.5))
    view = build_view_state(world, config, time=0.0)

    img_ref, _ = render_frame(scene, view, meta,
                              config.replace(point_light_kernel="unroll"))
    img_pal, _ = render_frame(scene, view, meta,
                              config.replace(point_light_kernel="pallas",
                                             point_block_h=8))
    np.testing.assert_allclose(np.asarray(img_pal), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-5)

"""Merged environment tap vs the separate cubemap/sky samplers."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.ops.envtap import flatten_env_tables, sample_env_merged
from zeldaengine_tpu.ops.texture import (
    build_mip_pair_atlas,
    build_quad_packed_atlas,
    build_quad_pair_atlas_np,
    sample_base,
    sample_cubemap_lod,
)

CS = 32  # cube face size
SS = 64  # sky/bg size


def _setup(rng):
    faces = rng.rand(6, CS, CS, 4).astype(np.float32)
    sky = rng.rand(SS, SS, 4).astype(np.float32)
    bg = rng.rand(SS, SS, 4).astype(np.float32)
    cube_qp = jnp.asarray(build_quad_pair_atlas_np(faces))
    sky_q = jnp.asarray(build_quad_packed_atlas(sky[None]))
    bg_q = jnp.asarray(build_quad_packed_atlas(bg[None]))
    table, rows = flatten_env_tables(cube_qp, sky_q, bg_q)
    shapes = (cube_qp.shape[:3], sky_q.shape[:3], bg_q.shape[:3])
    return faces, sky, bg, cube_qp, sky_q, bg_q, table, shapes


def test_merged_env_matches_separate_taps(rng):
    faces, sky, bg, cube_qp, sky_q, bg_q, table, shapes = _setup(rng)
    h, w = 16, 24
    d = rng.randn(h, w, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lod = rng.rand(h, w).astype(np.float32) * 4.0
    sky_uv = rng.rand(h, w, 2).astype(np.float32)
    bg_uv = rng.rand(h, w, 2).astype(np.float32)
    covered = rng.rand(h, w) > 0.5
    use_sky = rng.rand(h, w) > 0.3

    refl, sky_rgba, bg_rgba = sample_env_merged(
        table, shapes, jnp.asarray(covered), jnp.asarray(d),
        jnp.asarray(lod), CS, jnp.asarray(sky_uv), jnp.asarray(use_sky),
        jnp.asarray(bg_uv), SS, SS,
    )

    cube_pair = jnp.asarray(build_mip_pair_atlas(faces))  # same content
    want_refl = sample_cubemap_lod(
        cube_pair, jnp.zeros((h, w), jnp.int32), jnp.asarray(d),
        jnp.asarray(lod), CS,
    )
    want_sky = sample_base(sky_q, jnp.zeros((h, w), jnp.int32),
                           jnp.asarray(sky_uv), SS, quad=True)
    want_bg = sample_base(bg_q, jnp.zeros((h, w), jnp.int32),
                          jnp.asarray(bg_uv), SS, quad=True)

    np.testing.assert_allclose(
        np.asarray(refl)[covered], np.asarray(want_refl)[covered],
        atol=1e-5, rtol=1e-5)
    m_sky = (~covered) & use_sky
    np.testing.assert_allclose(
        np.asarray(sky_rgba)[m_sky], np.asarray(want_sky)[m_sky],
        atol=1e-5, rtol=1e-5)
    m_bg = (~covered) & (~use_sky)
    np.testing.assert_allclose(
        np.asarray(bg_rgba)[m_bg], np.asarray(want_bg)[m_bg],
        atol=1e-5, rtol=1e-5)


def test_merged_env_no_background(rng):
    faces, sky, bg, cube_qp, sky_q, bg_q, table, shapes = _setup(rng)
    h, w = 8, 8
    d = rng.randn(h, w, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    refl, sky_rgba, bg_rgba = sample_env_merged(
        table, shapes, jnp.zeros((h, w), bool), jnp.asarray(d),
        jnp.zeros((h, w)), CS,
        jnp.asarray(rng.rand(h, w, 2).astype(np.float32)),
        jnp.ones((h, w), bool), None, SS, SS,
    )
    assert np.asarray(sky_rgba).shape == (h, w, 4)


def test_env_merge_frame_matches_separate(rng):
    """A full frame with config.env_merge=True matches the separate-tap
    frame (cube reflection, sky, background all ride one gather)."""
    import jax.numpy as jnp

    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.passes import build_view_state, render_frame
    from zeldaengine_tpu.scene import make_cube, make_plane
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder
    from zeldaengine_tpu.scene.world import CameraDesc, LightDesc, World

    def build(cfg):
        b = SceneBuilder(cfg)
        b.enable_background = True
        b.add_object(make_plane(4.0), b.add_material({}), deferred=True)
        b.add_object(make_cube(1.0, center=(0, 0, 0.5)),
                     b.add_material({}), deferred=True)
        faces = rng.rand(6, cfg.cubemap_size, cfg.cubemap_size,
                         4).astype(np.float32)
        b.set_cubemap(faces)
        b.set_skydome_texture(
            rng.rand(cfg.background_size, cfg.background_size,
                     4).astype(np.float32))
        b.set_background_texture(
            rng.rand(cfg.background_size, cfg.background_size,
                     4).astype(np.float32))
        return b.build()

    w = World()
    w.enable_background = True
    w.main_camera = CameraDesc(
        position=np.array([3.0, -3.0, 2.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.5], np.float32),
    )
    sun = np.array([20.0, 0.0, 20.0], np.float32)
    w.directional_lights = [
        LightDesc(position=sun, type=0, intensity=4.0,
                  direction=sun / np.linalg.norm(sun))
    ]

    rng_state = rng.get_state()
    cfg_off = TEST_CONFIG.replace(env_merge=False, enable_background=True)
    scene_off, meta_off = build(cfg_off)
    view = build_view_state(w, cfg_off, light_capacities=(2, 2, 2))
    img_off = np.asarray(render_frame(scene_off, view, meta_off,
                                      cfg_off)[0])

    rng.set_state(rng_state)  # identical textures
    cfg_on = TEST_CONFIG.replace(env_merge=True, enable_background=True)
    scene_on, meta_on = build(cfg_on)
    assert scene_on.env_table is not None and meta_on.env_shapes
    img_on = np.asarray(render_frame(scene_on, view, meta_on, cfg_on)[0])

    # bf16 table storage + identical math: tolerance covers the bf16
    # round-trip of the separate-path atlases (also bf16) only.
    np.testing.assert_allclose(img_on, img_off, atol=2e-3)
    # Reflection debug view (7) exercises the cube slice of the table.
    view7 = view._replace(debug_view=jnp.int32(7))
    r_off = np.asarray(render_frame(scene_off, view7, meta_off,
                                    cfg_off)[0])
    r_on = np.asarray(render_frame(scene_on, view7, meta_on, cfg_on)[0])
    np.testing.assert_allclose(r_on, r_off, atol=2e-2)

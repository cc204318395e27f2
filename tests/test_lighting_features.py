"""Spot-light shading and push-constant material overrides.

The reference declares spotLights[16] (Base.frag:15) and the 4 override
scalars (XkGlobalConstants, ZeldaEngine.cpp:903-919) but never consumes
either in shader code; here both are functional (match-or-beat)."""

import numpy as np

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.passes.frame import render_rows
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene.mesh import make_plane
from zeldaengine_tpu.scene.scenebuild import SceneBuilder
from zeldaengine_tpu.scene.world import World, CameraDesc, LightDesc

CONFIG = TEST_CONFIG.replace(enable_shadow=False, enable_skydome=False)


def _plane_scene():
    b = SceneBuilder(CONFIG)
    b.enable_skydome = False
    s = CONFIG.texture_size
    half_metal = np.full((s, s, 4), 0.5, np.float32)  # metallic slot = 0.5
    b.add_object(make_plane(10.0), b.add_material({1: half_metal}))
    # Non-black cubemap so the IBL/specular path contributes.
    cs = CONFIG.cubemap_size
    b.set_cubemap(np.full((6, cs, cs, 4), 0.3, np.float32))
    return b.build()


def _world(lights=None, spot=None):
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([0.0, -4.0, 4.0], np.float32),
        lookat=np.array([0.0, 0.0, 0.0], np.float32),
    )
    w.directional_lights = lights or []
    if spot is not None:
        w.spot_lights = [spot]
    return w


def _render(world, overrides=None):
    scene, meta = _plane_scene()
    view = build_view_state(world, CONFIG, light_capacities=(2, 4, 2),
                            overrides=overrides)
    color, _ = render_rows(scene, view, meta, CONFIG)
    return np.asarray(color)


def test_spot_light_cone_lights_center_only():
    spot = LightDesc(
        position=np.array([0.0, 0.0, 3.0], np.float32),
        type=2,
        color=np.array([1.0, 1.0, 1.0], np.float32),
        intensity=30.0,
        direction=np.array([0.0, 0.0, -1.0], np.float32),  # straight down
        radius=10.0,
        extra_data=np.array([0.95, 0.90, 0.0, 0.0], np.float32),
    )
    img = _render(_world(spot=spot))
    h, w = img.shape[:2]
    center = img[h // 2 - 4 : h // 2 + 4, w // 2 - 4 : w // 2 + 4].mean()
    corner = img[:8, :8].mean()
    assert center > corner + 0.05, (center, corner)


def test_spot_count_zero_is_dark():
    img_no = _render(_world())
    spot = LightDesc(
        position=np.array([0.0, 0.0, 3.0], np.float32), type=2,
        intensity=30.0,
        direction=np.array([0.0, 0.0, -1.0], np.float32), radius=10.0,
    )
    img_spot = _render(_world(spot=spot))
    assert img_spot.mean() > img_no.mean() + 0.01


def _sun():
    pos = np.array([5.0, -5.0, 10.0], np.float32)
    return LightDesc(position=pos, type=0, intensity=5.0,
                     direction=pos / np.linalg.norm(pos))


def test_basecolor_override_darkens():
    base = _render(_world(lights=[_sun()]))
    dark = _render(_world(lights=[_sun()]), overrides=[0.1, 1.0, 1.0, 1.0])
    assert dark.mean() < base.mean() - 0.01


def test_metallic_roughness_specular_overrides_change_output():
    base = _render(_world(lights=[_sun()]))
    for ov in ([1.0, 0.0, 1.0, 1.0], [1.0, 1.0, 3.0, 1.0],
               [1.0, 1.0, 1.0, 0.2]):
        img = _render(_world(lights=[_sun()]), overrides=ov)
        assert np.abs(img - base).max() > 1e-3, ov


def test_identity_overrides_are_noop():
    base = _render(_world(lights=[_sun()]))
    same = _render(_world(lights=[_sun()]), overrides=[1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(base, same, atol=1e-6)


def test_cube_const_reflection_bit_identical():
    """Constant-lod reflection (GpuScene.cube_const, scenes whose min
    roughness is exactly 1.0): the per-face 2x2 select path must equal
    the cube_pair1 gather path bit-for-bit."""
    import jax.numpy as jnp

    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    cfg = TEST_CONFIG
    scene, meta, world = build_demo_scene(cfg, grass=30, rocks=4)
    assert scene.cube_const is not None  # demo materials: roughness 1.0
    view = build_view_state(world, cfg, time=0.0)
    img_const, _ = render_rows(scene, view, meta, cfg)
    img_pair, _ = render_rows(scene._replace(cube_const=None), view, meta,
                              cfg)
    assert float(jnp.abs(img_const - img_pair).max()) == 0.0

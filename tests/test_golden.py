"""Golden-image regression tests.

Renders a small deterministic scene and compares against committed golden
PNGs within a tonemap tolerance (BASELINE.json's pixel-match criterion).
Regenerate with:  python -m tests.test_golden  (writes tests/golden/*.png)
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _build():
    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.scene import make_cube, make_plane, make_sphere
    from zeldaengine_tpu.scene.world import World, LightDesc, CameraDesc
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder
    from zeldaengine_tpu.passes import build_view_state

    cfg = TEST_CONFIG
    b = SceneBuilder(cfg)
    c = (np.indices((cfg.texture_size,) * 2).sum(0) // 8 % 2).astype(np.float32)
    checker = np.stack(
        [0.15 + 0.55 * c, 0.25 + 0.2 * c, 0.7 - 0.45 * c, np.ones_like(c)], -1
    )
    b.add_object(make_plane(4.0), b.add_material({}), deferred=True)
    b.add_object(make_cube(1.0, center=(0, 0, 0.5)),
                 b.add_material({0: checker}), deferred=True)
    b.add_object(make_sphere(0.35, rings=12, sectors=18), b.add_material({}),
                 deferred=False)
    faces = np.zeros((6, cfg.cubemap_size, cfg.cubemap_size, 4), np.float32)
    faces[..., 2] = 0.3
    faces[..., 1] = 0.15
    faces[..., 3] = 1.0
    b.set_cubemap(faces)
    ss = cfg.background_size
    g = np.linspace(1, 0, ss, dtype=np.float32)[:, None] * np.ones(
        (1, ss), np.float32
    )
    b.set_skydome_texture(np.stack([0.2 * g, 0.4 * g, 0.8 * g,
                                    np.ones_like(g)], -1))
    scene, meta = b.build()

    w = World()
    w.main_camera = CameraDesc(
        position=np.array([3.0, -3.0, 2.2], np.float32),
        lookat=np.array([0.0, 0.0, 0.4], np.float32),
    )
    moon = np.array([15.0, -5.0, 20.0], np.float32)
    w.directional_lights = [
        LightDesc(position=moon, type=0,
                  color=np.array([1.0, 0.9, 0.75], np.float32), intensity=3.5,
                  direction=moon / np.linalg.norm(moon))
    ]
    w.point_lights = [
        LightDesc(position=np.array([-1.0, -1.0, 1.2], np.float32), type=1,
                  color=np.array([0.9, 0.3, 0.1], np.float32), intensity=6.0,
                  radius=4.0)
    ]
    view = build_view_state(w, cfg, light_capacities=(2, 2, 2),
                            animate_point_lights=False)
    return cfg, scene, meta, view


VIEWS = {"final": 0, "basecolor": 1, "normals": 4, "shadow": 8, "gbuffervis": 9}


def _render_all():
    import jax.numpy as jnp

    from zeldaengine_tpu.passes import render_frame

    cfg, scene, meta, view = _build()
    out = {}
    for name, dv in VIEWS.items():
        v = view._replace(debug_view=jnp.int32(dv))
        img, _ = render_frame(scene, v, meta, cfg)
        out[name] = np.asarray(img)
    return out


@pytest.mark.parametrize("name", sorted(VIEWS))
def test_golden_images(name, _cache={}):
    if not _cache:
        _cache.update(_render_all())
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {name}.png not generated yet")
    from zeldaengine_tpu.utils.image import read_png

    golden = read_png(path)[..., :3]
    got = _cache[name]
    diff = np.abs(got - golden)
    # tonemap tolerance: 8-bit quantization + minor cross-platform fp noise;
    # allow a small fraction of pixels (triangle edges) to deviate more.
    assert (diff > 4 / 255).mean() < 0.01, (
        f"{name}: {(diff > 4 / 255).mean():.4f} of pixels off by >4/255"
    )
    assert np.median(diff) <= 1 / 255


REF_ROOT = "/root/reference/Engine/ZeldaEngine"


def _build_refcontent():
    """A scene built ENTIRELY from the mounted reference Content assets
    (stage.obj/sphere.obj/cube.obj + skydome/cubemap/background PNGs,
    loaded through the same search paths CreateEngineScene uses,
    ZeldaEngine.cpp:4140) — the pixel-match proxy golden."""
    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.scene.assets import (
        asset_path_search, load_texture_image,
    )
    from zeldaengine_tpu.scene.mesh import load_obj
    from zeldaengine_tpu.scene.world import World, LightDesc, CameraDesc
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder
    from zeldaengine_tpu.passes import build_view_state

    cfg = TEST_CONFIG.replace(enable_background=True)
    roots = [REF_ROOT]
    b = SceneBuilder(cfg)
    b.enable_background = True

    def ref_mesh(name):
        return load_obj(asset_path_search(name, roots))

    b.add_object(ref_mesh("stage.obj"), b.add_material({}), deferred=True)
    b.add_object(ref_mesh("cube.obj"), b.add_material({}), deferred=True)
    sphere = ref_mesh("sphere.obj")
    sphere.positions = sphere.positions + np.array([0.0, 1.5, 0.6],
                                                   np.float32)
    b.add_object(sphere, b.add_material({}), deferred=False)
    b.set_skydome_mesh(ref_mesh("skydome.obj"))
    b.set_skydome_texture(load_texture_image(
        asset_path_search("Content/Textures/skydome.png", roots),
        cfg.background_size, srgb=False))
    faces = [load_texture_image(
        asset_path_search(f"Content/Textures/cubemap_{n}.png", roots),
        cfg.cubemap_size, srgb=False)
        for n in ("X0", "X1", "Y2", "Y3", "Z4", "Z5")]
    b.set_cubemap(np.stack(faces))
    b.set_background_texture(load_texture_image(
        asset_path_search("Content/Textures/background.png", roots),
        cfg.background_size, srgb=False))
    scene, meta = b.build()

    w = World()
    w.main_camera = CameraDesc(
        position=np.array([4.0, -4.0, 2.5], np.float32),
        lookat=np.array([0.0, 0.0, 0.5], np.float32),
    )
    moon = np.array([15.0, -5.0, 20.0], np.float32)
    w.directional_lights = [
        LightDesc(position=moon, type=0,
                  color=np.array([1.0, 0.95, 0.9], np.float32),
                  intensity=3.0, direction=moon / np.linalg.norm(moon))
    ]
    view = build_view_state(w, cfg, light_capacities=(2, 2, 2),
                            animate_point_lights=False)
    return cfg, scene, meta, view


def _render_refcontent():
    import jax.numpy as jnp

    from zeldaengine_tpu.passes import render_frame

    cfg, scene, meta, view = _build_refcontent()
    out = {}
    for name, dv in VIEWS.items():
        v = view._replace(debug_view=jnp.int32(dv))
        img, _ = render_frame(scene, v, meta, cfg)
        out[f"ref_{name}"] = np.asarray(img)
    return out


@pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                    reason="reference content not mounted")
@pytest.mark.parametrize("name", sorted(VIEWS))
def test_golden_reference_content(name, _cache={}):
    if not _cache:
        _cache.update(_render_refcontent())
    path = os.path.join(GOLDEN_DIR, f"ref_{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden ref_{name}.png not generated yet")
    from zeldaengine_tpu.utils.image import read_png

    golden = read_png(path)[..., :3]
    got = _cache[f"ref_{name}"]
    diff = np.abs(got - golden)
    assert (diff > 4 / 255).mean() < 0.01, (
        f"ref_{name}: {(diff > 4 / 255).mean():.4f} of pixels off by >4/255"
    )
    assert np.median(diff) <= 1 / 255


def main():
    # Goldens are generated on CPU (the deterministic reference backend);
    # the axon sitecustomize overrides JAX_PLATFORMS, so force it here.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from zeldaengine_tpu.utils.image import write_png

    renders = _render_all()
    if os.path.isdir(REF_ROOT):
        renders.update(_render_refcontent())
    for name, img in renders.items():
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("wrote", name)


if __name__ == "__main__":
    main()

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


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from zeldaengine_tpu.utils.image import write_png

    for name, img in _render_all().items():
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("wrote", name)


if __name__ == "__main__":
    main()

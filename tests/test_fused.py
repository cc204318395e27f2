"""Fused raster+interpolate kernel vs the jnp gather path (interpret mode).

The fused kernel (ops/rasterize_pallas.rasterize_pairs_fused) must produce
the SAME visibility buffer as rasterize_pairs and the SAME interpolated
surface attributes as passes.gbuffer.surface_attributes — it only changes
WHERE the work happens (in-kernel record fetch + interpolation instead of
an (H, W, 64) XLA gather + interpolation pass).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.rasterize import triangle_setup
from zeldaengine_tpu.ops.rasterize_pallas import (
    build_pairs,
    rasterize_pairs,
    rasterize_pairs_fused,
    ATTR_CH,
)
from zeldaengine_tpu.passes.gbuffer import (
    surface_attributes,
    surface_attributes_from_planes,
)
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene import make_cube, make_plane
from zeldaengine_tpu.scene.scenebuild import SceneBuilder
from zeldaengine_tpu.scene.world import CameraDesc, World


@pytest.fixture(scope="module")
def fused_setup():
    cfg = TEST_CONFIG
    b = SceneBuilder(cfg)
    c = (np.indices((cfg.texture_size,) * 2).sum(0) // 4 % 2).astype(
        np.float32
    )
    img = np.stack([0.2 + 0.5 * c, 0.3 + 0.3 * c, 0.8 - 0.6 * c,
                    np.ones_like(c)], -1)
    mat = b.add_material({0: img})
    b.add_object(make_plane(4.0), b.add_material({}), deferred=True)
    b.add_object(make_cube(1.0, center=(0, 0, 0.5)), mat, deferred=True)
    scene, meta = b.build()
    w = World()
    w.main_camera = CameraDesc(
        position=np.array([3.0, -3.0, 2.5], np.float32),
        lookat=np.array([0.0, 0.0, 0.5], np.float32),
    )
    view = build_view_state(w, cfg, light_capacities=(2, 2, 2))

    world = apply_mat4_point(view.model, scene.pair_pos)
    n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
    import jax

    n_world = jnp.einsum(
        "pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
        precision=jax.lax.Precision.HIGHEST,
    )
    clip = apply_mat4_h(view.view_proj, world)
    setup = triangle_setup(
        clip[scene.tri_vtx], cfg.width, cfg.height,
        two_sided=scene.tri_two_sided,
        valid_mask=scene.tri_valid & scene.tri_deferred,
    )
    return cfg, scene, meta, setup, world, n_world


def _fused_run(cfg, scene, setup, world, n_world):
    from zeldaengine_tpu.passes.frame import _fused_extra

    extra = _fused_extra(scene, setup, world, n_world)
    pairs = build_pairs(setup, cfg.width, cfg.height, cfg.tile_h,
                        cfg.tile_w, expand=cfg.pair_expand, extra=extra)
    return rasterize_pairs_fused(
        pairs, cfg.height, cfg.width, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        sub_rows=cfg.sub_rows, texture_size=cfg.texture_size,
        interpret=True,
    )


def test_fused_matches_plain_visibility(fused_setup):
    cfg, scene, meta, setup, world, n_world = fused_setup
    pairs16 = build_pairs(setup, cfg.width, cfg.height, cfg.tile_h,
                          cfg.tile_w, expand=cfg.pair_expand)
    depth_p, tid_p = rasterize_pairs(
        pairs16, cfg.height, cfg.width, tile_h=cfg.tile_h,
        tile_w=cfg.tile_w, sub_rows=cfg.sub_rows, interpret=True,
    )
    depth_f, tid_f, _ = _fused_run(cfg, scene, setup, world, n_world)
    np.testing.assert_array_equal(np.asarray(tid_f), np.asarray(tid_p))
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_p),
                               atol=1e-7)


def test_fused_attrs_match_gather_path(fused_setup):
    cfg, scene, meta, setup, world, n_world = fused_setup
    depth_f, tid_f, planes = _fused_run(cfg, scene, setup, world, n_world)
    assert planes.shape == (ATTR_CH, cfg.height, cfg.width)

    attrs_j = surface_attributes(scene, setup, tid_f, world, n_world,
                                 cfg, var_ch=meta.tex_channels)
    attrs_f = surface_attributes_from_planes(
        scene, planes, cfg, var_ch=meta.tex_channels)

    cov = np.asarray(attrs_j.covered)
    np.testing.assert_array_equal(np.asarray(attrs_f.covered), cov)
    for name in ("world_pos", "normal", "vertex_color", "base_color",
                 "metallic", "roughness", "ao", "emissive", "mask"):
        a = np.asarray(getattr(attrs_f, name))
        b = np.asarray(getattr(attrs_j, name))
        np.testing.assert_allclose(
            a[cov], b[cov], atol=2e-4, rtol=2e-4,
            err_msg=f"fused attrs mismatch in {name}",
        )
    # Uncovered pixels must be deterministic zeros in the interp outputs
    # (the jnp path zeroes bary weights; the fused kernel never
    # accumulates a record for them).
    assert np.all(np.asarray(attrs_f.world_pos)[~cov] == 0.0)


@pytest.mark.parametrize("tile_h,tile_w", [(8, 64), (16, 32)])
def test_fused_narrow_tiles_match(fused_setup, tile_h, tile_w):
    """Narrow/tall raster tile shapes (tile_w < 128) must reproduce the
    128-wide result exactly — the phase-2 record fetch pads its lane
    index block to the full 128-lane slice vreg and slices back."""
    cfg, scene, meta, setup, world, n_world = fused_setup
    depth_r, tid_r, planes_r = _fused_run(cfg, scene, setup, world,
                                          n_world)
    cfg_n = cfg.replace(tile_h=tile_h, tile_w=tile_w)
    depth_n, tid_n, planes_n = _fused_run(cfg_n, scene, setup, world,
                                          n_world)
    np.testing.assert_allclose(np.asarray(depth_n), np.asarray(depth_r),
                               atol=5e-5)
    same = np.asarray(tid_n) == np.asarray(tid_r)
    assert same.mean() > 0.999  # ties may bin differently at tile seams
    cov = np.asarray(planes_r[0]) > 0.5
    np.testing.assert_allclose(
        np.asarray(planes_n[2:4])[:, cov & same],
        np.asarray(planes_r[2:4])[:, cov & same], atol=2e-4, rtol=2e-4)


def test_fused_elided_records_match_full(fused_setup):
    """Static record elision (need_uv=False + has_combo=False — the
    textureless flat-normal single-combo scene) must produce identical
    depth/tid and identical CONSUMED planes (combo constant, color, pos,
    normal); the uv/lod/derivative planes are zeros by contract."""
    from zeldaengine_tpu.passes.frame import _fused_extra
    from zeldaengine_tpu.ops.rasterize_pallas import fused_extra_width

    cfg, scene, meta, setup, world, n_world = fused_setup
    depth_a, tid_a, planes_a = _fused_run(cfg, scene, setup, world, n_world)

    extra = _fused_extra(scene, setup, world, n_world,
                         need_uv=False, need_combo=False)
    assert extra.shape[1] == fused_extra_width(False, False) == 27
    pairs = build_pairs(setup, cfg.width, cfg.height, cfg.tile_h,
                        cfg.tile_w, expand=cfg.pair_expand, extra=extra)
    depth_b, tid_b, planes_b = rasterize_pairs_fused(
        pairs, cfg.height, cfg.width, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        sub_rows=cfg.sub_rows, texture_size=cfg.texture_size,
        interpret=True, need_uv=False, has_combo=False, combo_const=0.0,
    )
    np.testing.assert_array_equal(np.asarray(tid_b), np.asarray(tid_a))
    np.testing.assert_allclose(np.asarray(depth_b), np.asarray(depth_a),
                               atol=1e-7)
    a = np.asarray(planes_a)
    b = np.asarray(planes_b)
    consumed = [0] + list(range(5, 14))  # coverage, color, pos, normal
    np.testing.assert_allclose(b[consumed], a[consumed], atol=1e-6)
    # combo plane carries the static constant (this fixture scene has 2
    # combos — has_combo=False is only VALID for single-combo scenes,
    # but the kernel contract is checked regardless).
    assert not np.any(b[1])
    zeroed = [2, 3, 4] + list(range(14, 24))
    assert not np.any(b[zeroed])

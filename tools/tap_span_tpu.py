"""Block-locality stats for the texture and environment taps.

Same method as tools/shadow_span_tpu.py, applied to the two remaining
gather-heavy passes (post-vmem-PCF attribution: texture ~21.6 ms,
reflection ~15.7 ms, sky ~7.4 ms at 1080p): captures the real demo
frame's per-pixel gather coordinates on hardware and reports, per
(8, 128)-pixel screen block, whether a windowed VMEM kernel could serve
the tap (uniform layer/level + small y/x footprint) and what fraction
of blocks would need a fallback.

Usage: python tools/tap_span_tpu.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs, rasterize_pairs_fused)
    from zeldaengine_tpu.ops.texture import (
        _mip_offsets_table, cube_direction_to_face_uv, mip_count)
    from zeldaengine_tpu.passes.frame import _fused_extra, _pad_up
    from zeldaengine_tpu.passes.gbuffer import surface_attributes_from_planes
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=1920, height=1080, raster="fused")
    scene, meta, world = build_demo_scene(config, grass=10000, rocks=65)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    ph = _pad_up(config.height, config.tile_h)
    pw = _pad_up(config.width, config.tile_w)

    @jax.jit
    def capture(scene, view):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
        n_world = jnp.einsum(
            "pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
            precision=jax.lax.Precision.HIGHEST)
        clip = apply_mat4_h(view.view_proj, world_p)
        setup = triangle_setup(
            clip[scene.tri_vtx], pw, config.height,
            two_sided=scene.tri_two_sided,
            valid_mask=scene.tri_valid & scene.tri_deferred)
        extra = _fused_extra(scene, setup, world_p, n_world)
        pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, extra=extra,
                            max_pairs=config.max_pairs)
        _, _, planes = rasterize_pairs_fused(
            pairs, ph, pw, tile_h=config.tile_h, tile_w=config.tile_w,
            sub_rows=config.sub_rows, texture_size=config.texture_size)
        planes = planes[:, :config.height, :config.width]
        attrs = surface_attributes_from_planes(scene, planes, config)

        # --- texture tap coordinates (sample_trilinear_pair index math)
        base = config.texture_size
        combo = scene.mat_combined[jnp.maximum(planes[1].astype(jnp.int32),
                                               0)]
        uv = jnp.moveaxis(planes[2:4], 0, -1)
        lod = jnp.clip(planes[4], 0.0, mip_count(base) - 1.0)
        l0 = jnp.floor(lod)
        lvl = l0.astype(jnp.int32)
        size_f = jnp.maximum(jnp.floor(
            jnp.asarray(base, jnp.float32) / jnp.exp2(l0) + 0.5), 1.0)
        offs = _mip_offsets_table(base)[
            jnp.clip(lvl, 0, mip_count(base) - 1)]
        uw = uv[..., 0] - jnp.floor(uv[..., 0])
        vw = uv[..., 1] - jnp.floor(uv[..., 1])
        size_i = size_f.astype(jnp.int32)
        tx = jnp.clip(jnp.floor(uw * size_f - 0.5).astype(jnp.int32),
                      0, size_i - 1) + offs.astype(jnp.int32)
        ty = jnp.clip(jnp.floor(vw * size_f - 0.5).astype(jnp.int32),
                      0, size_i - 1)

        # --- reflection tap coordinates (shading normal incl. normal map)
        v = pbr.normalize(view.camera_pos - attrs.world_pos)
        r = pbr.refract(v, pbr.normalize(attrs.normal), 1.0 / 1.52)
        mips = pbr.reflection_mip_from_roughness(
            attrs.roughness,
            jnp.asarray(view.lights_count[3], jnp.float32))
        face, cuv = cube_direction_to_face_uv(r)
        cb = config.cubemap_size
        cl0 = jnp.floor(jnp.clip(mips, 0.0, mip_count(cb) - 1.0))
        csize = jnp.maximum(jnp.floor(
            jnp.asarray(cb, jnp.float32) / jnp.exp2(cl0) + 0.5), 1.0)
        coffs = _mip_offsets_table(cb)[
            jnp.clip(cl0.astype(jnp.int32), 0, mip_count(cb) - 1)]
        cx = jnp.clip(jnp.floor(cuv[..., 0] * csize - 0.5)
                      .astype(jnp.int32), 0,
                      csize.astype(jnp.int32) - 1) + coffs.astype(jnp.int32)
        cy = jnp.clip(jnp.floor(cuv[..., 1] * csize - 0.5)
                      .astype(jnp.int32), 0, csize.astype(jnp.int32) - 1)

        return (attrs.covered, combo, lvl, ty, tx,
                face, cl0.astype(jnp.int32), cy, cx)

    cov, combo, lvl, ty, tx, face, clvl, cy, cx = map(
        np.asarray, capture(scene, view))
    np.savez("/tmp/tap_spans.npz", cov=cov, combo=combo, lvl=lvl, ty=ty,
             tx=tx, face=face, clvl=clvl, cy=cy, cx=cx)
    print(f"covered: {cov.mean():.3f}")
    for name, lay, yy, xx in (("texture", combo * 64 + lvl, ty, tx),
                              ("cube", face * 16 + clvl, cy, cx)):
        stats(name, cov, lay, yy, xx)


def stats(name, cov, lay, yy, xx, bh=8, bw=128):
    H, W = cov.shape
    hh, ww = H // bh * bh, W // bw * bw

    def blk(a):
        return a[:hh, :ww].reshape(hh // bh, bh, ww // bw, bw)

    c = blk(cov)
    act = c.any((1, 3))
    big = 1 << 20

    def mn(a):
        return np.where(c, blk(a), big).min((1, 3))

    def mx(a):
        return np.where(c, blk(a), -big).max((1, 3))

    uniform = (mn(lay) == mx(lay))[act]
    ys = (mx(yy) - mn(yy) + 1)[act]
    xs = (mx(xx) - mn(xx) + 1)[act]
    print(f"{name}: blocks {act.sum()} | uniform layer+lvl "
          f"{uniform.mean()*100:.1f}%")
    for wr, wc in ((16, 128), (32, 128), (48, 128), (64, 256)):
        fit = (uniform & (ys <= wr - 4) & (xs <= wc - 4)).mean()
        print(f"    window ({wr:2d},{wc:3d}): fit {fit*100:6.2f}% "
              f"(unfit ~{int(round((1-fit)*act.sum()))})")
    q = np.percentile(ys, [50, 90, 99]).astype(int)
    qx = np.percentile(xs, [50, 90, 99]).astype(int)
    print(f"    y span p50/p90/p99 = {q}  x span = {qx}")


if __name__ == "__main__":
    main()

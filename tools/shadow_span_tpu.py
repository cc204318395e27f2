"""TPU-side shadow-footprint capture + block-shape span analysis.

Runs the real fused raster on hardware (seconds, vs ~30 min for the
CPU frame the callback-based tool needs), derives the per-pixel shadow
map coordinates from the interpolated world-pos planes, and reports —
for candidate pixel-block shapes — what fraction of blocks fit a
(win_rows, 128) kernel window including the PCF tap halo. This decides
compute_pcf_vmem's block/window geometry for the demo scene.

Usage: python tools/shadow_span_tpu.py [--grass 10000 --rocks 65]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    ap.add_argument("--save", type=str, default="/tmp/shadow_fyfx.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs, rasterize_pairs_fused)
    from zeldaengine_tpu.ops.shadow import compute_shadow_coord
    from zeldaengine_tpu.passes.frame import _fused_extra, _pad_up
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=1920, height=1080, raster="fused")
    scene, meta, world = build_demo_scene(config, grass=args.grass,
                                          rocks=args.rocks)
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
        covered = planes[0, :config.height, :config.width] > 0.0
        wp = jnp.moveaxis(planes[8:11, :config.height, :config.width],
                          0, -1)
        sc = compute_shadow_coord(view.shadow_space, wp)
        w = sc[..., 3, None]
        scn = sc / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
        dim = config.shadowmap_dim
        in_range = (scn[..., 2] > -1.0) & (scn[..., 2] < 1.0) \
            & (scn[..., 3] > 0.0)
        return (scn[..., 1] * dim, scn[..., 0] * dim, covered & in_range)

    fy, fx, act = map(np.asarray, capture(scene, view))
    np.savez(args.save, fy=fy, fx=fx, act=act)
    print(f"saved {args.save}; active px: {act.mean():.3f}")
    analyze(fy, fx, act, dim=config.shadowmap_dim)


def analyze(fy, fx, act, dim=1024, halo=3.0):
    H, W = fy.shape
    ylo, yhi = np.floor(fy - halo), np.floor(fy + halo)
    xlo, xhi = np.floor(fx - halo), np.floor(fx + halo)

    def block_spans(bh, bw):
        hh, ww = H // bh * bh, W // bw * bw

        def g(a, red):
            a = a[:hh, :ww].reshape(hh // bh, bh, ww // bw, bw)
            return red(red(a, 3), 1)

        m = g(act[:hh, :ww].astype(bool), np.max)
        big = 4.0 * dim
        ymin = g(np.where(act[:hh, :ww], ylo[:hh, :ww], big), np.min)
        ymax = g(np.where(act[:hh, :ww], yhi[:hh, :ww], -big), np.max)
        xmin = g(np.where(act[:hh, :ww], xlo[:hh, :ww], big), np.min)
        xmax = g(np.where(act[:hh, :ww], xhi[:hh, :ww], -big), np.max)
        ys = (ymax - ymin + 1)[m]
        xs = (xmax - xmin + 1)[m]
        inb = ((ymin >= 0) & (ymax < dim) & (xmin >= 0) & (xmax < dim))[m]
        return ys, xs, inb, m.size

    for bh, bw in ((8, 128), (16, 64), (32, 32), (16, 128), (32, 128),
                   (8, 256)):
        ys, xs, inb, nb = block_spans(bh, bw)
        print(f"block ({bh:2d},{bw:3d}): active {len(ys)}/{nb} | "
              f"y p50/p90/p99/p99.9 = "
              f"{np.percentile(ys, [50, 90, 99, 99.9]).astype(int)} | "
              f"x p99 = {int(np.percentile(xs, 99))}")
        for wr, wc in ((24, 128), (32, 128), (48, 128), (64, 128),
                       (32, 256)):
            fit = float(((ys <= wr) & (xs <= wc) & inb).mean())
            unfit_blocks = int(round((1 - fit) * len(ys)))
            print(f"    window ({wr},{wc}): fit {fit*100:6.2f}%  "
                  f"unfit blocks ~{unfit_blocks}")


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "--analyze":
        d = np.load(_s.argv[2])
        analyze(d["fy"], d["fx"], d["act"])
    else:
        main()

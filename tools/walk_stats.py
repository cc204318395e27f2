"""Phase-1 walk roofline: count the fused kernel's visits EXACTLY from
build_pairs outputs (slices per range x y-window sub-blocks, replicating
_make_walk/_run_raster_walk_accwide's trip counts), convert to VPU
element-ops, and compare against a measured same-op-mix Pallas FMA
micro-kernel (the empirical speed of light for this chip).

This is the quantitative half of the VERDICT r4 #1 roofline ask: if
visits x per-visit vector work already saturates the measured VPU rate,
the walk time is the floor for THIS algorithmic shape and further gains
must come from fewer visits (fewer pairs / tighter windows), not from
kernel tuning.

Usage: python tools/walk_stats.py [--scene demo|c4] [--grass 10000]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

# Vector ops per (p_sub, 128) candidate evaluation in the accwide body
# (_run_raster_walk_accwide.eval_cand + sub_work, winner mode): 3 forms
# x 2 FMA + 3-FMA depth + 2 esum adds + 2 emin mins + 4 compares +
# 4 ands + 1 where(inside) + 1 cur-load-compare + 2 winner selects.
OPS_PER_EVAL = 25


def vpu_micro(n_ops: int = 64, steps: int = 2048, reps: int = 5,
              chains: int = 8):
    """Measured element-ops/s for an FMA Pallas kernel at the walk's
    native (256, 128) f32 shape — the empirical VPU peak for the
    walk's op mix (FMAs with no cross-lane traffic).

    ``chains`` independent accumulators interleave so the measurement
    is THROUGHPUT-bound, not FMA-latency-bound: a single dependency
    chain measured 139 Gops/s while the real walk (whose ~25 ops per
    candidate include independent edge forms) achieves 1.86 Tops/s —
    the single-chain number is the pipeline's latency floor, not its
    speed of light. The walk body has ~3-way ILP (3 edge forms), so
    the honest bracket is [chains=3, chains=8]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        xs = [a * (1.0 + 1e-6 * k) + 0.3 for k in range(chains)]
        # n_ops FMAs per element per chain; chains are independent so
        # the VPU can pipeline them.
        for _ in range(n_ops - 1):
            xs = [x * 1.000001 + 0.3 for x in xs]
        o = xs[0]
        for x in xs[1:]:
            o = o + x
        o_ref[...] = o

    a = jnp.ones((steps * 256, 128), jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((256, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * 256, 128), jnp.float32),
    )
    jf = jax.jit(lambda a: f(a))
    jf(a).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jf(a).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    total_ops = steps * 256 * 128 * n_ops * chains
    return total_ops / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=str, default="demo",
                    choices=("demo", "c4"))
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import (apply_mat4_h,
                                                 apply_mat4_point)
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import (build_pairs,
                                                      compact_setup,
                                                      fused_extra_width)
    from zeldaengine_tpu.passes.frame import (_fused_extra, _fused_flags,
                                              _pad_up)
    from zeldaengine_tpu.passes.view import build_view_state

    if args.scene == "c4":
        from _scenes import build_c4_scene, c4_config

        config = c4_config(EngineConfig)
        scene, meta, world = build_c4_scene(config)
    else:
        from zeldaengine_tpu.scene.demo import build_demo_scene

        config = EngineConfig(width=1920, height=1080, tile_h=64,
                              tile_w=32, max_pairs=384 * 1024,
                              max_pairs_shadow=256 * 1024)
        scene, meta, world = build_demo_scene(config, grass=args.grass,
                                              rocks=args.rocks)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    ph = _pad_up(config.height, config.tile_h)
    pw = _pad_up(config.width, max(config.tile_w, 128))

    @jax.jit
    def pairs_fn(scene, view):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
        n_world = jnp.einsum("pij,pj->pi",
                             scene.rot_table[scene.pair_rot], n1)
        clip = apply_mat4_h(view.view_proj, world_p)
        tri_valid = scene.tri_valid & scene.tri_deferred
        if args.scene == "c4":
            from zeldaengine_tpu.ops.culling import (expand_meshlet_mask,
                                                     meshlet_cull)

            vp_model = jnp.matmul(view.view_proj, view.model)
            vis = meshlet_cull(scene.meshlet_records, vp_model,
                               view.camera_pos, model=view.model)
            tvis = expand_meshlet_mask(vis,
                                       jnp.maximum(scene.tri_meshlet, 0))
            tri_valid = scene.tri_valid & (tvis | (scene.tri_meshlet < 0))
        setup = triangle_setup(clip[scene.tri_vtx], pw, config.height,
                               two_sided=scene.tri_two_sided,
                               valid_mask=tri_valid)
        setup, _, cidx, _ = compact_setup(
            setup, config.compact_tris or setup.edge.shape[0],
            center_cull=config.subpixel_cull)
        f_uv, f_combo, _c = _fused_flags(meta)
        extra = _fused_extra(scene, setup, world_p, n_world,
                             tri_idx=cidx, need_uv=f_uv,
                             need_combo=f_combo)
        return build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                           expand=config.pair_expand, extra=extra,
                           max_pairs=config.max_pairs,
                           sort_z=config.raster_zsort,
                           ysort_sub_rows=(config.sub_rows
                                           if config.raster_ysort
                                           else None),
                           center_cull=config.subpixel_cull)

    pairs = jax.device_get(pairs_fn(scene, view))
    f_uv, f_combo, _c = _fused_flags(meta)
    n_extra = fused_extra_width(f_uv, f_combo)
    has_z = 1 if config.raster_zsort else 0
    y_row = 12 + n_extra + has_z  # frame.py:258-260

    records = pairs.records  # (n_slices, rec_rows, 128)
    starts = np.asarray(pairs.starts)
    ends = np.asarray(pairs.ends)
    sstarts = np.asarray(pairs.sstarts)
    sends = np.asarray(pairs.sends)
    gb = np.asarray(pairs.gbounds)

    tile_h, tile_w = config.tile_h, config.tile_w
    sub_rows = config.sub_rows
    n_sub = tile_h // sub_rows
    p_sub = sub_rows * tile_w
    cols = 128 // tile_w
    n_tx = pw // tile_w
    n_ty = ph // tile_h
    n_bx = pw // 128

    ys = records[:, y_row, :]  # packed ysub1*4096 + ysub0, absolute
    y1s = np.floor(ys / 4096.0)
    y0s = ys - y1s * 4096.0

    def window_visits(lo, hi, base_sub, mult=1):
        """Visits for one range walked from a block at sub-row base_sub
        (sub_work trip count with the y-window skip), x mult columns."""
        if hi <= lo:
            return 0, 0
        s0, s1 = lo // 128, -(-hi // 128)
        v = 0
        for s in range(s0, s1):
            lanes = np.arange(s * 128, (s + 1) * 128)
            ok = (lanes >= lo) & (lanes < hi)
            if not ok.any():
                continue
            lo_sb = int(np.min(np.where(ok, y0s[s], 4095.0))) - base_sub
            hi_sb = int(np.max(np.where(ok, y1s[s], 0.0))) - base_sub
            lo_sb = max(lo_sb, 0)
            hi_sb = min(hi_sb, n_sub - 1)
            if hi_sb >= lo_sb:
                v += (hi_sb - lo_sb + 1)
        return (s1 - s0), v * mult

    slices_total = 0
    visits = 0
    # Dense per-tile (column sub-tile) ranges: tile t=(ty, tx) is walked
    # by block (ty, tx // cols) at base_sub = ty * n_sub.
    for t in range(n_ty * n_tx):
        ty = t // n_tx
        s, v = window_visits(int(starts[t]), int(ends[t]), ty * n_sub)
        slices_total += s
        visits += v
    # Supertile ranges: each block walks its supertile's range against
    # ALL cols columns.
    from zeldaengine_tpu.ops.rasterize_pallas import _super_h, _super_w

    sw = _super_w(tile_w)
    sh = _super_h(tile_h)
    n_sx = -(-n_tx // sw)
    n_sy = -(-n_ty // sh)
    for by in range(n_ty):
        for bx in range(n_bx):
            sx = (bx * cols) // sw
            sy = by // sh
            si = sy * n_sx + sx
            s, v = window_visits(int(sstarts[si]), int(sends[si]),
                                 by * n_sub, mult=cols)
            slices_total += s
            visits += v
    # Global bucket: every block walks it against all columns.
    for by in range(n_ty):
        for bx in range(n_bx):
            s, v = window_visits(int(gb[0]), int(gb[1]), by * n_sub,
                                 mult=cols)
            slices_total += s
            visits += v

    elem_ops = visits * p_sub * 128 * OPS_PER_EVAL
    peak1 = vpu_micro(chains=1)   # latency floor (serial chain)
    peak3 = vpu_micro(chains=3)   # walk's own ILP (3 edge forms)
    peak = vpu_micro(chains=8)    # throughput ceiling
    floor_ms = elem_ops / peak * 1e3
    floor3_ms = elem_ops / peak3 * 1e3
    n_pairs = int((ends - starts).sum() + (sends - sstarts).sum()
                  + (gb[1] - gb[0]))
    print(json.dumps({
        "scene": args.scene,
        "live_pairs": n_pairs,
        "tile": [tile_h, tile_w],
        "slices_walked": int(slices_total),
        "sub_block_visits": int(visits),
        "p_sub": p_sub,
        "ops_per_eval": OPS_PER_EVAL,
        "elem_ops_phase1": int(elem_ops),
        "vpu_ops_per_s_chain1": peak1,
        "vpu_ops_per_s_chain3": peak3,
        "vpu_ops_per_s_chain8": peak,
        "phase1_floor_ms_ilp3": round(floor3_ms, 2),
        "phase1_vpu_floor_ms": round(floor_ms, 2),
        "dma_bytes": int(slices_total * records.shape[1] * 128 * 4),
    }))


if __name__ == "__main__":
    main()

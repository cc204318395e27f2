"""Floor decomposition: steady-state times for the frame's serial stages.

The whole-frame ablation ledger (BASELINE.md) attributes PCF/texture/
lighting/sky, but the remaining "bare floor" (~56 ms with everything
ablated) spans vertex+prep+fused kernel+pack+compose. This tool times
the stages in isolation with the same in-jit scan protocol:

  prep    vertex transform + triangle_setup + fused extra + build_pairs
  kernel  rasterize_pairs_fused over FIXED pairs (prep hoisted out of the
          scan as loop-invariant; the carry perturbs init_depth so the
          kernel itself cannot hoist)
  shprep  shadow-pass triangle_setup + build_pairs
  shkern  depth-only pair kernel over fixed shadow pairs

Usage: python tools/stage_times.py --stages prep,kernel,shprep,shkern
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def steady_ms(make_fn, frames=6, reps=4):
    """make_fn(n) -> zero-arg jitted callable returning a scalar."""
    import jax  # noqa: F401

    def run(n):
        f = make_fn(n)
        t0 = time.time()
        float(f())
        comp = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f())
            ts.append(time.time() - t0)
        return float(np.median(ts)), comp

    (t1, c1), (t2, c2) = run(1), run(max(frames, 2))
    return (t2 - t1) / (max(frames, 2) - 1) * 1000.0, c1 + c2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=str, default="prep,kernel")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    ap.add_argument("--winner", type=str, default="accwide",
                    help="walk structure; accwide is the engine default")
    ap.add_argument("--scene", type=str, default="demo",
                    choices=("demo", "c4"))
    ap.add_argument("--compact", type=int, default=0,
                    help="compact_tris capacity (0 = off)")
    ap.add_argument("--cap_pairs", type=int, default=0)
    ap.add_argument("--tile_h", type=int, default=0)
    ap.add_argument("--tile_w", type=int, default=0)
    ap.add_argument("--sub_rows", type=int, default=0)
    ap.add_argument("--zsort", type=int, default=1,
                    help="front-to-back pair ordering (build_pairs sort_z)")
    ap.add_argument("--eo", type=int, default=0,
                    help="occlusion early-out in the pair walks")
    ap.add_argument("--ysort", type=int, default=1,
                    help="y-bucketed bins + sub-block window skip")
    ap.add_argument("--gchunks", type=int, default=1,
                    help="build_pairs gather_chunks (0=auto, 1=plain)")
    ap.add_argument("--gpack", type=int, default=1,
                    help="build_pairs gather_pack (0=auto, 1=plain)")
    ap.add_argument("--walk_step", type=int, default=0,
                    help="override rasterize_pallas.WALK_STEP (0=keep)")
    ap.add_argument("--fetch_gate", type=int, default=-1,
                    help="override rasterize_pallas.FETCH_GATE (-1=keep)")
    ap.add_argument("--center_cull", type=int, default=-1,
                    help="override rasterize_pallas.CENTER_CULL (-1=keep)")
    args = ap.parse_args()

    import zeldaengine_tpu.ops.rasterize_pallas as _rp

    if args.walk_step:
        _rp.WALK_STEP = args.walk_step
    if args.fetch_gate >= 0:
        _rp.FETCH_GATE = bool(args.fetch_gate)
    if args.center_cull >= 0:
        _rp.CENTER_CULL = bool(args.center_cull)

    import jax
    import jax.numpy as jnp

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
        rasterize_pairs_fused,
    )
    from zeldaengine_tpu.passes.frame import _fused_extra, _pad_up
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    if args.scene == "c4":
        from _scenes import build_c4_scene, c4_config

        config = c4_config(EngineConfig)
        scene, meta, world = build_c4_scene(config)
    else:
        config = EngineConfig(width=1920, height=1080)
        t0 = time.time()
        scene, meta, world = build_demo_scene(config, grass=args.grass,
                                              rocks=args.rocks)
        print(f"# scene build {time.time()-t0:.1f}s "
              f"tris={meta.num_triangles}", flush=True)
    if args.compact:
        config = config.replace(compact_tris=args.compact)
    if args.cap_pairs:
        config = config.replace(max_pairs=args.cap_pairs,
                                max_pairs_shadow=args.cap_pairs)
    if args.tile_h:
        config = config.replace(tile_h=args.tile_h)
    if args.tile_w:
        config = config.replace(tile_w=args.tile_w)
    if args.sub_rows:
        config = config.replace(sub_rows=args.sub_rows)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    ph = _pad_up(config.height, config.tile_h)
    pw = _pad_up(config.width, max(config.tile_w, 128))

    def vertex_setup(scene, view, dt):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
        n_world = jnp.einsum(
            "pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
            precision=jax.lax.Precision.HIGHEST,
        )
        clip = apply_mat4_h(view.view_proj, world_p)
        tri_valid = scene.tri_valid & scene.tri_deferred
        if args.scene == "c4":
            from zeldaengine_tpu.ops.culling import (
                expand_meshlet_mask, meshlet_cull)

            vp_model = jnp.matmul(view.view_proj, view.model)
            vis = meshlet_cull(scene.meshlet_records, vp_model,
                               view.camera_pos, model=view.model)
            tvis = expand_meshlet_mask(
                vis, jnp.maximum(scene.tri_meshlet, 0))
            tri_valid = scene.tri_valid & (
                tvis | (scene.tri_meshlet < 0))
        # dt folds the scan carry in so nothing hoists.
        setup = triangle_setup(
            clip[scene.tri_vtx] + dt, pw, config.height,
            two_sided=scene.tri_two_sided,
            valid_mask=tri_valid,
        )
        return setup, world_p, n_world

    def maybe_compact(setup, extra):
        if not config.compact_tris:
            return setup, extra
        from zeldaengine_tpu.ops.rasterize_pallas import compact_setup

        s2, e2, _, _ = compact_setup(setup, config.compact_tris,
                                     extra=extra,
                                     center_cull=config.subpixel_cull)
        return s2, e2

    def compact_then_extra(scene, setup, world_p, n_world):
        # Mirrors frame.py: compact FIRST, then build the 34-col payload
        # for the cap rows only (round-4 prep fix).
        if not config.compact_tris:
            return setup, _fused_extra(scene, setup, world_p, n_world)
        from zeldaengine_tpu.ops.rasterize_pallas import compact_setup

        s2, _, idx, _ = compact_setup(setup, config.compact_tris,
                                      center_cull=config.subpixel_cull)
        return s2, _fused_extra(scene, setup, world_p, n_world,
                                tri_idx=idx)

    def prep_fn(scene, view, dt):
        setup, world_p, n_world = vertex_setup(scene, view, dt)
        setup, extra = compact_then_extra(scene, setup, world_p, n_world)
        pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, extra=extra,
                            max_pairs=config.max_pairs,
                            sort_z=bool(args.zsort),
                            ysort_sub_rows=(config.sub_rows
                                            if args.ysort else None),
                            gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
        return (jnp.sum(pairs.records[:, 0, :]) + jnp.sum(pairs.starts)
                + jnp.sum(pairs.pair_tri))

    def sh_prep_fn(scene, view, dt):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        clip_sh = apply_mat4_h(view.shadow_space, world_p)
        setup = triangle_setup(
            clip_sh[scene.tri_vtx] + dt, config.shadowmap_dim,
            config.shadowmap_dim, two_sided=True,
            valid_mask=scene.tri_valid,
            depth_bias=(config.shadow_bias_constant,
                        config.shadow_bias_slope),
        )
        setup, _ = maybe_compact(setup, None)
        pairs = build_pairs(setup, config.shadowmap_dim,
                            config.shadowmap_dim, config.tile_h,
                            config.tile_w,
                            expand=config.pair_expand_shadow,
                            max_pairs=config.max_pairs_shadow,
                            ysort_sub_rows=(config.sub_rows
                                            if args.ysort else None),
                            gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
        return (jnp.sum(pairs.records[:, 0, :]) + jnp.sum(pairs.starts)
                + jnp.sum(pairs.pair_tri))

    def prep_full_fn(scene, view, dt):
        # prep with the records stream FULLY consumed (sum over all
        # rows/slices). The plain prep stage's records[:, 0, :] slice
        # lets XLA narrow the record gather to ~1 channel, so a record-
        # layout A/B is invisible there; this stage forces all rec_rows
        # channels through the gather. (The layout transpose itself is
        # algebraically removed under a full sum — this isolates the
        # GATHER, not the transpose.)
        setup, world_p, n_world = vertex_setup(scene, view, dt)
        setup, extra = compact_then_extra(scene, setup, world_p, n_world)
        pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, extra=extra,
                            max_pairs=config.max_pairs,
                            sort_z=bool(args.zsort),
                            ysort_sub_rows=(config.sub_rows
                                            if args.ysort else None),
                            gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
        return (jnp.sum(pairs.records) * 1e-6 + jnp.sum(pairs.starts)
                + jnp.sum(pairs.pair_tri))

    def prep_ng_fn(scene, view, dt):
        # prep with the records sum dropped: XLA DCEs the pair-ordered
        # record gather, isolating its cost as (prep - prep_ng).
        setup, world_p, n_world = vertex_setup(scene, view, dt)
        setup, extra = compact_then_extra(scene, setup, world_p, n_world)
        pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, extra=extra,
                            max_pairs=config.max_pairs,
                            sort_z=bool(args.zsort),
                            ysort_sub_rows=(config.sub_rows
                                            if args.ysort else None),
                            gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
        return jnp.sum(pairs.starts) + jnp.sum(pairs.pair_tri)

    def vtx_fn(scene, view, dt):
        # vertex transform + cull + triangle_setup only.
        setup, world_p, n_world = vertex_setup(scene, view, dt)
        return (jnp.sum(setup.edge[:, 0, 0]) + jnp.sum(world_p[:, 0])
                + jnp.sum(n_world[:, 0]))

    def cext_fn(scene, view, dt):
        # vertex + compact + fused-extra build (prep minus build_pairs).
        setup, world_p, n_world = vertex_setup(scene, view, dt)
        setup, extra = compact_then_extra(scene, setup, world_p, n_world)
        return (jnp.sum(setup.edge[:, 0, 0]) + jnp.sum(extra[:, 0]))

    def shsetup_fn(scene, view, dt):
        # shadow vertex + setup + compact (shprep minus build_pairs).
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        clip_sh = apply_mat4_h(view.shadow_space, world_p)
        setup = triangle_setup(
            clip_sh[scene.tri_vtx] + dt, config.shadowmap_dim,
            config.shadowmap_dim, two_sided=True,
            valid_mask=scene.tri_valid,
            depth_bias=(config.shadow_bias_constant,
                        config.shadow_bias_slope),
        )
        setup, _ = maybe_compact(setup, None)
        return jnp.sum(setup.edge[:, 0, 0])

    def make_scan(body):
        def make(n):
            @jax.jit
            def f(scene, view):
                def sbody(c, i):
                    return c + body(scene, view, c * 1e-30) * 1e-12, 0.0

                c, _ = jax.lax.scan(sbody, jnp.float32(0), jnp.arange(n))
                return c

            return lambda: f(scene, view)

        return make

    stages = {}

    for name in args.stages.split(","):
        if name == "prep":
            ms, comp = steady_ms(make_scan(prep_fn), frames=args.frames)
        elif name == "shprep":
            ms, comp = steady_ms(make_scan(sh_prep_fn), frames=args.frames)
        elif name == "prep_full":
            ms, comp = steady_ms(make_scan(prep_full_fn),
                                 frames=args.frames)
        elif name == "prep_ng":
            ms, comp = steady_ms(make_scan(prep_ng_fn), frames=args.frames)
        elif name == "vtx":
            ms, comp = steady_ms(make_scan(vtx_fn), frames=args.frames)
        elif name == "cext":
            ms, comp = steady_ms(make_scan(cext_fn), frames=args.frames)
        elif name == "shsetup":
            ms, comp = steady_ms(make_scan(shsetup_fn), frames=args.frames)
        elif name == "gbuf":
            # vertex + prep + fused kernel + surface attributes + pack:
            # everything bare-frame up to the GBuffer (isolates the
            # attrs/pack/tid chain the kernel stages DCE).
            def body(scene, view, dt, _=None):
                from zeldaengine_tpu.passes.frame import (
                    _fused_flags, _raster_vis_fused)
                from zeldaengine_tpu.passes.gbuffer import (
                    pack_gbuffer, surface_attributes_from_planes)

                setup, world_p, n_world = vertex_setup(scene, view, dt)
                f_uv, f_combo, _c = _fused_flags(meta)
                from zeldaengine_tpu.passes.frame import _fused_extra
                depth, tid, planes, ovf = _raster_vis_fused(
                    setup,
                    lambda cidx: _fused_extra(scene, setup, world_p,
                                              n_world, tri_idx=cidx,
                                              need_uv=f_uv,
                                              need_combo=f_combo),
                    config.height, config.width, config, meta=meta)
                attrs = surface_attributes_from_planes(
                    scene, planes, config, var_ch=meta.tex_channels)
                gbuf = pack_gbuffer(attrs, depth)
                return (jnp.sum(gbuf.gbuffer_a) + jnp.sum(gbuf.gbuffer_d)
                        + jnp.sum(gbuf.depth) + jnp.sum(tid)
                        + jnp.sum(gbuf.scene_color))

            ms, comp = steady_ms(make_scan(body), frames=args.frames)
        elif name == "gbuf_notid":
            def body(scene, view, dt, _=None):
                from zeldaengine_tpu.passes.frame import (
                    _fused_flags, _raster_vis_fused, _fused_extra)
                from zeldaengine_tpu.passes.gbuffer import (
                    pack_gbuffer, surface_attributes_from_planes)

                setup, world_p, n_world = vertex_setup(scene, view, dt)
                f_uv, f_combo, _c = _fused_flags(meta)
                depth, tid, planes, ovf = _raster_vis_fused(
                    setup,
                    lambda cidx: _fused_extra(scene, setup, world_p,
                                              n_world, tri_idx=cidx,
                                              need_uv=f_uv,
                                              need_combo=f_combo),
                    config.height, config.width, config, meta=meta)
                attrs = surface_attributes_from_planes(
                    scene, planes, config, var_ch=meta.tex_channels)
                gbuf = pack_gbuffer(attrs, depth)
                return (jnp.sum(gbuf.gbuffer_a) + jnp.sum(gbuf.gbuffer_d)
                        + jnp.sum(gbuf.depth)
                        + jnp.sum(gbuf.scene_color))

            ms, comp = steady_ms(make_scan(body), frames=args.frames)
        elif name == "kernel":
            def body(scene, view, dt, _=None):
                setup, world_p, n_world = vertex_setup(scene, view, 0.0)
                setup, extra = compact_then_extra(scene, setup, world_p,
                                                  n_world)
                pairs = build_pairs(setup, pw, ph, config.tile_h,
                                    config.tile_w,
                                    expand=config.pair_expand, extra=extra,
                                    max_pairs=config.max_pairs,
                                    sort_z=bool(args.zsort),
                                    ysort_sub_rows=(config.sub_rows
                                                    if args.ysort
                                                    else None),
                                    gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
                # pairs are loop-invariant (hoisted); init_depth carries dt
                init = jnp.ones((ph, pw), jnp.float32) + dt
                from zeldaengine_tpu.ops.rasterize_pallas import FUSED_EXTRA
                hz = 1 if args.zsort else 0
                d, tid, planes = rasterize_pairs_fused(
                    pairs, ph, pw, init_depth=init,
                    tile_h=config.tile_h, tile_w=config.tile_w,
                    sub_rows=config.sub_rows,
                    texture_size=config.texture_size,
                    winner=args.winner,
                    early_out=bool(args.eo),
                    z_row=(12 + FUSED_EXTRA) if args.zsort else -1,
                    y_row=((12 + FUSED_EXTRA + hz) if args.ysort else -1),
                )
                return jnp.sum(d) + jnp.sum(planes[1])

            ms, comp = steady_ms(make_scan(body), frames=args.frames)
        elif name in ("kernel1", "kernel1w", "kernel1d"):
            # Phase-1-only probes. "kernel1w": winner tracking, raw pair
            # ids (the original "kernel1" summed MAPPED tids, forcing a
            # 2M-index pair_tri gather the fused probe DCEs — it measured
            # HIGHER than the full fused kernel). "kernel1": same records
            # width as the fused kernel (extra=34) so DMA volume matches
            # and kernel - kernel1 = phase-2 + epilogue exactly.
            # "kernel1d": depth-only (no winner tracking).
            def body(scene, view, dt, _=None, name=name):
                setup, world_p, n_world = vertex_setup(scene, view, 0.0)
                extra = (_fused_extra(scene, setup, world_p, n_world)
                         if name == "kernel1" else None)
                pairs = build_pairs(setup, pw, ph, config.tile_h,
                                    config.tile_w,
                                    expand=config.pair_expand, extra=extra,
                                    sort_z=bool(args.zsort),
                                    ysort_sub_rows=(config.sub_rows
                                                    if args.ysort
                                                    else None),
                                    gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
                init = jnp.ones((ph, pw), jnp.float32) + dt
                hz = 1 if args.zsort else 0
                ne = 34 if name == "kernel1" else 0
                yr = (12 + ne + hz) if args.ysort else -1
                if name == "kernel1d":
                    d = rasterize_pairs(
                        pairs, ph, pw, init_depth=init,
                        tile_h=config.tile_h, tile_w=config.tile_w,
                        sub_rows=config.sub_rows, depth_only=True,
                        y_row=yr,
                    )
                    return jnp.sum(d)
                d, tid_pair = rasterize_pairs(
                    pairs, ph, pw, init_depth=init,
                    tile_h=config.tile_h, tile_w=config.tile_w,
                    sub_rows=config.sub_rows, map_tid=False,
                    winner=args.winner, y_row=yr,
                )
                return jnp.sum(d) + jnp.sum(tid_pair)

            ms, comp = steady_ms(make_scan(body), frames=args.frames)
        elif name == "shkern":
            def body(scene, view, dt, _=None):
                world_p = apply_mat4_point(view.model, scene.pair_pos)
                clip_sh = apply_mat4_h(view.shadow_space, world_p)
                setup = triangle_setup(
                    clip_sh[scene.tri_vtx], config.shadowmap_dim,
                    config.shadowmap_dim, two_sided=True,
                    valid_mask=scene.tri_valid,
                    depth_bias=(config.shadow_bias_constant,
                                config.shadow_bias_slope),
                )
                pairs = build_pairs(setup, config.shadowmap_dim,
                                    config.shadowmap_dim, config.tile_h,
                                    config.tile_w,
                                    expand=config.pair_expand_shadow,
                                    sort_z=bool(args.zsort),
                                    ysort_sub_rows=(config.sub_rows
                                                    if args.ysort
                                                    else None),
                                    gather_chunks=args.gchunks,
                            gather_pack=args.gpack,
                            center_cull=config.subpixel_cull)
                init = (jnp.ones((config.shadowmap_dim,
                                  config.shadowmap_dim), jnp.float32)
                        + dt)
                hz = 1 if args.zsort else 0
                d = rasterize_pairs(
                    pairs, config.shadowmap_dim, config.shadowmap_dim,
                    init_depth=init, tile_h=config.tile_h,
                    tile_w=config.tile_w, sub_rows=config.sub_rows,
                    depth_only=True, winner=args.winner,
                    early_out=bool(args.eo),
                    z_row=12 if args.zsort else -1,
                    y_row=(12 + hz) if args.ysort else -1,
                )
                return jnp.sum(d)

            ms, comp = steady_ms(make_scan(body), frames=args.frames)
        else:
            print(json.dumps({"stage": name, "error": "unknown"}))
            continue
        stages[name] = ms
        print(json.dumps({"stage": name, "ms": round(ms, 1),
                          "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()

"""Size the meshlet-granularity occlusion-cull win at config-4 scale
BEFORE building the mechanism (VERDICT r4 #2: 'cull at meshlet
granularity before pair expansion').

Protocol: render the c4 depth buffer once (fused path, exactly the
frame's own raster), max-pool it into a coarse hi-z grid, then test
every camera-visible meshlet's bounding sphere conservatively (its
world AABB's 8 projected corners -> screen bbox + min NDC depth; the
AABB contains the sphere, so bbox/zmin are conservative). A meshlet is
'occluded' iff its conservative zmin is strictly behind the MAX hi-z
depth over every cell its bbox touches — i.e. even its nearest point
loses the depth test everywhere. Reports how many live triangles (and
thus pair-gather needles, ~1 pair/tri at meshlet scale) such a cull
would remove — the record gather is needle-count bound at ~70 ns
(BASELINE.md round 4), so this number IS the expected prep win.

Usage: python tools/c4_occl_probe.py [--cell 16]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", type=int, default=16)
    ap.add_argument("--dilate", type=int, default=1,
                    help="extra hi-z cells around the bbox (safety)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _scenes import build_c4_scene, c4_config
    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import (apply_mat4_h,
                                                 apply_mat4_point)
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.culling import (expand_meshlet_mask,
                                             meshlet_cull)
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import _covers_pixel_center
    from zeldaengine_tpu.passes.frame import (_fused_extra, _fused_flags,
                                              _pad_up, _raster_vis_fused)
    from zeldaengine_tpu.passes.view import build_view_state

    config = c4_config(EngineConfig)
    scene, meta, world = build_c4_scene(config)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    pw = _pad_up(config.width, max(config.tile_w, 128))

    @jax.jit
    def depth_and_live(scene, view):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
        n_world = jnp.einsum("pij,pj->pi",
                             scene.rot_table[scene.pair_rot], n1)
        clip = apply_mat4_h(view.view_proj, world_p)
        vp_model = jnp.matmul(view.view_proj, view.model)
        vis = meshlet_cull(scene.meshlet_records, vp_model,
                           view.camera_pos, model=view.model)
        tvis = expand_meshlet_mask(vis, jnp.maximum(scene.tri_meshlet, 0))
        tri_valid = scene.tri_valid & (tvis | (scene.tri_meshlet < 0))
        setup = triangle_setup(clip[scene.tri_vtx], pw, config.height,
                               two_sided=scene.tri_two_sided,
                               valid_mask=tri_valid)
        f_uv, f_combo, _c = _fused_flags(meta)
        depth, tid, planes, ovf = _raster_vis_fused(
            setup,
            lambda cidx: _fused_extra(scene, setup, world_p, n_world,
                                      tri_idx=cidx, need_uv=f_uv,
                                      need_combo=f_combo),
            config.height, config.width, config, meta=meta)
        area = ((setup.bbox[:, 2] - setup.bbox[:, 0])
                * (setup.bbox[:, 3] - setup.bbox[:, 1]))
        live = setup.valid & (area > 0) & _covers_pixel_center(setup.bbox)
        return depth, live, vis

    depth, live, vis = jax.device_get(depth_and_live(scene, view))
    H, W = config.height, config.width
    depth = depth[:H, :W]

    # hi-z: per-cell MAX depth (conservative: a sphere must beat the
    # farthest pixel of every covered cell to be declared occluded).
    c = args.cell
    hz = depth.reshape(H // c, c, W // c, c).max(axis=(1, 3))

    recs = np.asarray(scene.meshlet_records)
    model = np.asarray(view.model)
    vp = np.asarray(view.view_proj)
    centers = recs[:, 4:7] @ model[:3, :3].T + model[:3, 3]
    # conservative world radius under model scale (max column norm)
    scale = np.linalg.norm(model[:3, :3], axis=0).max()
    radii = recs[:, 7] * scale

    # 8 AABB corners of each sphere -> clip -> conservative bbox + zmin
    offs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], np.float32)  # (8, 3)
    corners = centers[:, None, :] + radii[:, None, None] * offs  # (M,8,3)
    hom = np.concatenate([corners, np.ones_like(corners[..., :1])], -1)
    clip = hom @ vp.T  # (M, 8, 4)
    w = clip[..., 3]
    # any corner behind/near the eye plane -> never cull (unbounded proj)
    safe = (w > 1e-3).all(axis=1)
    w = np.maximum(w, 1e-3)
    ndc = clip[..., :3] / w[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * W
    py = (ndc[..., 1] * 0.5 + 0.5) * H
    zmin = ndc[..., 2].min(axis=1)
    x0 = np.clip(np.floor(px.min(1) / c).astype(int) - args.dilate, 0,
                 W // c - 1)
    x1 = np.clip(np.ceil(px.max(1) / c).astype(int) + args.dilate, 1,
                 W // c)
    y0 = np.clip(np.floor(py.min(1) / c).astype(int) - args.dilate, 0,
                 H // c - 1)
    y1 = np.clip(np.ceil(py.max(1) / c).astype(int) + args.dilate, 1,
                 H // c)

    m = recs.shape[0]
    occl = np.zeros(m, bool)
    for i in range(m):
        if not (vis[i] and safe[i]):
            continue
        cell_max = hz[y0[i]:y1[i], x0[i]:x1[i]].max()
        occl[i] = zmin[i] > cell_max

    tri_m = np.asarray(scene.tri_meshlet)
    live = np.asarray(live)
    live_m = tri_m[live & (tri_m >= 0)]
    live_per = np.bincount(live_m, minlength=m)
    live_total = int(live_per.sum())
    live_occl = int(live_per[occl].sum())
    print(json.dumps({
        "cell": c,
        "meshlets": int(m),
        "visible_after_cone": int(vis.sum()),
        "occluded": int(occl.sum()),
        "live_tris_total": live_total,
        "live_tris_in_occluded": live_occl,
        "live_frac_removed": round(live_occl / max(live_total, 1), 4),
    }))


if __name__ == "__main__":
    main()

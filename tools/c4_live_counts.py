"""Measure LIVE pair/triangle counts at config-4 shapes.

The round-4 gather finding (BASELINE.md): pair-record gathers are
needle-latency bound, so the only remaining lever on c4 prep is FEWER
NEEDLES — i.e. tighter max_pairs / compact caps. This tool reports how
much headroom the caps actually have for the bench camera/light:

  camera: live tris (post meshlet-cull), live pairs (build_pairs
          overflow against a 128 cap => live = overflow + 128)
  shadow: same for the shadow-space binning

Usage: python tools/c4_live_counts.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp


def main():
    from _scenes import build_c4_scene, c4_config

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
    from zeldaengine_tpu.ops.culling import expand_meshlet_mask, meshlet_cull
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.ops.rasterize_pallas import build_pairs, compact_setup
    from zeldaengine_tpu.passes.frame import _pad_up
    from zeldaengine_tpu.passes.view import build_view_state

    config = c4_config(EngineConfig)
    scene, meta, world = build_c4_scene(config)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    ph = _pad_up(config.height, config.tile_h)
    pw = _pad_up(config.width, max(config.tile_w, 128))

    @jax.jit
    def counts(scene, view):
        world_p = apply_mat4_point(view.model, scene.pair_pos)
        clip = apply_mat4_h(view.view_proj, world_p)
        vp_model = jnp.matmul(view.view_proj, view.model)
        vis = meshlet_cull(scene.meshlet_records, vp_model,
                           view.camera_pos, model=view.model)
        tvis = expand_meshlet_mask(vis, jnp.maximum(scene.tri_meshlet, 0))
        tri_valid = scene.tri_valid & scene.tri_deferred & (
            tvis | (scene.tri_meshlet < 0))
        setup = triangle_setup(clip[scene.tri_vtx], pw, config.height,
                               two_sided=scene.tri_two_sided,
                               valid_mask=tri_valid)
        live_tris = jnp.sum(setup.valid.astype(jnp.int32))
        s2, _, _, cam_tri_over = compact_setup(
            setup, config.compact_tris,
            center_cull=config.subpixel_cull)
        pairs = build_pairs(s2, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, max_pairs=128,
                            sort_z=True, ysort_sub_rows=config.sub_rows,
                            center_cull=config.subpixel_cull)
        cam_pairs = pairs.overflow + 128

        clip_sh = apply_mat4_h(view.shadow_space, world_p)
        # Mirror the engine's shadow prep (passes/frame.py): LIGHT
        # frustum meshlet cull + optional light-apex cone test; camera
        # culling must not apply (geometry behind the camera casts).
        sh_valid = scene.tri_valid
        sp_model = jnp.matmul(view.shadow_space, view.model,
                              precision=jax.lax.Precision.HIGHEST)
        light_pos = view.dir_lights[0, 0, :3]
        vis_sh = meshlet_cull(scene.meshlet_records, sp_model, light_pos,
                              model=view.model,
                              cone=config.shadow_cone_cull)
        tri_vis_sh = expand_meshlet_mask(
            vis_sh, jnp.maximum(scene.tri_meshlet, 0))
        sh_valid = sh_valid & (tri_vis_sh | (scene.tri_meshlet < 0))
        sh_setup = triangle_setup(
            clip_sh[scene.tri_vtx], config.shadowmap_dim,
            config.shadowmap_dim, two_sided=True,
            valid_mask=sh_valid,
            depth_bias=(config.shadow_bias_constant,
                        config.shadow_bias_slope))
        sh_live = jnp.sum(sh_setup.valid.astype(jnp.int32))
        sh2, _, _, sh_tri_over = compact_setup(
            sh_setup, config.compact_tris_shadow,
            center_cull=config.subpixel_cull)
        sh_pairs_b = build_pairs(sh2, config.shadowmap_dim,
                                 config.shadowmap_dim, config.tile_h,
                                 config.tile_w,
                                 expand=config.pair_expand_shadow,
                                 max_pairs=128,
                                 ysort_sub_rows=config.sub_rows,
                                 center_cull=config.subpixel_cull)
        sh_pairs = sh_pairs_b.overflow + 128
        return (live_tris, cam_tri_over, cam_pairs,
                sh_live, sh_tri_over, sh_pairs)

    vals = [int(v) for v in jax.device_get(counts(scene, view))]
    names = ["cam_live_tris", "cam_tri_overflow", "cam_live_pairs",
             "sh_live_tris", "sh_tri_overflow", "sh_live_pairs"]
    caps = dict(compact_tris=config.compact_tris,
                compact_tris_shadow=config.compact_tris_shadow,
                max_pairs=config.max_pairs,
                max_pairs_shadow=config.max_pairs_shadow)
    print({**dict(zip(names, vals)), **caps}, flush=True)


if __name__ == "__main__":
    main()

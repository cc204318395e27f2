"""The frame graph: one jitted function replaces RecordCommandBuffer
(ZeldaEngine.cpp:3160-3744) + DrawFrame submission (:1940-2033).

Pass order (matching the reference's hard-coded command order):
  1. Shadowmap (all objects, depth-only, two-sided)         :3239-3393
  2. DeferredScene -> 6-target GBuffer                      :3417-3480
  3. (depth copy GBuffer->main = reusing the depth array)   :3482-3506
  4. Main pass: DeferredLighting fullscreen                 :3536-3539
     forward objects (z-tested against scene depth)         :3545-3579
     skydome (LESS_OR_EQUAL)                                :3682-3691
     background (fullscreen, z=1)                           :3693-3699
     (skydome/background skipped when debug view != 0)

Semaphores/fences/barriers do not exist here: XLA's dataflow is the
dependency graph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.color import gamma_correct
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.lighting import shade_pixels
from zeldaengine_tpu.ops.rasterize import (
    triangle_setup,
    rasterize_visibility,
    rasterize_depth,
)
from zeldaengine_tpu.ops.rasterize_pallas import (
    FUSED_EXTRA,
    build_pairs,
    compact_setup,
    rasterize_pairs,
    rasterize_pairs_fused,
    remap_pair_tri,
)
from zeldaengine_tpu.ops.culling import expand_meshlet_mask, meshlet_cull
from zeldaengine_tpu.ops.shadow import compute_shadow_coord, compute_pcf
from zeldaengine_tpu.ops.texture import sample_base, sample_trilinear
from zeldaengine_tpu.ops.window_tap import sample_base_window
from zeldaengine_tpu.passes.gbuffer import (
    GBuffer,
    SurfaceAttributes,
    pack_gbuffer,
    surface_attributes,
    surface_attributes_from_planes,
)
from zeldaengine_tpu.scene.scenebuild import GpuScene, SceneMeta


def _use_pallas(config: EngineConfig, band: bool, height: int) -> bool:
    """Pallas tiled kernel on TPU; jnp on CPU. Row bands use Pallas when
    tile-aligned (the multi-chip path guarantees y0/rows alignment)."""
    if config.raster == "jnp":
        return False
    if band and height % config.tile_h != 0:
        return False
    if config.raster in ("pallas", "fused"):
        return True
    return jax.default_backend() not in ("cpu",)


def _use_fused(config: EngineConfig, band: bool, height: int) -> bool:
    """Fused raster+interpolate kernel (visibility passes that feed
    surface attributes). tile_w must divide 128 (the in-kernel record
    fetch gathers from a 128-lane slice vreg; narrow tiles pad the
    index block). The TPU default since round 3 (-21 ms vs
    raster+XLA-gather+interp at the demo scale; equality tests in
    tests/test_fused.py, hardware goldens in tools/tpu_golden_check.py)."""
    if 128 % config.tile_w != 0:
        return False
    if not _use_pallas(config, band, height):
        return False
    if config.raster == "fused":
        return True
    return config.raster == "auto" and jax.default_backend() not in ("cpu",)


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _raster_vis(setup, height, width, config: EngineConfig, init_depth=None,
                y0=0, band: bool = False):
    """Visibility raster with automatic backend choice + tile padding.

    When ``band`` is set, ``y0`` must be a multiple of tile_h for the
    Pallas path (the sharded caller guarantees it; otherwise jnp is used).
    """
    if _use_pallas(config, band, height):
        ph = _pad_up(height, config.tile_h)
        pw = _pad_up(width, max(config.tile_w, 128))
        if init_depth is not None and (ph != height or pw != width):
            init_depth = jnp.pad(
                init_depth, ((0, ph - height), (0, pw - width)),
                constant_values=1.0,
            )
        y0_tiles = jnp.asarray(y0, jnp.int32) // config.tile_h
        orig_t = setup.edge.shape[0]
        setup, _, cidx, covf = _maybe_compact(setup, None, config)
        has_z = 1 if config.raster_zsort else 0
        ysr = config.sub_rows if config.raster_ysort else None
        pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                            expand=config.pair_expand, y0_tiles=y0_tiles,
                            max_pairs=config.max_pairs,
                            sort_z=config.raster_zsort,
                            align=config.pair_align,
                            ysort_sub_rows=ysr,
                            gather_chunks=config.pair_gather_chunks,
                            gather_pack=config.pair_gather_pack,
                            center_cull=config.subpixel_cull)
        if cidx is not None:
            pairs = remap_pair_tri(pairs, cidx, orig_t)
        depth, tid = rasterize_pairs(
            pairs, ph, pw, init_depth=init_depth, tile_h=config.tile_h,
            tile_w=config.tile_w, sub_rows=config.sub_rows,
            y0_tiles=y0_tiles,
            early_out=config.raster_early_out,
            z_row=12 if config.raster_zsort else -1,
            eo_stride=config.early_out_stride,
            y_row=(12 + has_z) if ysr else -1,
        )
        return (depth[:height, :width], tid[:height, :width],
                pairs.overflow + covf)
    d, t = rasterize_visibility(
        setup, height, width, chunk=config.tri_chunk, init_depth=init_depth,
        y0=y0,
    )
    return d, t, jnp.int32(0)


def _band_mask_setup(setup, y0, rows_px: int):
    """Restrict a TriangleSetup to triangles whose bbox intersects pixel
    rows [y0, y0+rows_px) — the multi-chip prep-sharding mask (VERDICT
    r3 #7): with ``config.compact_tris`` set, each device's key sort and
    record gather then track its BAND's triangle count (~1/N) instead of
    replicating the full-scene prep. build_pairs applies the same band
    test to keys, so this only tightens ``valid`` earlier."""
    y0f = jnp.asarray(y0, jnp.float32)
    band = (setup.bbox[:, 3] > y0f) & (setup.bbox[:, 1] < y0f + rows_px)
    return setup._replace(valid=setup.valid & band)


def _maybe_compact(setup, extra, config: EngineConfig):
    """Apply live-triangle compaction when ``config.compact_tris`` is
    set (meshlet-scale scenes: prep cost tracks the live count instead
    of pool capacity)."""
    if config.compact_tris is None or \
            config.compact_tris >= setup.edge.shape[0]:
        return setup, extra, None, jnp.int32(0)
    s2, e2, idx, ovf = compact_setup(setup, config.compact_tris,
                                     extra=extra,
                                     center_cull=config.subpixel_cull)
    return s2, e2, idx, ovf


def _fused_extra(scene, setup, world, n_world, tri_idx=None,
                 need_uv: bool = True, need_combo: bool = True):
    """Per-triangle fused-record payload (T, fused_extra_width(flags)):
    material-combo id (as a float value, elided when every triangle
    shares one combo) + 3 corners x (uv2 [elided for textureless
    flat-normal scenes], color3, world-pos3, world-normal3). O(T)
    host-side-of-the-frame work, replacing the per-PIXEL (H, W, 64)
    record gather + XLA interpolation the jnp attrs path does.

    ``tri_idx``: compacted original-triangle ids (compact_setup) — the
    corner gather then runs over the CAP rows instead of the full pool
    (at config-4 scale the extra build for 1M triangles was the single
    largest prep term; VERDICT r3 #4). Rows whose id is the dead
    sentinel gather row 0 harmlessly (their records are forced to the
    never-row by setup.valid)."""
    static = (scene.pair_static[:, :5] if need_uv
              else scene.pair_static[:, 2:5])
    pair_all = jnp.concatenate(
        [static, world, n_world], axis=1
    )  # (P, 11 or 9)
    cw = pair_all.shape[1]
    if tri_idx is None:
        n_t = setup.edge.shape[0]
        tv = scene.tri_vtx[:n_t]
        mat = scene.tri_meta[:n_t, 3]
    else:
        safe = jnp.minimum(tri_idx, scene.tri_vtx.shape[0] - 1)
        tv = scene.tri_vtx[safe]
        mat = scene.tri_meta[safe, 3]
    corners = pair_all[tv].reshape(tv.shape[0], 3 * cw)
    if not need_combo:
        return corners
    combo = scene.mat_combined[mat].astype(jnp.float32)
    return jnp.concatenate([combo[:, None], corners], axis=1)


def _fused_flags(meta):
    """Static record-elision flags from scene facts (SceneMeta). The uv
    columns are elidable only when NOTHING consumes them — and the TBN
    always does: the reference normalizes the map value BEFORE the 2x-1
    remap (Common.glsl:126), so even the flat default normal tilts the
    shading normal along the uv tangent frame (meta.flat_normal stays
    False; goldens caught the attempted elision). The combo row elides
    whenever every live triangle shares one combo."""
    need_uv = not (meta.tex_channels == () and meta.flat_normal)
    need_combo = meta.const_combo is None
    combo_const = 0.0 if need_combo else float(meta.const_combo)
    return need_uv, need_combo, combo_const


def _raster_vis_fused(setup, extra, height, width, config: EngineConfig,
                      init_depth=None, y0=0, meta=None):
    """Fused visibility raster + attribute interpolation: returns
    (depth, tid, attr planes (ATTR_CH, H, W))."""
    from zeldaengine_tpu.ops.rasterize_pallas import fused_extra_width

    need_uv, need_combo, combo_const = (
        _fused_flags(meta) if meta is not None else (True, True, 0.0))
    n_extra = fused_extra_width(need_uv, need_combo)
    ph = _pad_up(height, config.tile_h)
    pw = _pad_up(width, max(config.tile_w, 128))
    if init_depth is not None and (ph != height or pw != width):
        init_depth = jnp.pad(
            init_depth, ((0, ph - height), (0, pw - width)),
            constant_values=1.0,
        )
    y0_tiles = jnp.asarray(y0, jnp.int32) // config.tile_h
    orig_t = setup.edge.shape[0]
    if callable(extra):
        # Compact FIRST, then build the extra payload for the cap rows
        # only (the builder receives the compacted original ids).
        setup, _, cidx, covf = _maybe_compact(setup, None, config)
        extra = extra(cidx)
    else:
        setup, extra, cidx, covf = _maybe_compact(setup, extra, config)
    assert extra.shape[1] == n_extra, (extra.shape, n_extra)
    has_z = 1 if config.raster_zsort else 0
    ysr = config.sub_rows if config.raster_ysort else None
    pairs = build_pairs(setup, pw, ph, config.tile_h, config.tile_w,
                        expand=config.pair_expand, y0_tiles=y0_tiles,
                        extra=extra, max_pairs=config.max_pairs,
                        sort_z=config.raster_zsort,
                        align=config.pair_align,
                        ysort_sub_rows=ysr,
                        gather_chunks=config.pair_gather_chunks,
                        gather_pack=config.pair_gather_pack,
                        center_cull=config.subpixel_cull)
    if cidx is not None:
        pairs = remap_pair_tri(pairs, cidx, orig_t)
    depth, tid, planes = rasterize_pairs_fused(
        pairs, ph, pw, init_depth=init_depth, tile_h=config.tile_h,
        tile_w=config.tile_w, sub_rows=config.sub_rows,
        texture_size=config.texture_size, y0_tiles=y0_tiles,
        early_out=config.raster_early_out,
        z_row=(12 + n_extra) if config.raster_zsort else -1,
        eo_stride=config.early_out_stride,
        y_row=(12 + n_extra + has_z) if ysr else -1,
        need_uv=need_uv, has_combo=need_combo, combo_const=combo_const,
    )
    return (depth[:height, :width], tid[:height, :width],
            planes[:, :height, :width], pairs.overflow + covf)


def _apply_wireframe(attrs: SurfaceAttributes, depth, tid,
                     config: EngineConfig, fallback_depth=None):
    """ENABLE_WIREFRAME (polygonMode LINE): keep only edge pixels
    covered; interiors fall through to whatever is behind (the previous
    pass's depth, else sky/bg), matching hardware LINE rasterization of
    the same triangles."""
    edge = attrs.covered & (attrs.bary_min < config.wireframe_threshold)
    attrs = attrs._replace(covered=edge)
    fb = 1.0 if fallback_depth is None else fallback_depth
    depth = jnp.where(edge, depth, fb)
    tid = jnp.where(edge, tid, -1)
    return attrs, depth, tid


def _raster_depth(setup, dim, config: EngineConfig, y0=0,
                  band: bool = False, rows=None):
    height = rows if rows is not None else dim
    s_th = config.shadow_tile_h or config.tile_h
    s_tw = config.shadow_tile_w or config.tile_w
    cfg_band = config if s_th == config.tile_h \
        else config.replace(tile_h=s_th)
    if _use_pallas(cfg_band, band, height):
        y0_tiles = jnp.asarray(y0, jnp.int32) // s_th
        # Shadow casters are NOT the camera-culled set: compaction uses
        # its own capacity (config.compact_tris_shadow).
        setup, _, _, covf = _maybe_compact(
            setup, None,
            config.replace(compact_tris=config.compact_tris_shadow))
        has_z = 1 if config.raster_zsort else 0
        ysr = config.sub_rows if config.raster_ysort else None
        pairs = build_pairs(setup, dim, height, s_th, s_tw,
                            expand=config.pair_expand_shadow,
                            y0_tiles=y0_tiles,
                            max_pairs=config.max_pairs_shadow,
                            sort_z=config.raster_zsort,
                            align=config.pair_align,
                            ysort_sub_rows=ysr,
                            gather_chunks=config.pair_gather_chunks,
                            gather_pack=config.pair_gather_pack,
                            center_cull=config.subpixel_cull)
        return rasterize_pairs(
            pairs, height, dim, tile_h=s_th, tile_w=s_tw,
            sub_rows=config.sub_rows, depth_only=True, y0_tiles=y0_tiles,
            early_out=config.raster_early_out,
            z_row=12 if config.raster_zsort else -1,
            eo_stride=config.early_out_stride,
            y_row=(12 + has_z) if ysr else -1,
        ), pairs.overflow + covf
    return (rasterize_depth(setup, height, dim, chunk=config.tri_chunk,
                            y0=y0), jnp.int32(0))


def _pcf_uses_vmem(config: EngineConfig) -> bool:
    """The VMEM Pallas PCF serves "vmem" everywhere and "auto" on TPU
    (on CPU "auto" keeps the XLA packed path — interpret-mode kernels
    are orders of magnitude slower than jnp)."""
    return (config.pcf_backend in ("vmem", "auto")
            and config.shadowmap_dim % 128 == 0
            and (config.pcf_backend == "vmem"
                 or jax.default_backend() not in ("cpu",)))


def _shadow_factor(shadowmap, world_pos, view, config: EngineConfig,
                   valid=None):
    if "nopcf" in config.ablate:  # diagnostic ablation
        return jnp.ones(world_pos.shape[:-1], jnp.float32)
    sc = compute_shadow_coord(view.shadow_space, world_pos)
    if "pcfcoords" in config.ablate:
        # DIAGNOSTIC: keep the shadow-coord computation, skip the
        # filter — splits the PCF marginal into coords vs kernel.
        return 1.0 + sc[..., 0] * 1e-9 + sc[..., 2] * 1e-9
    if config.pcf_backend in ("packed_y4", "packed_y8") \
            and config.shadowmap_dim % 8 == 0:
        # Y-packed row table: ygroup shadow rows per table row -> 4-8x
        # fewer gather rows AND 5 row gathers -> 3 window gathers; the
        # build uses only contiguous slices + one narrow transpose
        # (same class the plain build pays). Exact tap-for-tap.
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed_y

        return compute_pcf_packed_y(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias,
            ygroup=int(config.pcf_backend[len("packed_y"):]),
        )
    if config.pcf_backend in ("packed4", "packed8", "packed16"):
        # Group-fused row table: 4-16x fewer gather rows (exact).
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed4

        return compute_pcf_packed4(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias,
            group=int(config.pcf_backend[len("packed"):]),
        )
    if config.pcf_backend in ("half", "half_nearest", "half_wr",
                              "half_y4") and sc.ndim == 3:
        # Half-res exact taps + 2x upsample: 4x fewer gather indices
        # (VERDICT r2 #10); one-tap-quantum error along penumbra edges.
        # "half_wr" additionally collapses the 5 row gathers into ONE
        # (kernel-built 2-D window table).
        from zeldaengine_tpu.ops.shadow import compute_pcf_half

        return compute_pcf_half(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias,
            upsample="nearest" if config.pcf_backend == "half_nearest"
            else "linear",
            inner={"half_wr": "window_roll",
                   "half_y4": "packed_y"}.get(config.pcf_backend, "packed"),
        )
    if config.pcf_backend == "window1":
        # ONE gather per pixel from a 2-D window table (exact).
        from zeldaengine_tpu.ops.shadow import compute_pcf_window1

        return compute_pcf_window1(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias,
        )
    if config.pcf_backend == "window_roll" and config.shadowmap_dim % 128 == 0:
        # ONE gather per pixel from the kernel-built 2-D window table.
        from zeldaengine_tpu.ops.shadow import compute_pcf_window_roll

        return compute_pcf_window_roll(
            shadowmap, sc, radius=config.pcf_radius,
            scale=config.pcf_scale, bias=config.shadow_bias,
        )
    if config.pcf_backend == "packed_roll" and (
        config.shadowmap_dim % 128 == 0
    ):
        # Exact; x-window table built by a Pallas roll kernel. Measured
        # +10 ms vs the XLA build at 1080p (the per-row transposes cost
        # more than XLA's relayout) — kept as an option, not the default.
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed_roll

        return compute_pcf_packed_roll(
            shadowmap, sc, radius=config.pcf_radius,
            scale=config.pcf_scale, bias=config.shadow_bias,
        )
    if _pcf_uses_vmem(config) and sc.ndim == 3:
        # Tap loop inside a Pallas kernel with the whole shadowmap
        # VMEM-resident: ~4.5 ms at 1080p vs ~44 ms for the XLA row-table
        # gathers (which pay ~4.3 ns per index regardless of locality).
        # Bitwise-equal to compute_pcf on TPU at every COVERED in-range
        # pixel; out-of-window blocks are recomputed by compute_pcf
        # itself inside the graph. Uncovered pixels (whose world_pos is
        # the GBuffer default, overwritten by sky downstream) read 1.0
        # instead of the packed path's origin-projected factor.
        from zeldaengine_tpu.ops.pcf_vmem import compute_pcf_vmem

        sf, _overflow = compute_pcf_vmem(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias, win_rows=config.pcf_vmem_rows,
            active=valid, fallback_cap=config.pcf_fallback_cap,
            interpret=jax.default_backend() == "cpu",
        )
        if valid is not None:
            sf = jnp.where(valid, sf, 1.0)
        return sf
    if config.pcf_backend == "packed_b":
        # One batched (2r+1, H, W)-index gather instead of 5 row gathers.
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed

        return compute_pcf_packed(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias, batch_rows=True,
        )
    if config.pcf_backend in ("auto", "packed"):
        # Exact tap-for-tap vs compute_pcf AND faster than the windowed
        # Pallas kernel (whose per-tile clamp is wrong on ~8% of pixels
        # in footprint-heavy scenes) — the CPU default and the TPU
        # fallback when the vmem kernel's preconditions fail.
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed

        return compute_pcf_packed(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias,
            _ablate_const_table="pcfbuild" in config.ablate,
        )
    if config.pcf_backend == "pallas" and sc.ndim == 3:
        from zeldaengine_tpu.ops.pcf_pallas import compute_pcf_pallas

        h, w = sc.shape[:2]
        ph = _pad_up(h, config.tile_h)
        pw = _pad_up(w, max(config.tile_w, 128))
        if ph != h or pw != w:
            sc = jnp.pad(sc, ((0, ph - h), (0, pw - w), (0, 0)))
            if valid is not None:
                valid = jnp.pad(valid, ((0, ph - h), (0, pw - w)))
        out = compute_pcf_pallas(
            shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
            bias=config.shadow_bias, tile_h=config.tile_h,
            tile_w=config.tile_w, win=config.pcf_window,
            sub_rows=config.sub_rows, valid=valid,
        )
        return out[:h, :w]
    return compute_pcf(
        shadowmap, sc, radius=config.pcf_radius, scale=config.pcf_scale,
        bias=config.shadow_bias,
    )


def _debug_switch(debug_view, final, attrs: SurfaceAttributes, shadow_factor,
                  reflection, extra_case9=None, shadow_factor_vis=None):
    """The SPEC_CONSTANTS switch of Base.frag:119-143 (forward) and
    BaseLighting.frag:237-253 (deferred when ``extra_case9`` is given).

    A FLAT lax.switch measures fastest here: restructuring as
    cond(view == 0, final, switch(...)) to keep debug branches off the
    common path cost +32 ms/frame (the cond boundary blocks fusion of the
    resolve chain with the passes after it)."""

    def c(x):
        return jnp.broadcast_to(x[..., None] if x.ndim == 2 else x, final.shape)

    branches = [
        lambda: final,  # composed by caller (case 0 differs fwd/deferred)
        lambda: c(attrs.base_color),
        lambda: c(attrs.metallic),
        lambda: c(attrs.roughness),
        lambda: c(attrs.normal),
        lambda: c(attrs.ao),
        lambda: c(attrs.vertex_color),
        lambda: c(reflection),
        # Case 8 displays the factor RAW — when the vmem PCF backend
        # gated uncovered pixels to 1.0 (sky overwrites them in the
        # composed image but not in this view), the caller provides an
        # exact ungated recompute thunk; lazy inside the switch branch.
        (lambda: c(shadow_factor_vis())) if shadow_factor_vis is not None
        else (lambda: c(shadow_factor)),
        extra_case9 if extra_case9 is not None else (lambda: final),
    ]
    return jax.lax.switch(jnp.clip(debug_view, 0, 9), branches)


def _gbuffer_vis(gbuf: GBuffer, shadowmap, final, view, config: EngineConfig,
                 cube_atlas=None, shadow_factor=None):
    """BaseLighting.frag:42-145 GBufferVis — 3x3 contact sheet of the
    GBuffer (basecolor/metallic/roughness | normal/-/AO | black/refl/shadow),
    honoring the editor's reserved right/bottom bars via viewportInfo."""
    height, width = gbuf.depth.shape
    yy = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5) / height
    xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
    uv = jnp.stack(
        [jnp.broadcast_to(xx, (height, width)), jnp.broadcast_to(yy, (height, width))],
        -1,
    )
    empty = view.viewport[2:4] / view.viewport[0:2]
    tile_uv = uv * 3.0 / (1.0 - empty)

    def sample(img):
        ix = jnp.clip((tile_uv[..., 0] * width).astype(jnp.int32), 0, width - 1)
        iy = jnp.clip((tile_uv[..., 1] * height).astype(jnp.int32), 0, height - 1)
        return img.reshape(height * width, -1)[iy * width + ix]

    ga = sample(gbuf.gbuffer_a)
    gb = sample(gbuf.gbuffer_b)
    gc = sample(gbuf.gbuffer_c)
    gd = sample(gbuf.gbuffer_d)

    base_color = gc[..., :3]
    metallic = pbr.saturate(gb[..., 0])
    roughness = jnp.maximum(0.01, pbr.saturate(gb[..., 2]))
    normal = pbr.normalize(ga[..., :3] * 2.0 - 1.0)
    ao = pbr.saturate(gc[..., 3])
    p = gd[..., :3]
    v = pbr.normalize(view.camera_pos - p)

    step = (1.0 - empty) / 3.0
    x = uv[..., 0]
    y = uv[..., 1]

    def cell(i, j):
        """Inside cell (i, j) of the 3x3 grid, minus the gutter."""
        in_cell = (
            (x < step[0] * (i + 1))
            & (x >= step[0] * i)
            & (y < step[1] * (j + 1))
            & (y >= step[1] * j)
        )
        gutter = (x > step[0] * (i + 1.0 - empty[0])) | (
            y > step[1] * (j + 1.0 - empty[1])
        )
        return in_cell, gutter

    result = final
    white = jnp.ones_like(final)

    def put(i, j, img):
        nonlocal result
        in_cell, gutter = cell(i, j)
        val = jnp.where(gutter[..., None], white, img)
        result = jnp.where(in_cell[..., None], val, result)

    put(0, 0, gamma_correct(base_color))
    put(1, 0, jnp.broadcast_to(metallic[..., None], final.shape))
    put(2, 0, jnp.broadcast_to(roughness[..., None], final.shape))
    put(0, 1, normal)
    put(2, 1, jnp.broadcast_to(ao[..., None], final.shape))
    put(0, 2, jnp.zeros_like(final))
    # (1,2): raw mip-0 reflection
    from zeldaengine_tpu.ops.texture import sample_cubemap_lod

    r = pbr.refract(v, normal, 1.0 / 1.52)
    refl = sample_cubemap_lod(
        cube_atlas, jnp.zeros(x.shape, jnp.int32), r, jnp.zeros(x.shape),
        config.cubemap_size, quad=cube_atlas.shape[-1] % 13 != 0,
    )[..., :3] * 10.0
    put(1, 2, refl)
    # (2,2): shadow factor — reuse the frame's computed factor, warped by
    # the same contact-sheet sampling (recomputing PCF on the warped
    # positions would duplicate the whole PCF graph inside this branch).
    if shadow_factor is not None:
        sf = sample(shadow_factor[..., None])[..., 0]
    else:
        sf = _shadow_factor(shadowmap, p, view, config)
    put(2, 2, jnp.broadcast_to(sf[..., None], final.shape))
    return result


def resolve_lighting(gbuf: GBuffer, shadowmap, scene: GpuScene, view,
                     config: EngineConfig, enable_vis: bool = True,
                     tiled_points=None, env_fetch=None,
                     pallas_points=None):
    """BaseLighting.frag main(): unpack GBuffer, light, debug switch."""
    base_color = gbuf.gbuffer_c[..., :3]
    metallic = pbr.saturate(gbuf.gbuffer_b[..., 0])
    roughness = jnp.maximum(0.01, pbr.saturate(gbuf.gbuffer_b[..., 2]))
    normal = gbuf.gbuffer_a[..., :3] * 2.0 - 1.0
    ao = pbr.saturate(gbuf.gbuffer_c[..., 3])
    emissive = gbuf.scene_color[..., :3]
    mask = gbuf.scene_color[..., 3]
    world_pos = gbuf.gbuffer_d[..., :3]

    shadow_factor = _shadow_factor(shadowmap, world_pos, view, config,
                                   valid=gbuf.depth < 1.0)
    # Exact ungated recompute for the raw-factor debug views (8 and the
    # view-9 contact sheet); None when the main factor is already exact
    # everywhere. Lazy: only evaluated inside the selected switch branch.
    sf_ungated = None
    if _pcf_uses_vmem(config):
        def sf_ungated():
            return _shadow_factor(
                shadowmap, world_pos, view,
                config.replace(pcf_backend="packed"))
    if "nolight" in config.ablate:  # diagnostic ablation
        lit = {"final": base_color * shadow_factor[..., None],
               "reflection": jnp.zeros_like(base_color)}
        if env_fetch is not None:  # keep sky/bg rows flowing
            env_fetch(normal, roughness)
    else:
        lit = shade_pixels(
            base_color, metallic, roughness, normal, ao, world_pos,
            shadow_factor, view, scene.cube_atlas, config.cubemap_size,
            tiled_points=tiled_points, env_fetch=env_fetch,
            ablate=config.ablate, cube_pair1=scene.cube_pair1,
            refl_half=config.reflection_half,
            cube_const=scene.cube_const, pallas_points=pallas_points,
        )
    final = gamma_correct(lit["final"] * mask[..., None])

    attrs = SurfaceAttributes(
        covered=gbuf.depth < 1.0,
        world_pos=world_pos,
        normal=pbr.normalize(normal),
        # deferred fullscreen rect interpolates the Background.vert corner
        # colors; approximated as its dominant red/green/blue blend is not
        # reconstructible per-pixel — use the GBuffer-less vertex color
        # convention (BaseLighting debug case 6 shows rect colors).
        vertex_color=jnp.zeros_like(base_color),
        base_color=gamma_correct(base_color),  # case 1 gamma-corrects
        metallic=metallic,
        roughness=roughness,
        ao=ao,
        emissive=emissive,
        mask=mask,
    )
    if "noswitch" in config.ablate:  # diagnostic ablation
        return final
    if enable_vis:
        # Lazy: GBufferVis (its own PCF + cubemap taps) must only run when
        # debug view 9 is selected, so it lives inside the switch branch.
        def vis_thunk():
            # The vmem PCF backend leaves UNCOVERED pixels at 1.0 (they
            # are overwritten by sky in the composed image), but the
            # view-9 contact sheet displays the factor raw — recompute
            # it ungated via the XLA packed path for exact parity with
            # the CPU goldens. Lives inside the switch branch: costs
            # nothing unless debug view 9 is selected.
            sf_vis = (sf_ungated() if sf_ungated is not None
                      else shadow_factor)
            return _gbuffer_vis(gbuf, shadowmap, final, view, config,
                                scene.cube_atlas,
                                shadow_factor=sf_vis)
    else:
        def vis_thunk():
            return final
    return _debug_switch(
        view.debug_view, final, attrs, shadow_factor, lit["reflection"],
        extra_case9=vis_thunk, shadow_factor_vis=sf_ungated,
    )


def forward_shade(attrs: SurfaceAttributes, shadowmap, scene: GpuScene, view,
                  config: EngineConfig, tiled_points=None, env_fetch=None,
                  pallas_points=None):
    """Base.frag main(): forward PBR with the case-0 ShadowFactor multiply."""
    shadow_factor = _shadow_factor(shadowmap, attrs.world_pos, view, config,
                                   valid=attrs.covered)
    sf_ungated = None
    if _pcf_uses_vmem(config):
        def sf_ungated():
            return _shadow_factor(
                shadowmap, attrs.world_pos, view,
                config.replace(pcf_backend="packed"))
    lit = shade_pixels(
        attrs.base_color, attrs.metallic, attrs.roughness, attrs.normal,
        attrs.ao, attrs.world_pos, shadow_factor, view,
        scene.cube_atlas, config.cubemap_size, tiled_points=tiled_points,
        env_fetch=env_fetch, ablate=config.ablate,
        cube_pair1=scene.cube_pair1, refl_half=config.reflection_half,
        cube_const=scene.cube_const, pallas_points=pallas_points,
    )
    final = gamma_correct(lit["final"]) * shadow_factor[..., None]
    return _debug_switch(
        view.debug_view, final, attrs, shadow_factor, lit["reflection"],
        extra_case9=None, shadow_factor_vis=sf_ungated,
    )


def _skydome_mesh(scene, view, depth, color, show_env, height, width,
                  config: EngineConfig, y0, full_frame):
    """Skydome as rasterized geometry (the reference's literal path:
    skydome.obj mesh, ZeldaEngine.cpp:3682-3691). Kept for parity tests;
    the analytic path below is the TPU-fast default."""
    vp_h = config.height
    sky_world = apply_mat4_point(view.model, scene.sky_pos)
    sky_clip = apply_mat4_h(view.view_proj, sky_world)
    setup_sky = triangle_setup(
        sky_clip[scene.sky_tri], width, vp_h, two_sided=True
    )
    depth_sky, tid_sky, _ = _raster_vis(
        setup_sky, height, width, config, init_depth=depth, y0=y0,
        band=not full_frame,
    )
    sky_mask = (tid_sky >= 0) & show_env
    # interpolate uv and sample the equirect skydome texture
    from zeldaengine_tpu.ops.rasterize import interpolation_coeffs

    bary, _ = interpolation_coeffs(setup_sky, tid_sky, height, width,
                                   y0=y0)
    uv = jnp.einsum(
        "hwk,hwkc->hwc", bary,
        scene.sky_uv[scene.sky_tri[jnp.maximum(tid_sky, 0)]],
    )
    sky_rgb = gamma_correct(
        sample_base(
            scene.sky_tex, jnp.zeros_like(tid_sky), uv,
            config.background_size, quad=True,
        )[..., :3]
    )
    color = jnp.where(sky_mask[..., None], sky_rgb, color)
    depth = jnp.where(sky_mask, depth_sky, depth)
    return color, depth


def _sky_ray(scene, view, height, width, config: EngineConfig, y0):
    """Closed-form skydome ray intersection: per-pixel ray vs the dome
    sphere. Returns (uv (H, W, 2), sky_depth (H, W), hit (H, W) — in
    front and within [0, 1] depth).

    The dome is a radius-``skydome_radius`` UV sphere centered at the
    origin (model-rotated); instead of rasterizing its ~576 triangles
    and gathering interpolated UVs, intersect the camera ray with the
    sphere analytically and derive the equirect UV from the hit
    direction — the exact infinite-tessellation limit of the mesh path
    (same UV convention as make_sphere)."""
    from zeldaengine_tpu.ops.rasterize import _pixel_grid

    vp_h = config.height
    px, py = _pixel_grid(height, width, y0=y0)
    nx = px / width * 2.0 - 1.0
    ny = py / vp_h * 2.0 - 1.0
    inv_vp = jnp.linalg.inv(view.view_proj)
    # A point on each pixel ray (NDC z = 0.5; any z works).
    pt = jnp.stack(
        [nx, ny, jnp.full_like(nx, 0.5), jnp.ones_like(nx)], -1
    )
    world_h = jnp.einsum("ij,hwj->hwi", inv_vp, pt,
                         precision=jax.lax.Precision.HIGHEST)
    p0 = world_h[..., :3] / world_h[..., 3:4]
    d = pbr.normalize(p0 - view.camera_pos)

    o = view.camera_pos
    radius = scene.sky_params[0]
    b = jnp.einsum("c,hwc->hw", o, d)
    c_s = jnp.sum(o * o) - radius * radius
    disc = b * b - c_s
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - s
    t2 = -b + s
    t = jnp.where(t1 > 1e-4, t1, t2)
    hit = (disc >= 0.0) & (t > 1e-4)
    p = o + t[..., None] * d

    # The dome rotates with the stage roll (model matrix); rotate the
    # lookup point back into dome-local space.
    inv_model = jnp.linalg.inv(view.model)
    local = jnp.einsum("ij,hwj->hwi", inv_model[:3, :3], p)

    two_pi = 2.0 * jnp.pi
    u = jnp.mod(
        jnp.arctan2(local[..., 1], local[..., 0]) / two_pi
        + scene.sky_params[1],
        1.0,
    )
    v = jnp.arccos(jnp.clip(local[..., 2] / radius, -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([u, v], -1)

    # Dome depth (z/w through the camera projection) for the z-test and
    # the background pass that follows.
    clip_z = jnp.einsum("c,hwc->hw", view.view_proj[2, :3], p) \
        + view.view_proj[2, 3]
    clip_w = jnp.einsum("c,hwc->hw", view.view_proj[3, :3], p) \
        + view.view_proj[3, 3]
    sky_depth = clip_z / jnp.where(jnp.abs(clip_w) > 1e-20, clip_w, 1.0)
    hit = hit & (sky_depth >= 0.0) & (sky_depth <= 1.0)
    return uv, sky_depth, hit


def _tap_uses_window(planes, size: int) -> bool:
    """Windowed VMEM tap preconditions (ops/window_tap.py): square
    %256 plane stack present, running on an accelerator (the kernel is
    bitwise-equal to sample_base, so backends stay golden-compatible)."""
    return (planes is not None and planes.ndim == 3
            and planes.shape[1] == planes.shape[2] == size
            and size % 256 == 0
            and jax.default_backend() not in ("cpu",))


def _skydome_analytic(scene, view, depth, color, show_env, height, width,
                      config: EngineConfig, y0):
    """Analytic skydome pass (ray + one sky gather + compose)."""
    uv, sky_depth, hit = _sky_ray(scene, view, height, width, config, y0)
    sky_mask = hit & (sky_depth < depth) & show_env
    if _tap_uses_window(scene.sky_planes, config.background_size):
        # Windowed VMEM tap: ~5.7 ms full-screen -> ~2 ms with the
        # active-block skip, vs ~30 ms for the XLA gather (BASELINE.md).
        tap, _ovf = sample_base_window(
            scene.sky_planes, uv, sky_mask, config.background_size)
    else:
        tap = sample_base(
            scene.sky_tex, jnp.zeros(uv.shape[:2], jnp.int32), uv,
            config.background_size, quad=True,
        )
    sky_rgb = gamma_correct(tap[..., :3])
    color = jnp.where(sky_mask[..., None], sky_rgb, color)
    depth = jnp.where(sky_mask, sky_depth, depth)
    return color, depth


@functools.partial(jax.jit, static_argnames=("meta", "config"))
def render_frame(
    scene: GpuScene,
    view,
    meta: SceneMeta,
    config: EngineConfig,
):
    """Render one frame. Returns (image (H, W, 3) float32 in [0,1], aux)."""
    return render_rows(scene, view, meta, config)


def render_rows(
    scene: GpuScene,
    view,
    meta: SceneMeta,
    config: EngineConfig,
    y0=0.0,
    rows: Optional[int] = None,
    shadow_rows=None,
    full_frame: bool = True,
    shadowmap_override=None,
):
    """Row-band renderer: rasterize/shade pixel rows [y0, y0+rows).

    The multi-chip path (parallel/tiles.py) shard_maps this over a device
    mesh with ``y0 = axis_index * rows``; the shadowmap can be computed
    sharded and all-gathered by passing ``shadow_rows=(sy0, s_rows,
    gather_fn)``, or reused across several bands of the same frame by
    passing an already-computed ``shadowmap_override`` (the striped
    multi-chip path renders S strips per device but builds the shadow
    map once). ``full_frame=False`` disables the GBufferVis contact
    sheet (it needs cross-row gathers).
    """
    width = config.width
    height = rows if rows is not None else config.height
    # NDC -> pixel mapping always uses the FULL viewport; ``height`` only
    # sizes the rasterized row band.
    vp_h = config.height

    # ---- tiled point-light culling (the usable form of the reference's
    # 512-light capacity; UNROLL-sized tables shade without culling).
    # Sharded row bands cull over band-local tiles (y0 offset), so the
    # multi-chip path runs the same tiled feature set as single-chip.
    use_pallas_points = (
        config.point_light_kernel in ("pallas", "auto")
        and view.point_lights.shape[0] >= config.point_kernel_min
        and width % 128 == 0
        and (config.point_light_kernel == "pallas"
             or jax.default_backend() not in ("cpu",))
    )
    use_tiled = (not use_pallas_points) and (
        view.point_lights.shape[0] >= config.tiled_lights_min
        and width % config.light_tile_w == 0
    )
    light_drops = jnp.int32(0) if (use_tiled or use_pallas_points) else None

    def make_pallas_points(world_pos, covered):
        """Per-pass culled light lists for the Pallas point-light kernel
        (one cull tile per (point_block_h, 128) kernel block)."""
        nonlocal light_drops
        if not use_pallas_points:
            return None
        from zeldaengine_tpu.ops.lighting import cull_point_lights_tiled

        tile_idx, tile_cnt, drops = cull_point_lights_tiled(
            view.point_lights, view.lights_count[1], view, width, height,
            config.point_block_h, 128, config.max_tile_lights, y0=y0,
            vp_h=config.height, world_pos=world_pos, covered=covered,
        )
        light_drops = light_drops + drops
        return (tile_idx, tile_cnt, config.point_block_h,
                jax.default_backend() in ("cpu",))

    def make_tiled(world_pos=None, covered=None):
        """Per-pass tiled light lists, depth-bounded by that pass's own
        visible surface (VERDICT r3 #6): the deferred resolve culls
        against the GBuffer positions, the forward pass against its own
        attributes — an occluded light stops eating k_max slots."""
        nonlocal light_drops
        if not use_tiled:
            return None
        from zeldaengine_tpu.ops.lighting import cull_point_lights_tiled

        tile_idx, tile_cnt, drops = cull_point_lights_tiled(
            view.point_lights, view.lights_count[1], view, width, height,
            config.light_tile_h, config.light_tile_w,
            config.max_tile_lights, y0=y0, vp_h=config.height,
            world_pos=world_pos, covered=covered,
        )
        light_drops = light_drops + drops
        return (tile_idx, tile_cnt, config.light_tile_h,
                config.light_tile_w)

    # ---- vertex stage (Base.vert / BaseInstanced.vert / Shadowmap*.vert)
    world = apply_mat4_point(view.model, scene.pair_pos)
    n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
    if scene.rot_table.shape[0] <= 1:
        # No instance rotations anywhere (rot_table is just the identity
        # row): the per-pair (P, 3, 3) gather + einsum are the identity.
        # Meshlet-scale scenes bake ~1M unrotated pairs — skipping it is
        # a static shape decision, free at trace time.
        n_world = n1
    else:
        n_world = jnp.einsum(
            "pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
            precision=jax.lax.Precision.HIGHEST,
        )
    clip = apply_mat4_h(view.view_proj, world)
    tri_clip = clip[scene.tri_vtx]

    # GPU-driven meshlet culling (frustum + backface cone): the per-frame
    # compacted 'indirect draw list' as a validity mask.
    tri_valid = scene.tri_valid
    if meta.has_meshlets:
        vp_model = jnp.matmul(view.view_proj, view.model,
                              precision=jax.lax.Precision.HIGHEST)
        visible = meshlet_cull(
            scene.meshlet_records, vp_model, view.camera_pos,
            model=view.model,
        )
        # camera position is in world space; bounds were transformed by
        # ``model`` inside meshlet_cull, matching vp_model's clip transform.
        tri_vis = expand_meshlet_mask(visible, jnp.maximum(scene.tri_meshlet, 0))
        tri_valid = tri_valid & (tri_vis | (scene.tri_meshlet < 0))

    pair_overflow = jnp.int32(0)  # live pairs dropped by max_pairs caps
    # ---- 1. shadowmap pass (two-sided: cull disabled for Shadow pipelines)
    if shadowmap_override is not None:
        shadowmap = shadowmap_override
    elif config.enable_shadow:
        clip_sh = apply_mat4_h(view.shadow_space, world)
        # NOTE: CAMERA frustum/cone culling must NOT apply here —
        # geometry behind the camera still casts shadows. The LIGHT
        # frustum is a different matter: meshlets outside the shadow
        # frustum cannot write the map (exact), and closed-mesh scenes
        # can opt into the light-apex cone test (shadow_cone_cull).
        sh_valid = scene.tri_valid
        if meta.has_meshlets:
            sp_model = jnp.matmul(view.shadow_space, view.model,
                                  precision=jax.lax.Precision.HIGHEST)
            light_pos = view.dir_lights[0, 0, :3]
            vis_sh = meshlet_cull(
                scene.meshlet_records, sp_model, light_pos,
                model=view.model, cone=config.shadow_cone_cull,
            )
            tri_vis_sh = expand_meshlet_mask(
                vis_sh, jnp.maximum(scene.tri_meshlet, 0))
            sh_valid = sh_valid & (tri_vis_sh | (scene.tri_meshlet < 0))
        setup_sh = triangle_setup(
            clip_sh[scene.tri_vtx],
            config.shadowmap_dim,
            config.shadowmap_dim,
            two_sided=True,
            valid_mask=sh_valid,
            depth_bias=(config.shadow_bias_constant,
                        config.shadow_bias_slope),
        )
        if shadow_rows is not None:
            sy0, s_rows, gather_fn = shadow_rows
            shadow_band, ovf_sh = _raster_depth(
                _band_mask_setup(setup_sh, sy0, s_rows),
                config.shadowmap_dim, config, y0=sy0,
                band=True, rows=s_rows,
            )
            shadowmap = gather_fn(shadow_band)
        else:
            shadowmap, ovf_sh = _raster_depth(
                setup_sh, config.shadowmap_dim, config,
                band=not full_frame,
            )
        pair_overflow = pair_overflow + ovf_sh
    else:
        shadowmap = jnp.zeros(
            (config.shadowmap_dim, config.shadowmap_dim), jnp.float32
        )
        shadowmap = shadowmap + 1.0

    # ---- merged environment tap setup (one gather for reflection +
    # sky + background; ops/envtap.py). The sky ray runs BEFORE the
    # resolve so uncovered pixels' table rows ride the reflection
    # gather.
    use_env = (
        config.env_merge
        and scene.env_table is not None
        and meta.env_shapes is not None
        and config.skydome_mode == "analytic"
    )
    show_env = view.debug_view == 0  # :3682/:3693 skip when debug != 0
    sky_uv = sky_depth = sky_hit = bg_uv = None
    if use_env:
        if meta.enable_skydome and config.enable_skydome:
            sky_uv, sky_depth, sky_hit = _sky_ray(
                scene, view, height, width, config, y0
            )
        else:
            sky_uv = jnp.zeros((height, width, 2), jnp.float32)
            sky_hit = jnp.zeros((height, width), bool)
        if meta.enable_background and config.enable_background:
            yy = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
                  + y0) / config.height
            xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) \
                / width
            bg_uv = jnp.stack(
                [jnp.broadcast_to(xx, (height, width)),
                 jnp.broadcast_to(yy, (height, width))], -1,
            )

    def make_env_fetch(covered, cell):
        if not use_env:
            return None

        def env_fetch(r, mips):
            from zeldaengine_tpu.ops.envtap import sample_env_merged

            refl, sky_rgba, bg_rgba = sample_env_merged(
                scene.env_table, meta.env_shapes, covered, r, mips,
                config.cubemap_size, sky_uv, sky_hit, bg_uv,
                config.background_size, config.background_size,
            )
            cell["sky"] = sky_rgba
            cell["bg"] = bg_rgba
            cell["covered"] = covered
            return refl

        return env_fetch

    env_cell = {}

    # ---- 2. deferred scene -> GBuffer
    use_fused = _use_fused(config, not full_frame, height)
    if meta.has_deferred:
        setup = triangle_setup(
            tri_clip, width, vp_h,
            two_sided=scene.tri_two_sided,
            valid_mask=tri_valid & scene.tri_deferred,
        )
        if not full_frame:
            setup = _band_mask_setup(setup, y0, height)
        if use_fused:
            setup_d = setup
            f_uv, f_combo, _ = _fused_flags(meta)
            depth_d, tid_d, planes_d, ovf_d = _raster_vis_fused(
                setup_d,
                lambda cidx: _fused_extra(scene, setup_d, world, n_world,
                                          tri_idx=cidx, need_uv=f_uv,
                                          need_combo=f_combo),
                height, width, config, y0=y0, meta=meta,
            )
            attrs_d = surface_attributes_from_planes(
                scene, planes_d, config, var_ch=meta.tex_channels,
                flat_normal=meta.flat_normal)
        else:
            depth_d, tid_d, ovf_d = _raster_vis(
                setup, height, width, config, y0=y0, band=not full_frame
            )
            attrs_d = surface_attributes(
                scene, setup, tid_d, world, n_world, config, y0=y0,
                var_ch=meta.tex_channels, flat_normal=meta.flat_normal,
            )
        if config.wireframe:
            attrs_d, depth_d, tid_d = _apply_wireframe(
                attrs_d, depth_d, tid_d, config
            )
        gbuf = pack_gbuffer(attrs_d, depth_d)
        # ---- 4a. deferred lighting (fullscreen, no depth test)
        color = resolve_lighting(
            gbuf, shadowmap, scene, view, config,
            enable_vis=full_frame,
            tiled_points=make_tiled(attrs_d.world_pos, attrs_d.covered),
            env_fetch=make_env_fetch(attrs_d.covered, env_cell),
            pallas_points=make_pallas_points(attrs_d.world_pos,
                                             attrs_d.covered),
        )
        tid_d_out = tid_d
        pair_overflow = pair_overflow + ovf_d
    else:
        depth_d = jnp.ones((height, width), jnp.float32)
        tid_d_out = jnp.full((height, width), -1, jnp.int32)
        color = jnp.zeros((height, width, 3), jnp.float32)

    # ---- 4b. forward objects (z-test against the copied scene depth)
    if meta.has_forward:
        setup_f = triangle_setup(
            tri_clip, width, vp_h,
            two_sided=scene.tri_two_sided,
            valid_mask=tri_valid & (~scene.tri_deferred),
        )
        if not full_frame:
            setup_f = _band_mask_setup(setup_f, y0, height)
        if use_fused:
            f_uv, f_combo, _ = _fused_flags(meta)
            depth, tid_f, planes_f, ovf_f = _raster_vis_fused(
                setup_f,
                lambda cidx: _fused_extra(scene, setup_f, world, n_world,
                                          tri_idx=cidx, need_uv=f_uv,
                                          need_combo=f_combo),
                height, width, config,
                init_depth=depth_d, y0=y0, meta=meta,
            )
            attrs_f = surface_attributes_from_planes(
                scene, planes_f, config, var_ch=meta.tex_channels,
                flat_normal=meta.flat_normal)
        else:
            depth, tid_f, ovf_f = _raster_vis(
                setup_f, height, width, config, init_depth=depth_d, y0=y0,
                band=not full_frame,
            )
            attrs_f = surface_attributes(
                scene, setup_f, tid_f, world, n_world, config, y0=y0,
                var_ch=meta.tex_channels, flat_normal=meta.flat_normal,
            )
        if config.wireframe:
            attrs_f, depth, tid_f = _apply_wireframe(
                attrs_f, depth, tid_f, config, fallback_depth=depth_d
            )
        fwd_mask = tid_f >= 0
        fwd_env_cell = {}
        fwd_color = forward_shade(
            attrs_f, shadowmap, scene, view, config,
            tiled_points=make_tiled(attrs_f.world_pos, attrs_f.covered),
            env_fetch=make_env_fetch(attrs_f.covered, fwd_env_cell),
            pallas_points=make_pallas_points(attrs_f.world_pos,
                                             attrs_f.covered),
        )
        color = jnp.where(fwd_mask[..., None], fwd_color, color)
        pair_overflow = pair_overflow + ovf_f
        if use_env and not env_cell:
            env_cell = fwd_env_cell  # forward-only scenes
    else:
        depth = depth_d
        tid_f = jnp.full((height, width), -1, jnp.int32)

    # ---- 4c. skydome (LESS_OR_EQUAL against current depth)
    if meta.enable_skydome and config.enable_skydome \
            and "nosky" not in config.ablate:
        if use_env and env_cell:
            # The sky texel already rode the env gather; compose it where
            # the fetch selected the sky row (uncovered pixels).
            sky_mask = (
                sky_hit & (sky_depth < depth) & show_env
                & ~env_cell["covered"]
            )
            sky_rgb = gamma_correct(env_cell["sky"][..., :3])
            color = jnp.where(sky_mask[..., None], sky_rgb, color)
            depth = jnp.where(sky_mask, sky_depth, depth)
        elif config.skydome_mode == "analytic":
            color, depth = _skydome_analytic(
                scene, view, depth, color, show_env, height, width, config,
                y0,
            )
        else:
            color, depth = _skydome_mesh(
                scene, view, depth, color, show_env, height, width, config,
                y0, full_frame,
            )

    # ---- 4d. background (fullscreen rect at z=1, LESS_OR_EQUAL)
    if meta.enable_background and config.enable_background:
        if use_env and env_cell:
            bg_rgb = gamma_correct(env_cell["bg"][..., :3])
            bg_mask = (depth >= 1.0) & show_env & ~env_cell["covered"]
            color = jnp.where(bg_mask[..., None], bg_rgb, color)
        else:
            yy = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
                  + y0) / config.height
            xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) \
                / width
            uv = jnp.stack(
                [jnp.broadcast_to(xx, (height, width)),
                 jnp.broadcast_to(yy, (height, width))], -1,
            )
            bg_mask = (depth >= 1.0) & show_env
            if _tap_uses_window(scene.bg_planes, config.background_size):
                tap, _bovf = sample_base_window(
                    scene.bg_planes, uv, bg_mask, config.background_size)
            else:
                tap = sample_base(
                    scene.bg_tex, jnp.zeros((height, width), jnp.int32),
                    uv, config.background_size, quad=True,
                )
            bg_rgb = gamma_correct(tap[..., :3])
            color = jnp.where(bg_mask[..., None], bg_rgb, color)

    aux = {
        "depth": depth,
        "shadowmap": shadowmap,
        "gbuffer_depth": depth_d,
        "tri_id": tid_d_out,
        "forward_tri_id": tid_f,
    }
    if config.validation:
        # The validation-layer analogue (VK_LAYER_KHRONOS_validation +
        # debug messenger, ZeldaEngine.cpp:799-829): opt-in per-frame
        # counters for conditions that otherwise fail silently. Static
        # flag — zero cost when off, exactly like a Vulkan debug build.
        from zeldaengine_tpu.ops.rasterize_pallas import count_oversized

        val = {
            "nonfinite_color": jnp.sum(
                ~jnp.isfinite(color)
            ).astype(jnp.int32),
            "nonfinite_shadowmap": jnp.sum(
                ~jnp.isfinite(shadowmap)
            ).astype(jnp.int32),
            "light_drops": (
                jnp.int32(0) if light_drops is None
                else light_drops.astype(jnp.int32)
            ),
            # Live pairs dropped by the max_pairs capacity slices.
            "pair_overflow": pair_overflow,
        }
        if meta.has_deferred:
            val["oversized_tris"] = count_oversized(
                setup, width, config.height, config.tile_h, config.tile_w,
                config.pair_expand,
            )
        aux["validation"] = val
    color = jnp.clip(color, 0.0, 1.0)
    return color, aux

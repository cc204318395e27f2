"""The shared lighting core of Base.frag:73-117 / BaseLighting.frag:180-235.

Direct (Disney diffuse + GGX specular per light), indirect (Lambert * AO *
0.3 * shadow), and IBL reflection (refract-vector cubemap lookup, Lazarov
env BRDF, x10 intensity). Vectorized over pixel grids; the per-light loop is
a ``lax.fori_loop`` over the padded light table with a count mask — exactly
the reference's dynamic uniform loop, minus the warp divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.texture import sample_cubemap_lod


def direct_lighting(
    diffuse_color,  # (..., 3) BaseColor * (1 - Metallic)
    roughness,  # (...,)
    n,  # (..., 3) shading normal (normalized)
    p,  # (..., 3) world position
    v,  # (..., 3) view vector (normalized, toward camera)
    ndotv,  # (...,)
    shadow_factor,  # (...,)
    dir_lights,  # (Ld, 4, 4) packed lights
    n_dir,  # () int32
    point_lights,  # (Lp, 4, 4)
    n_point,  # () int32
    spot_lights=None,  # (Ls, 4, 4) or None
    n_spot=None,  # () int32
    tiled_points=None,  # (tile_idx, tile_cnt, tile_h, tile_w) or None
    pallas_points=None,  # (tile_idx, tile_cnt, block_h, interpret) or None
):
    """Sum of the light loops (directional applies the shadow factor,
    point lights do not — Base.frag:86 vs :98).

    Spot lights are shaded here even though the reference *declares* but
    never loops ``spotLights[16]`` (Base.frag:15) — a strict superset:
    point-light falloff x a smoothstep cone (cosInner/cosOuter carried in
    the light's ExtraData.xy; defaults 25deg/30deg when unset)."""

    def bxdf_times_radiance(light, kind: str):
        if kind == "dir":
            l_dir = jnp.broadcast_to(pbr.normalize(light[2, :3]), p.shape)
        else:
            l_dir = pbr.normalize(light[0, :3] - p)
        h = pbr.normalize(v + l_dir)
        ldoth = pbr.saturate(jnp.sum(l_dir * h, -1))
        ndoth = pbr.saturate(jnp.sum(n * h, -1))
        ndotl = pbr.saturate(jnp.sum(n * l_dir, -1))
        dif, spec = pbr.default_lit_bxdf(
            diffuse_color, roughness, ldoth, ndotv, ndotl, ndoth
        )
        if kind == "dir":
            radiance = pbr.apply_directional_light(
                jnp.broadcast_to(light[2, :3], p.shape),
                light[1, :3],
                jnp.broadcast_to(light[1, 3], ndotl.shape),
                n,
            )
        else:
            radiance = pbr.apply_point_light(
                light[0, :3],
                light[1, :3],
                jnp.broadcast_to(light[1, 3], ndotl.shape),
                jnp.broadcast_to(light[2, 3], ndotl.shape),
                p,
                n,
            )
            if kind == "spot":
                radiance = radiance * pbr.spot_cone_factor(
                    light[0, :3], light[2, :3], light[3, 0], light[3, 1], p
                )[..., None]
        return radiance * (dif + spec[..., None])

    shape = diffuse_color.shape
    acc = jnp.zeros(shape, jnp.float32)

    # Static unroll for small light capacities: XLA fuses the whole sum
    # into a few VPU passes (a fori_loop forces per-iteration HBM round
    # trips of every (H, W, 3) temporary). Large capacities fall back to
    # the loop to bound compile time.
    UNROLL_LIMIT = 64

    def dir_contrib(i):
        return (
            bxdf_times_radiance(dir_lights[i], "dir")
            * shadow_factor[..., None]
            * jnp.where(i < n_dir, 1.0, 0.0)
        )

    def point_contrib(i):
        return bxdf_times_radiance(point_lights[i], "point") * jnp.where(
            i < n_point, 1.0, 0.0
        )

    def spot_contrib(i):
        return bxdf_times_radiance(spot_lights[i], "spot") * jnp.where(
            i < n_spot, 1.0, 0.0
        )

    def accumulate(acc, table, contrib):
        if table.shape[0] <= UNROLL_LIMIT:
            for i in range(table.shape[0]):
                acc = acc + contrib(i)
            return acc
        return jax.lax.fori_loop(
            0, table.shape[0], lambda i, a: a + contrib(i), acc
        )

    acc = accumulate(acc, dir_lights, dir_contrib)
    if pallas_points is not None:
        # Tile-restricted point lights inside a Pallas kernel: VPU work
        # tracks the culled (light, block) pairs instead of
        # capacity x pixels; accumulates IN ascending light order onto
        # the directional partial sum, so skipped lights (exact-zero
        # falloff beyond radius) leave the sum bit-for-bit intact.
        from zeldaengine_tpu.ops.lighting_pallas import (
            point_lighting_pallas)

        tile_idx, tile_cnt, block_h, interp = pallas_points
        acc = point_lighting_pallas(
            acc, diffuse_color, roughness, n, p, v, ndotv,
            point_lights, tile_idx, tile_cnt, block_h=block_h,
            interpret=interp,
        )
    elif tiled_points is not None:
        tile_idx, tile_cnt, lt_h, lt_w = tiled_points
        acc = acc + _point_lighting_tiled(
            diffuse_color, roughness, n, p, v, ndotv,
            point_lights, tile_idx, tile_cnt, lt_h, lt_w,
        )
    else:
        acc = accumulate(acc, point_lights, point_contrib)
    if spot_lights is not None:
        acc = accumulate(acc, spot_lights, spot_contrib)
    return acc


def cull_point_lights_tiled(
    point_lights,  # (L, 4, 4)
    n_point,  # () int32
    view,  # ViewState (view_proj, camera_fov, viewport)
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    k_max: int,
    y0=0.0,
    vp_h: int | None = None,
    world_pos=None,  # (H, W, 3) visible-surface positions (depth bounds)
    covered=None,  # (H, W) bool — pixels whose world_pos is real
):
    """Per-screen-tile point-light lists: conservative projected-sphere vs
    tile-rect binning + top-k_max compaction.

    The reference carries a 512-point-light capacity (ZeldaEngine.cpp:85)
    and brute-force loops them per pixel (BaseLighting.frag:182-207); this
    is the tiled-deferred culling that makes that capacity usable.
    ``y0``/``height`` select a row band (full-screen pixel coords; the
    multi-chip path culls per band so sharded frames keep tiled lighting
    — round 2 fell back to the 512-iteration per-pixel loop there).
    ``height`` may be any row count: the tile grid covers ceil(h/tile_h)
    rows (the shading side pads and crops to match).

    ``world_pos``/``covered`` add DEPTH BOUNDS (VERDICT r3 #6): each
    tile's visible surface is bounded by a world-space AABB and a light
    is kept only if its sphere reaches that box — strictly stronger than
    the classic per-tile z-min/max (it bounds all three axes), and a
    light fully occluded behind a wall stops eating the k_max slots. A
    tile with no covered pixels keeps no lights (nothing to shade).
    Without them the test is the screen-rect overlap alone.

    Returns (tile_idx (Ty, Tx, K) int32, tile_cnt (Ty, Tx) int32,
    drops () int32 — lights dropped by the per-tile cap).
    """
    vp_h = height if vp_h is None else vp_h  # full-viewport pixel height
    pos = point_lights[:, 0, :3]
    radius = jnp.maximum(point_lights[:, 2, 3], 0.0)
    clip = (
        pos @ view.view_proj[:3, :3].T + view.view_proj[:3, 3]
    )
    w = pos @ view.view_proj[3, :3] + view.view_proj[3, 3]
    safe_w = jnp.maximum(jnp.abs(w), 1e-6)
    cx = (clip[:, 0] / jnp.where(w > 0, safe_w, -safe_w) * 0.5 + 0.5) * width
    cy = (clip[:, 1] / jnp.where(w > 0, safe_w, -safe_w) * 0.5 + 0.5) * vp_h
    # Conservative screen radius from the projection's focal length.
    # NOTE: aspect and the y pixel scale come from the FULL viewport
    # (vp_h), not the band height — the projection doesn't change when a
    # device renders a row band.
    f = 1.0 / jnp.tan(jnp.radians(view.camera_fov) * 0.5)
    aspect = width / vp_h
    rx = radius * (f / aspect) / safe_w * 0.5 * width
    ry = radius * f / safe_w * 0.5 * vp_h
    # Behind/crossing the camera plane: keep everywhere (conservative).
    near_cam = w < radius + 0.1
    lx0 = jnp.where(near_cam, 0.0, cx - rx)
    lx1 = jnp.where(near_cam, float(width), cx + rx)
    ly0 = jnp.where(near_cam, 0.0, cy - ry)
    ly1 = jnp.where(near_cam, float(vp_h), cy + ry)

    n_ty = -(-height // tile_h)
    n_tx = width // tile_w
    tx = jnp.arange(n_tx, dtype=jnp.float32) * tile_w
    ty = jnp.arange(n_ty, dtype=jnp.float32) * tile_h \
        + jnp.asarray(y0, jnp.float32)
    ox = (lx1[:, None] >= tx[None, :]) & (lx0[:, None] <= tx[None, :] + tile_w)
    oy = (ly1[:, None] >= ty[None, :]) & (ly0[:, None] <= ty[None, :] + tile_h)
    live = jnp.arange(point_lights.shape[0]) < n_point
    mask = (
        oy[:, :, None] & ox[:, None, :] & live[:, None, None]
    )  # (L, Ty, Tx)

    if world_pos is not None:
        # Depth bounds: per-tile world-space AABB of the covered pixels,
        # light kept only if dist(sphere center, AABB) <= radius.
        big = 3.0e38
        pad_rows = n_ty * tile_h - world_pos.shape[0]
        wp = world_pos
        cov = covered if covered is not None else jnp.ones(
            world_pos.shape[:2], bool)
        if pad_rows:
            wp = jnp.pad(wp, ((0, pad_rows), (0, 0), (0, 0)))
            cov = jnp.pad(cov, ((0, pad_rows), (0, 0)))
        p5 = wp.reshape(n_ty, tile_h, n_tx, tile_w, 3)
        c5 = cov.reshape(n_ty, tile_h, n_tx, tile_w, 1)
        lo_b = jnp.min(jnp.where(c5, p5, big), axis=(1, 3))  # (Ty,Tx,3)
        hi_b = jnp.max(jnp.where(c5, p5, -big), axis=(1, 3))
        any_cov = cov.reshape(n_ty, tile_h, n_tx, tile_w).any((1, 3))
        gap = jnp.maximum(
            jnp.maximum(lo_b[None] - pos[:, None, None, :],
                        pos[:, None, None, :] - hi_b[None]),
            0.0,
        )  # (L, Ty, Tx, 3)
        dist2 = jnp.sum(gap * gap, axis=-1)
        reach = dist2 <= (radius * radius)[:, None, None]
        mask = mask & reach & any_cov[None]
    mask = jnp.moveaxis(mask, 0, -1)  # (Ty, Tx, L)
    # Compact: light indices with hits first (stable order), capped at K.
    order = jnp.argsort(~mask, axis=-1, stable=True)
    tile_idx = order[..., :k_max].astype(jnp.int32)
    hits = mask.sum(-1)
    tile_cnt = jnp.minimum(hits, k_max).astype(jnp.int32)
    # Lights silently dropped by the per-tile cap (validation counter —
    # the reference's validation-layer analogue surfaces this via
    # FrameStats when EngineConfig.validation is on).
    drops = jnp.sum(jnp.maximum(hits - k_max, 0))
    return tile_idx, tile_cnt, drops


def _point_lighting_tiled(
    diffuse_color, roughness, n, p, v, ndotv,
    point_lights, tile_idx, tile_cnt, tile_h: int, tile_w: int,
):
    """Shade each pixel with its tile's culled light list: a fori_loop over
    the K slots; slot k's light parameters are gathered per tile (a few
    thousand indices) and broadcast over the tile's pixels.

    Row counts that don't divide ``tile_h`` (sharded bands) are padded to
    the tile grid and cropped after."""
    height, width = diffuse_color.shape[:2]
    n_ty, n_tx = tile_idx.shape[:2]
    k_max = tile_idx.shape[2]
    pad_rows = n_ty * tile_h - height
    if pad_rows:
        def padr(a):
            return jnp.pad(a, ((0, pad_rows),) + ((0, 0),) * (a.ndim - 1))

        return _point_lighting_tiled(
            padr(diffuse_color), padr(roughness), padr(n), padr(p),
            padr(v), padr(ndotv), point_lights, tile_idx, tile_cnt,
            tile_h, tile_w,
        )[:height]

    def t5(a, c):
        return a.reshape(n_ty, tile_h, n_tx, tile_w, c)

    dc5 = t5(diffuse_color, 3)
    r5 = t5(roughness, 1)[..., 0]
    n5 = t5(n, 3)
    p5 = t5(p, 3)
    v5 = t5(v, 3)
    nv5 = t5(ndotv, 1)[..., 0]

    def body(k, acc):
        li = tile_idx[:, :, k]  # (Ty, Tx)
        lt = point_lights[li]  # (Ty, Tx, 4, 4)
        on = (k < tile_cnt).astype(jnp.float32)[:, None, :, None]

        def b(x):  # (Ty, Tx) or (Ty, Tx, 3) -> tile-broadcast shape
            if x.ndim == 2:
                return x[:, None, :, None]
            return x[:, None, :, None, :]

        l_dir = pbr.normalize(b(lt[..., 0, :3]) - p5)
        h = pbr.normalize(v5 + l_dir)
        ldoth = pbr.saturate(jnp.sum(l_dir * h, -1))
        ndoth = pbr.saturate(jnp.sum(n5 * h, -1))
        ndotl = pbr.saturate(jnp.sum(n5 * l_dir, -1))
        dif, spec = pbr.default_lit_bxdf(dc5, r5, ldoth, nv5, ndotl, ndoth)
        radiance = pbr.apply_point_light(
            b(lt[..., 0, :3]), b(lt[..., 1, :3]),
            jnp.broadcast_to(b(lt[..., 1, 3]), ndotl.shape),
            jnp.broadcast_to(b(lt[..., 2, 3]), ndotl.shape),
            p5, n5,
        )
        return acc + radiance * (dif + spec[..., None]) * on[..., None]

    # Dynamic trip count: no tile holds more than max(tile_cnt) lights,
    # so slots beyond it are all-masked work. A traced bound turns the
    # loop into a while_loop that stops at the actual per-frame maximum
    # (a 512-capacity scene whose busiest tile sees 6 lights runs 6
    # full-frame light evaluations, not k_max).
    k_dyn = jnp.minimum(jnp.max(tile_cnt), k_max)
    acc = jax.lax.fori_loop(
        0, k_dyn, body,
        jnp.zeros((n_ty, tile_h, n_tx, tile_w, 3), jnp.float32),
    )
    return acc.reshape(height, width, 3)


def _upsample2(a, axis: int, n_out: int):
    """2x bilinear upsample along ``axis`` for a signal sampled at even
    output pixels: out[2i] = a[i], out[2i+1] = (a[i] + a[i+1]) / 2
    (edge-clamped), cropped to ``n_out``."""
    n = a.shape[axis]
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(a, 1, n, axis=axis),
         jax.lax.slice_in_dim(a, n - 1, n, axis=axis)], axis)
    mid = (a + nxt) * 0.5
    out = jnp.stack([a, mid], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = 2 * n
    out = out.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, n_out, axis=axis)


def reflection_color(base_color, metallic, roughness, n, v, ndotv, ao,
                     cube_atlas, cubemap_size, sky_max_mips,
                     specular=0.5, env_fetch=None, ablate: str = "",
                     cube_pair1=None, half: bool = False,
                     cube_const=None):
    """Base.frag:104-112 / BaseLighting.frag:213-221: IBL reflection.

    ``env_fetch(refl_dir, mips) -> (..., >=3)`` overrides the cubemap
    tap — the merged environment table (ops/envtap.py) fetches the
    reflection, sky and background rows in ONE gather.

    ``half`` (config.reflection_half): run the environment GATHER on a
    2x-subsampled pixel grid and bilinearly upsample the radiance — the
    gather is ~all of the reflection cost and rough reflections (cube
    mip >= 1) are low-frequency. BRDF/occlusion math stays full-res."""
    spec = pbr.compute_f0(specular, base_color, metallic)
    brdf = pbr.env_brdf_approx(spec, roughness, ndotv)
    r = pbr.refract(v, pbr.normalize(n), 1.0 / 1.52)
    mips = pbr.reflection_mip_from_roughness(
        roughness, jnp.asarray(sky_max_mips, jnp.float32)
    )
    h_full = w_full = None
    if half and r.ndim == 3 and env_fetch is None:
        h_full, w_full = r.shape[:2]
        r = r[::2, ::2]
        mips = mips[::2, ::2]
    if cube_const is not None and env_fetch is None and (
            not (ablate and "reflgather" in ablate)):
        # Constant-lod tier (scene min roughness == 1.0): the tap the
        # cube_pair1 path would perform is a bilinear over one fixed
        # 2x2-texel mip per face — replicate sample_cubemap_lod +
        # sample_trilinear_pair's exact uv/clamp/lerp math over the
        # precomputed 6x2x2 table (selects instead of a 2M-index
        # 39-channel gather; bit-identical, ~5 ms at 1080p).
        from zeldaengine_tpu.ops.texture import cube_direction_to_face_uv

        face, uv = cube_direction_to_face_uv(r)
        uv = jnp.clip(uv, 0.25, 0.75)  # sample_cubemap_lod half-texel
        u = uv[..., 0] * 2.0 - 0.5
        vv = uv[..., 1] * 2.0 - 0.5
        x0 = jnp.clip(jnp.floor(u), 0.0, 1.0)
        y0 = jnp.clip(jnp.floor(vv), 0.0, 1.0)
        fu = jnp.clip(u - x0, 0.0, 1.0)[..., None]
        fv = jnp.clip(vv - y0, 0.0, 1.0)[..., None]
        x0b = (x0 >= 0.5)[..., None]
        y0b = (y0 >= 0.5)[..., None]
        true_b = jnp.ones_like(x0b)

        def corner(dy, dx):
            # Edge-clamped corner (min(y0+dy,1), min(x0+dx,1)) selected
            # from the per-face 2x2 table — the same clamping the pair
            # atlas bakes into its neighbor groups.
            yi1 = true_b if dy else y0b
            xi1 = true_b if dx else x0b
            out = None
            for f in range(6):
                tab = cube_const[f]  # (2, 2, 3)
                v_ = jnp.where(
                    yi1,
                    jnp.where(xi1, tab[1, 1], tab[1, 0]),
                    jnp.where(xi1, tab[0, 1], tab[0, 0]),
                )
                out = v_ if out is None else jnp.where(
                    (face == f)[..., None], v_, out)
            return out

        t00 = corner(0, 0)
        t10 = corner(0, 1)
        t01 = corner(1, 0)
        t11 = corner(1, 1)
        lo_top = t00 * (1 - fu) + t10 * fu
        lo_bot = t01 * (1 - fu) + t11 * fu
        refl_l = (lo_top * (1 - fv) + lo_bot * fv) * 10.0
        if h_full is not None:
            refl_l = _upsample2(_upsample2(refl_l, 0, h_full), 1, w_full)
        refl_v = pbr.specular_occlusion(ndotv, roughness * roughness, ao)
        return refl_l * refl_v[..., None] * brdf
    if ablate and "reflgather" in ablate:
        # DIAGNOSTIC: constant env radiance (keeps every BRDF/occlusion
        # op, removes only the cubemap/env-table gather) — splits the
        # norefl ablation into its gather and math halves.
        refl_l = jnp.broadcast_to(
            jnp.asarray([0.3, 0.4, 0.5], jnp.float32), r.shape[:-1] + (3,)
        ) + mips[..., None] * 1e-9 + r[..., :3] * 1e-9
    elif env_fetch is not None:
        refl_l = env_fetch(r, mips)[..., :3] * 10.0
    elif cube_pair1 is not None:
        # Low-tier cube (config.cube_low_tier): ONE 39-ch gather into
        # the half-res RGB mip-pair cube — EXACT whenever lod >= 1
        # (roughness >= 0.031 under the reference mip formula; level k
        # of the half-res chain IS cube level k+1, same box-mean chain
        # + bf16 rounding). The scene build only attaches cube_pair1
        # when its minimum material roughness guarantees that, so no
        # runtime fallback exists — a lax.cond fallback measured
        # +13.6 ms as a fusion barrier even when never executed
        # (BASELINE.md round-3h). Shinier scenes keep the full-res quad
        # path below.
        zero_i = jnp.zeros(mips.shape, jnp.int32)
        refl_l = sample_cubemap_lod(
            cube_pair1, zero_i, r, mips - 1.0, cubemap_size // 2,
            quad=False,
        )[..., :3] * 10.0
    else:
        # quad rows (4 x 4ch) need the 4-way select; mip-pair rows (13 x
        # 4ch = 52, 52 % 13 == 0) dispatch to the ONE-gather trilinear —
        # measured 4.5 ms vs 9 ms for the quad layout's two 64-ch
        # gathers (gather cost is per op below ~104 ch; row count and
        # locality are irrelevant — BASELINE.md round-3 gather curve).
        refl_l = sample_cubemap_lod(
            cube_atlas, jnp.zeros(mips.shape, jnp.int32), r, mips,
            cubemap_size, quad=cube_atlas.shape[-1] % 13 != 0,
        )[..., :3] * 10.0
    if h_full is not None:
        refl_l = _upsample2(_upsample2(refl_l, 0, h_full), 1, w_full)
    refl_v = pbr.specular_occlusion(ndotv, roughness * roughness, ao)
    return refl_l * refl_v[..., None] * brdf


def shade_pixels(
    base_color, metallic, roughness, normal, ao, world_pos,
    shadow_factor, view, cube_atlas, cubemap_size, tiled_points=None,
    env_fetch=None, ablate: str = "", cube_pair1=None,
    refl_half: bool = False, cube_const=None, pallas_points=None,
):
    """Full lighting shared by forward and deferred paths.

    ``view`` is a ViewState (passes.view). Returns a dict of the lighting
    terms so callers can compose debug views (SPEC_CONSTANTS switch).

    The 4 push-constant material overrides (XkGlobalConstants
    BasecolorOverride/Metallic/Specular/Roughness, ZeldaEngine.cpp:903-919)
    apply here as multipliers, where the reference's Details panel intends
    them (the reference's shaders declare but never read them).
    """
    ov = getattr(view, "overrides", None)
    if ov is not None:
        base_color = base_color * ov[0]
        metallic = pbr.saturate(metallic * ov[1])
        roughness = jnp.clip(roughness * ov[3], 0.01, 1.0)
        specular = 0.5 * ov[2]
    else:
        specular = 0.5
    n = pbr.normalize(normal)
    v = pbr.normalize(view.camera_pos - world_pos)
    ndotv = pbr.saturate(jnp.sum(n * v, -1))
    diffuse_color = base_color * (1.0 - metallic[..., None])

    if "nodirect" in ablate:  # diagnostic ablation
        direct = jnp.zeros_like(base_color)
    else:
        direct = direct_lighting(
            diffuse_color, roughness, n, world_pos, v, ndotv, shadow_factor,
            view.dir_lights, view.lights_count[0],
            view.point_lights, view.lights_count[1],
            view.spot_lights, view.lights_count[2],
            tiled_points=tiled_points,
            pallas_points=pallas_points,
        )
    indirect = diffuse_color / jnp.pi * (ao * 0.3 * shadow_factor)[..., None]
    if "norefl" in ablate:  # diagnostic ablation
        refl = jnp.zeros_like(base_color)
    else:
        refl = reflection_color(
            base_color, metallic, roughness, n, v, ndotv, ao,
            cube_atlas, cubemap_size, view.lights_count[3],
            specular=specular, env_fetch=env_fetch, ablate=ablate,
            cube_pair1=cube_pair1, half=refl_half,
            cube_const=cube_const,
        )
    return {
        "direct": direct,
        "indirect": indirect,
        "reflection": refl,
        "final": direct + indirect + refl,
        "ndotv": ndotv,
    }

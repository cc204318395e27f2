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
    acc = accumulate(acc, point_lights, point_contrib)
    if spot_lights is not None:
        acc = accumulate(acc, spot_lights, spot_contrib)
    return acc


def reflection_color(base_color, metallic, roughness, n, v, ndotv, ao,
                     cube_atlas, cubemap_size, sky_max_mips,
                     specular=0.5):
    """Base.frag:104-112 / BaseLighting.frag:213-221: IBL reflection."""
    spec = pbr.compute_f0(specular, base_color, metallic)
    brdf = pbr.env_brdf_approx(spec, roughness, ndotv)
    r = pbr.refract(v, pbr.normalize(n), 1.0 / 1.52)
    mips = pbr.reflection_mip_from_roughness(
        roughness, jnp.asarray(sky_max_mips, jnp.float32)
    )
    refl_l = sample_cubemap_lod(
        cube_atlas, jnp.zeros(roughness.shape, jnp.int32), r, mips, cubemap_size
    )[..., :3] * 10.0
    refl_v = pbr.specular_occlusion(ndotv, roughness * roughness, ao)
    return refl_l * refl_v[..., None] * brdf


def shade_pixels(
    base_color, metallic, roughness, normal, ao, world_pos,
    shadow_factor, view, cube_atlas, cubemap_size,
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

    direct = direct_lighting(
        diffuse_color, roughness, n, world_pos, v, ndotv, shadow_factor,
        view.dir_lights, view.lights_count[0],
        view.point_lights, view.lights_count[1],
        view.spot_lights, view.lights_count[2],
    )
    indirect = diffuse_color / jnp.pi * (ao * 0.3 * shadow_factor)[..., None]
    refl = reflection_color(
        base_color, metallic, roughness, n, v, ndotv, ao,
        cube_atlas, cubemap_size, view.lights_count[3],
        specular=specular,
    )
    return {
        "direct": direct,
        "indirect": indirect,
        "reflection": refl,
        "final": direct + indirect + refl,
        "ndotv": ndotv,
    }

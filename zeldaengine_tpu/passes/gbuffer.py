"""Surface-attribute resolution and GBuffer packing.

The deferred GBuffer layout matches BaseScene.frag:43-47 / XkGBuffer
(ZeldaEngine.cpp:1294-1369):

  scene_color: (H, W, 4) Emissive.rgb, Mask.r
  gbuffer_a:   (H, W, 4) Normal * 0.5 + 0.5, 1
  gbuffer_b:   (H, W, 4) Metallic, 1.0 (Specular), Roughness, 1
  gbuffer_c:   (H, W, 4) BaseColor.rgb, AO
  gbuffer_d:   (H, W, 4) WorldPos.xyz, 1

Attribute interpolation is the deferred half of the visibility-buffer
design: one gather of the winning triangle's data per pixel, then analytic
screen-space derivatives (exact, replacing dFdx/dFdy quads) feed the TBN
normal mapping and texture LOD.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.rasterize import TriangleSetup, _pixel_grid
from zeldaengine_tpu.ops.texture import sample_trilinear_packed


class SurfaceAttributes(NamedTuple):
    covered: jnp.ndarray  # (H, W) bool
    world_pos: jnp.ndarray  # (H, W, 3)
    normal: jnp.ndarray  # (H, W, 3) mapped shading normal (TBN + normal map)
    vertex_color: jnp.ndarray  # (H, W, 3)
    base_color: jnp.ndarray  # (H, W, 3)
    metallic: jnp.ndarray  # (H, W)
    roughness: jnp.ndarray  # (H, W) (max 0.01 applied)
    ao: jnp.ndarray  # (H, W)
    emissive: jnp.ndarray  # (H, W, 3)
    mask: jnp.ndarray  # (H, W)
    # Minimum barycentric weight of the covering triangle (0 at edges):
    # drives the wireframe debug mode (ENABLE_WIREFRAME / polygonMode
    # LINE, ZeldaEngine.cpp:90, :5108-5110). None when not computed.
    bary_min: jnp.ndarray | None = None


def surface_attributes(
    scene,
    setup: TriangleSetup,
    tri_id: jnp.ndarray,
    pair_world: jnp.ndarray,
    pair_normal_world: jnp.ndarray,
    config: EngineConfig,
    y0=0.0,
    var_ch=None,
    flat_normal: bool = False,
) -> SurfaceAttributes:
    """Resolve per-pixel surface attributes from a visibility buffer.

    Gather-lean layout (3 gathers per pixel): ONE 64-float triangle record
    carrying edge coefficients, material id and all three corners'
    interpolants, then TWO taps of the neighborhood-packed 16-channel
    supertexture (each tap returns the full 2x2 bilinear footprint of
    every material texture at one mip level).
    """
    height, width = tri_id.shape
    covered = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)

    # ONE 64-wide record gather per pixel: edge coefficients (9), the
    # material id AS A FLOAT VALUE (0.0-63.0 — NOT a bitcast: ids 1..63
    # bitcast to f32 denormals, and the TPU flushes denormals to zero
    # somewhere in this record's concat/gather pipeline, which silently
    # remapped every non-zero material to material 0 on real hardware),
    # and all three corners' interpolants (uv2+color3 static, world pos 3
    # + world normal 3) packed per triangle on the (cheap, O(T)) host
    # side of the frame.
    n_t = setup.edge.shape[0]
    pair_all = jnp.concatenate(
        [
            scene.pair_static[:, :5],  # uv(2) col(3)
            pair_world,  # (3)
            pair_normal_world,  # (3)
        ],
        axis=1,
    )  # (P, 11)
    corners = pair_all[scene.tri_vtx[:n_t]]  # (T, 3, 11)
    rec = jnp.concatenate(
        [
            setup.edge.reshape(n_t, 9),
            scene.tri_meta[:n_t, 3:4].astype(jnp.float32),
            corners.reshape(n_t, 33),
            jnp.zeros((n_t, 21), jnp.float32),
        ],
        axis=1,
    )  # (T, 64)
    r = rec[tid]  # (H, W, 64)
    edge = r[..., :9].reshape(height, width, 3, 3)
    mat_id = jnp.round(r[..., 9]).astype(jnp.int32)
    corner_px = r[..., 10:43].reshape(height, width, 3, 11)

    px, py = _pixel_grid(height, width, y0=y0)
    u = edge[..., 0] * px[..., None] + edge[..., 1] * py[..., None] + edge[..., 2]
    esum = jnp.sum(u, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(esum) > 1e-20, esum, 1.0)
    # Uncovered pixels interpolate record[0] evaluated far outside the
    # triangle: 1/esum amplifies sub-ULP backend differences into visible
    # garbage in debug views and the PCF inputs. Zero the weights instead
    # (deterministic black; the lit path masks these pixels anyway).
    inv = jnp.where(covered, inv, 0.0)
    bary = u * inv[..., None]  # (H, W, 3)
    # d(bary)/dx = (A_x - bary * sum(A_x)) / esum  (quotient rule)
    ax = edge[..., 0]
    ay = edge[..., 1]
    dbary_dx = (ax - bary * jnp.sum(ax, -1, keepdims=True)) * inv[..., None]
    dbary_dy = (ay - bary * jnp.sum(ay, -1, keepdims=True)) * inv[..., None]

    def mix(weights):
        # fp32: TPU einsum defaults to bf16, far too coarse for world-space
        # positions feeding the shadow compare.
        return jnp.einsum("hwk,hwkc->hwc", weights, corner_px,
                          precision=jax.lax.Precision.HIGHEST)

    a_i = mix(bary)
    a_dx = mix(dbary_dx)
    a_dy = mix(dbary_dy)
    uv = a_i[..., 0:2]
    vertex_color = a_i[..., 2:5]
    world_pos = a_i[..., 5:8]
    frag_normal = a_i[..., 8:11]
    dpos_dx = a_dx[..., 5:8]
    dpos_dy = a_dy[..., 5:8]
    duv_dx = a_dx[..., 0:2]
    duv_dy = a_dy[..., 0:2]

    # Texture LOD from the analytic uv footprint (texture() semantics).
    ts = float(config.texture_size)
    foot = jnp.maximum(
        jnp.sum(duv_dx * duv_dx, -1), jnp.sum(duv_dy * duv_dy, -1)
    )
    lod = 0.5 * jnp.log2(jnp.maximum(foot * ts * ts, 1e-12))
    lod = jnp.maximum(lod, 0.0)

    # Trilinear sample of the mip-pair-packed 208-channel supertexture:
    # ONE gather per pixel returns every material texture's 2x2 bilinear
    # footprint at level l plus the 3x3 at level l+1.
    combo = scene.mat_combined[mat_id]  # (H, W)
    bary_min = jnp.where(covered, jnp.min(bary, axis=-1), 0.0)
    return _finish_attributes(
        scene, config, covered, combo, uv, lod, vertex_color, world_pos,
        frag_normal, duv_dx, duv_dy, dpos_dx, dpos_dy, bary_min=bary_min,
        var_ch=var_ch, flat_normal=flat_normal,
    )


def _material_texels(scene, config, combo, uv, lod, var_ch):
    """The per-pixel material fetch: ONE mip-pair gather over the
    VARYING channels + per-combo constants for the rest (constant-slot
    elision — gather cost tracks channel count, and default PBR slots
    are spatially constant). Returns (H, W, 13) in the canonical channel
    order [bc.rgb, nrm.rgb, em.rgb, metallic, roughness, ao, mask].

    ``var_ch`` = SceneMeta.tex_channels (None = legacy full-16 atlas)."""
    if scene.mat_const is None:
        return sample_trilinear_packed(
            scene.combined_atlas, combo, uv, lod, config.texture_size
        )  # (H, W, 16) — legacy full-16 atlas
    assert var_ch is not None, (
        "scene was built with constant-slot elision; pass "
        "var_ch=SceneMeta.tex_channels"
    )
    n_var = scene.combined_atlas.shape[-1] // 13
    assert n_var == max(len(var_ch), 1), (n_var, var_ch)
    tex_var = None
    if var_ch:
        tex_var = sample_trilinear_packed(
            scene.combined_atlas, combo, uv, lod, config.texture_size
        )  # (H, W, len(var_ch))
    var_set = set(var_ch)
    const_ch = [c for c in range(13) if c not in var_set]
    mc = scene.mat_const.shape[0]
    if const_ch:
        table = scene.mat_const[:, const_ch]  # (Mc, k2)
        if mc == 1:
            cvals = jnp.broadcast_to(table[0], combo.shape + table.shape[1:])
        elif mc <= 8:
            # Select chain beats a per-pixel gather at few combos.
            cvals = jnp.broadcast_to(table[0], combo.shape + table.shape[1:])
            for i in range(1, mc):
                cvals = jnp.where((combo == i)[..., None], table[i], cvals)
        else:
            cvals = table[combo]
    chans = []
    vi = 0
    ci = 0
    for c in range(13):
        if c in var_set:
            chans.append(tex_var[..., vi])
            vi += 1
        else:
            chans.append(cvals[..., ci])
            ci += 1
    return jnp.stack(chans, axis=-1)


def _finish_attributes(scene, config, covered, combo, uv, lod, vertex_color,
                       world_pos, frag_normal, duv_dx, duv_dy, dpos_dx,
                       dpos_dy, bary_min=None,
                       var_ch=None,
                       flat_normal: bool = False) -> SurfaceAttributes:
    """Texture tap + TBN shared by the gather path and the fused-kernel
    path (identical math; the fused kernel only replaces how the
    interpolants were produced)."""
    if "lodprobe" in config.ablate:
        # DIAGNOSTIC: encode the texture-tap inputs in base_color so a
        # host-side probe (tools/tex_lod_probe.py) can histogram the
        # real per-pixel lod/combo distribution from a rendered frame.
        texels = jnp.zeros(uv.shape[:2] + (16,), jnp.float32)
        texels = texels.at[..., 0].set(lod / 16.0)
        texels = texels.at[..., 1].set(combo.astype(jnp.float32) / 64.0)
        texels = texels.at[..., 2].set(covered.astype(jnp.float32))
        texels = texels.at[..., 10].set(1.0)
    elif "notex" in config.ablate:  # diagnostic ablation
        texels = jnp.broadcast_to(
            jnp.asarray([0.5] * 3 + [0.5, 0.5, 1.0] + [0.0] * 3
                        + [0.0, 0.8, 1.0, 1.0] + [0.0] * 3, jnp.float32),
            uv.shape[:2] + (16,),
        ) + lod[..., None] * 1e-9
    else:
        texels = _material_texels(scene, config, combo, uv, lod, var_ch)
    base_color = texels[..., 0:3]
    tex_normal = texels[..., 3:6]
    emissive = texels[..., 6:9]
    metallic = pbr.saturate(texels[..., 9])
    roughness = jnp.maximum(0.01, pbr.saturate(texels[..., 10]))
    ao = texels[..., 11]
    mask = texels[..., 12]

    if flat_normal:
        # NOTE: this shortcut is currently NEVER taken (SceneMeta keeps
        # it False). The reference's TBN normalizes the map value
        # BEFORE the 2x-1 remap (Common.glsl:126 quirk), so even the
        # flat default normal (0.5, 0.5, 1) TILTS the shading normal
        # along the uv-derived tangent frame: normalize(2 *
        # normalize((.5,.5,1)) - 1) != +Z. Goldens caught a round-5
        # attempt to elide the TBN for flat maps (54% of demo pixels
        # off) — kept only for a hypothetical scene whose constant map
        # value is exactly tangent-space +Z after that quirk.
        normal = pbr.normalize(frag_normal)
    else:
        normal = pbr.compute_tangent_normal(
            dpos_dx, dpos_dy, duv_dx, duv_dy, frag_normal, tex_normal
        )

    return SurfaceAttributes(
        covered=covered,
        world_pos=world_pos,
        normal=normal,
        vertex_color=vertex_color,
        base_color=base_color,
        metallic=metallic,
        roughness=roughness,
        ao=ao,
        emissive=emissive,
        mask=mask,
        bary_min=bary_min,
    )


def surface_attributes_from_planes(
    scene, planes: jnp.ndarray, config: EngineConfig, var_ch=None,
    flat_normal: bool = False,
) -> SurfaceAttributes:
    """Build SurfaceAttributes from the fused kernel's (ATTR_CH, H, W)
    output planes (ops/rasterize_pallas.py ATTR_CH layout): the kernel
    already did the record fetch, interpolation and analytic derivatives
    in VMEM; only the texture tap + TBN remain here."""

    if "noattrs" in config.ablate:
        # DIAGNOSTIC: constant attrs (keep only a scalar tap into the
        # planes so the kernel still runs) — isolates the plane->HWC
        # relayout + TBN + texture tap from the raster kernel cost.
        h, w = planes.shape[1:]
        z1 = planes[0] * 1e-9
        v3 = jnp.stack([z1, z1, z1 + 1.0], -1)
        return SurfaceAttributes(
            covered=planes[0] > 0.5, world_pos=v3, normal=v3,
            vertex_color=v3, base_color=v3 * 0.5, metallic=z1,
            roughness=z1 + 0.5, ao=z1 + 1.0, emissive=v3 * 0.0,
            mask=z1 + 1.0, bary_min=z1,
        )

    def v(lo, hi):  # channel-major -> (H, W, C)
        return jnp.moveaxis(planes[lo:hi], 0, -1)

    covered = planes[0] > 0.5
    # Plane 0 packs covered (+1.0) with the min barycentric weight.
    bary_min = jnp.maximum(planes[0] - 1.0, 0.0)
    # Combo rides as a float VALUE (not a bitcast — TPU flushes denormal
    # bit patterns); round back to the layer index.
    combo = jnp.round(planes[1]).astype(jnp.int32)
    return _finish_attributes(
        scene, config, covered, combo,
        uv=v(2, 4), lod=planes[4], vertex_color=v(5, 8),
        world_pos=v(8, 11), frag_normal=v(11, 14),
        duv_dx=v(14, 16), duv_dy=v(16, 18),
        dpos_dx=v(18, 21), dpos_dy=v(21, 24), bary_min=bary_min,
        var_ch=var_ch, flat_normal=flat_normal,
    )


class GBuffer(NamedTuple):
    scene_color: jnp.ndarray
    gbuffer_a: jnp.ndarray
    gbuffer_b: jnp.ndarray
    gbuffer_c: jnp.ndarray
    gbuffer_d: jnp.ndarray
    depth: jnp.ndarray


def pack_gbuffer(attrs: SurfaceAttributes, depth: jnp.ndarray) -> GBuffer:
    """BaseScene.frag:43-47; uncovered pixels = clear values (zeros)."""
    m = attrs.covered[..., None]
    n_packed = (pbr.normalize(attrs.normal) + 1.0) * 0.5
    # Quantize like the A2R10G10B10 / RGBA8 attachments the reference uses.
    n_packed = jnp.round(n_packed * 1023.0) / 1023.0

    def q8(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0

    scene_color = jnp.where(
        m,
        jnp.concatenate([q8(attrs.emissive), q8(attrs.mask)[..., None]], -1),
        0.0,
    )
    ga = jnp.where(
        m, jnp.concatenate([n_packed, jnp.ones_like(n_packed[..., :1])], -1), 0.0
    )
    gb = jnp.where(
        m,
        jnp.stack(
            [
                q8(attrs.metallic),
                jnp.ones_like(attrs.metallic),
                q8(attrs.roughness),
                jnp.ones_like(attrs.metallic),
            ],
            -1,
        ),
        0.0,
    )
    gc = jnp.where(
        m, jnp.concatenate([q8(attrs.base_color), q8(attrs.ao)[..., None]], -1), 0.0
    )
    gd = jnp.where(
        m,
        jnp.concatenate(
            [attrs.world_pos, jnp.ones_like(attrs.world_pos[..., :1])], -1
        ),
        0.0,
    )
    return GBuffer(
        scene_color=scene_color,
        gbuffer_a=ga,
        gbuffer_b=gb,
        gbuffer_c=gc,
        gbuffer_d=gd,
        depth=depth,
    )

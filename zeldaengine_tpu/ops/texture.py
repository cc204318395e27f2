"""Texture storage and sampling.

Replaces the reference's texture factory + samplers
(RHICreateTextureResource ZeldaEngine.cpp:5855, RHIGenerateMipmaps :6348,
RHICreateSampler :6523 — repeat addressing, trilinear mips).

TPU-native design: all 2D textures of a pool share one square size and live
in a single **mip atlas** array of shape (N, H, 2W, C). Level 0 occupies
x in [0, W); level k >= 1 occupies x in [W * (2 - 2^(1-k)), ...), y from 0.
Mip offsets are static constants, so a trilinear sample with per-pixel LOD
is pure index arithmetic + one batched gather per tap — no per-level
control flow. Cubemaps are 6 consecutive layers in their own pool.

Mip generation is 2x2 box filtering (the practical equivalent of the
reference's repeated vkCmdBlitImage linear-filter chain).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def mip_count(size: int) -> int:
    return int(size).bit_length()


def mip_offset_x(level: int, base: int) -> int:
    """X offset of a mip level inside the (H, 2W) atlas."""
    if level == 0:
        return 0
    return int(base * (2.0 - 2.0 ** (1 - level)) + 0.5)


def build_mip_atlas(images: np.ndarray) -> np.ndarray:
    """Pack (N, S, S, C) base images into (N, S, 2S, C) mip atlases.

    Box-filter downsampling; S must be a power of two.
    """
    images = np.asarray(images, np.float32)
    n, s, s2, c = images.shape
    assert s == s2 and (s & (s - 1)) == 0, "textures must be square pow2"
    atlas = np.zeros((n, s, 2 * s, c), np.float32)
    atlas[:, :, :s] = images
    level = images
    size = s
    lv = 1
    while size > 1:
        level = level.reshape(n, size // 2, 2, size // 2, 2, c).mean(axis=(2, 4))
        size //= 2
        off = mip_offset_x(lv, s)
        atlas[:, :size, off : off + size] = level
        lv += 1
    return atlas


def _mip_offsets_table(base: int) -> jnp.ndarray:
    return jnp.asarray(
        [mip_offset_x(l, base) for l in range(mip_count(base))], jnp.float32
    )


def _gather_texel(atlas: jnp.ndarray, layer, ix, iy):
    """atlas (N, H, WA, C); integer indices broadcast to pixel shape.

    Flattened to a 1-D row gather: XLA's multi-start-index gather is ~4x
    slower per tap on TPU than a single flat index (measured 2026-08-16),
    and the row-major collapse reshape is free."""
    n, h, w, c = atlas.shape
    flat = atlas.reshape(n * h * w, c)
    idx = (layer * h + iy) * w + ix
    return flat[idx]


def sample_bilinear_level(atlas: jnp.ndarray, layer, uv, level, base: int):
    """One bilinear tap at an integer mip ``level`` (traced, per-pixel).

    uv uses GL repeat addressing. Returns (..., C).
    """
    lvl = jnp.asarray(level, jnp.int32)
    size_f = (jnp.asarray(base, jnp.float32) / jnp.exp2(lvl.astype(jnp.float32)))
    size_f = jnp.maximum(jnp.floor(size_f + 0.5), 1.0)
    offs = _mip_offsets_table(base)[jnp.clip(lvl, 0, mip_count(base) - 1)]

    u = uv[..., 0] * size_f - 0.5
    v = uv[..., 1] * size_f - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    size_i = size_f.astype(jnp.int32)

    def wrap(i):
        return jnp.mod(i.astype(jnp.int32), size_i)

    x0 = wrap(u0)
    x1 = wrap(u0 + 1)
    y0 = wrap(v0)
    y1 = wrap(v0 + 1)
    ox = offs.astype(jnp.int32)
    layer = jnp.asarray(layer, jnp.int32)
    t00 = _gather_texel(atlas, layer, x0 + ox, y0)
    t10 = _gather_texel(atlas, layer, x1 + ox, y0)
    t01 = _gather_texel(atlas, layer, x0 + ox, y1)
    t11 = _gather_texel(atlas, layer, x1 + ox, y1)
    return (
        t00 * (1 - fu) * (1 - fv)
        + t10 * fu * (1 - fv)
        + t01 * (1 - fu) * fv
        + t11 * fu * fv
    )


def sample_trilinear(atlas: jnp.ndarray, layer, uv, lod, base: int):
    """textureLod with trilinear filtering; lod is per-pixel float."""
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, mip_count(base) - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    a = sample_bilinear_level(atlas, layer, uv, l0.astype(jnp.int32), base)
    b = sample_bilinear_level(
        atlas, layer, uv, jnp.minimum(l0 + 1, mip_count(base) - 1).astype(jnp.int32),
        base,
    )
    return a * (1 - frac) + b * frac


def _is_packed(atlas: jnp.ndarray) -> bool:
    """Neighborhood-packed atlases carry 4x (2x2 footprint) or 13x
    (mip-pair footprint) the base channels; plain RGBA atlases have C=4."""
    return atlas.shape[-1] >= 16


def _packed_base_channels(c_all: int) -> int:
    """Base channel count of a packed atlas row.

    Mip-pair rows hold 13 groups (2x2 at level l + 3x3 at l+1), plain
    packed rows hold 4 (2x2). Base channels are 4 or 16, so the counts
    (52/208 vs 16/64) never collide."""
    if c_all % 13 == 0:
        return c_all // 13
    return c_all // 4


def sample_base(atlas: jnp.ndarray, layer, uv, base: int,
                quad: bool = False):
    """Bilinear tap at mip 0 (``texture()`` without explicit derivatives,
    as the GBuffer pass effectively uses for magnified textures)."""
    if quad or _is_packed(atlas):
        return sample_bilinear_level_packed(
            atlas, layer, uv, jnp.zeros((), jnp.int32), base, quad=quad
        )
    return sample_bilinear_level(atlas, layer, uv, jnp.zeros((), jnp.int32), base)


# ------------------------------------------------------------------- cubemap


def cube_direction_to_face_uv(d):
    """GL/Vulkan cube face selection. d: (..., 3) direction (need not be
    normalized). Returns (face (...,) int32, uv (..., 2))."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    eps = 1e-20
    # face indices: 0:+X 1:-X 2:+Y 3:-Y 4:+Z 5:-Z
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, eps)
    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    return face, jnp.stack([u, v], -1)


def sample_cubemap_lod(cube_atlas: jnp.ndarray, cube_index, direction, lod,
                       base: int, quad: bool = False):
    """textureLod(samplerCube, dir, lod).

    cube_atlas: (6 * n_cubemaps, S, 2S, C) — faces are consecutive layers
    (+X, -X, +Y, -Y, +Z, -Z), matching the reference's cubemap_X0..Z5 PNG
    layer order (ZeldaEngine.cpp:2692-2701).
    Face-edge filtering is clamped per-face (seam-approximate).
    """
    face, uv = cube_direction_to_face_uv(direction)
    # Clamp uv so bilinear taps don't wrap to the opposite edge of a face.
    size_f = jnp.maximum(
        jnp.asarray(base, jnp.float32)
        / jnp.exp2(jnp.clip(jnp.floor(lod), 0, mip_count(base) - 1)),
        1.0,
    )
    half = 0.5 / size_f
    uv = jnp.clip(uv, half[..., None], 1.0 - half[..., None])
    layer = jnp.asarray(cube_index, jnp.int32) * 6 + face
    if quad or _is_packed(cube_atlas):
        return sample_trilinear_packed(cube_atlas, layer, uv, lod, base,
                                       quad=quad)
    return sample_trilinear(cube_atlas, layer, uv, lod, base)


# ------------------------------------------------- neighborhood-packed atlas


def build_packed_mip_atlas(images: np.ndarray) -> np.ndarray:
    """Pack (N, S, S, C) images into (N, S, 2S, 4C) mip atlases where each
    texel row also carries its +x, +y and +x+y neighbors (edge-clamped).

    One gather then returns the full 2x2 bilinear footprint — TPU gathers
    cost per index, and rows up to 128 floats are free.
    """
    images = np.asarray(images, np.float32)
    n, s, s2, c = images.shape
    assert s == s2 and (s & (s - 1)) == 0

    def neighborhood(level):  # (n, sz, sz, c) -> (n, sz, sz, 4c)
        xp = np.minimum(np.arange(level.shape[2]) + 1, level.shape[2] - 1)
        yp = np.minimum(np.arange(level.shape[1]) + 1, level.shape[1] - 1)
        return np.concatenate(
            [
                level,
                level[:, :, xp],
                level[:, yp, :],
                level[:, yp][:, :, xp],
            ],
            axis=-1,
        )

    atlas = np.zeros((n, s, 2 * s, 4 * c), np.float32)
    level = images
    size = s
    lv = 0
    while True:
        off = mip_offset_x(lv, s)
        atlas[:, :size, off : off + size] = neighborhood(level)
        if size == 1:
            break
        level = level.reshape(n, size // 2, 2, size // 2, 2, c).mean(
            axis=(2, 4)
        )
        size //= 2
        lv += 1
    return atlas


def build_mip_pair_atlas(images: np.ndarray) -> np.ndarray:
    """Pack (N, S, S, C) images into (N, S, 2S, 13C) mip atlases where each
    texel row carries its full 2x2 bilinear footprint at its own level
    PLUS the 3x3 footprint at the next level, anchored at
    (x//2 - 1, y//2 - 1) — which covers the next level's 2x2 bilinear
    window for every sub-texel position.

    A trilinear sample then needs ONE gather per pixel. TPU gathers cost
    per gather op (~5 ms per 2M-pixel pass, and super-additive when
    several land in one program — measured 12 ms for one packed tap vs
    43 ms for two); row width up to ~256 B is nearly free.
    """
    images = np.asarray(images, np.float32)
    n, s, s2_, c = images.shape
    assert s == s2_ and (s & (s - 1)) == 0

    levels = [images]
    size = s
    while size > 1:
        size //= 2
        levels.append(
            levels[-1].reshape(n, size, 2, size, 2, c).mean(axis=(2, 4))
        )

    # In-place group writes + a thread pool over (level, group): the 13
    # fancy-index expansions are independent slab writes into disjoint
    # channel ranges (~1 GB at demo scale — the single-threaded
    # concat-per-level version was the scene build's top cost).
    from concurrent.futures import ThreadPoolExecutor

    atlas = np.zeros((n, s, 2 * s, 13 * c), np.float32)

    def write_group(lv, g):
        level = levels[lv]
        size = level.shape[1]
        nxt = levels[min(lv + 1, len(levels) - 1)]
        sn = nxt.shape[1]
        x = np.arange(size)
        y = np.arange(size)
        off = mip_offset_x(lv, s)
        dst = atlas[:, :size, off : off + size, g * c : (g + 1) * c]
        if g == 0:
            dst[:] = level
        elif g == 1:
            xp = np.minimum(x + 1, size - 1)
            dst[:] = level[:, :, xp]
        elif g == 2:
            yp = np.minimum(y + 1, size - 1)
            dst[:] = level[:, yp, :]
        elif g == 3:
            xp = np.minimum(x + 1, size - 1)
            yp = np.minimum(y + 1, size - 1)
            dst[:] = level[:, yp][:, :, xp]
        else:
            dy, dx = divmod(g - 4, 3)
            gy = np.clip(y // 2 - 1 + dy, 0, sn - 1)
            gx = np.clip(x // 2 - 1 + dx, 0, sn - 1)
            dst[:] = nxt[:, gy][:, :, gx]

    tasks = [(lv, g) for lv in range(len(levels)) for g in range(13)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda t: write_group(*t), tasks))
    return atlas


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def build_mip_pair_atlas_device(images, out_dtype=jnp.bfloat16):
    """``build_mip_pair_atlas`` on DEVICE (jnp, jitted): the NumPy
    builder writes ~1 GB of host memory at demo scale (~1-2.5 s, the
    dominant cold scene-build cost); on device the same gathers/means are
    milliseconds, the upload is just the (N, S, S, C) source images, and
    the result is born device-resident where the sampler needs it."""
    images = jnp.asarray(images, jnp.float32)
    n, s, s2_, c = images.shape
    assert s == s2_ and (s & (s - 1)) == 0

    levels = [images]
    size = s
    while size > 1:
        size //= 2
        levels.append(
            levels[-1].reshape(n, size, 2, size, 2, c).mean(axis=(2, 4))
        )

    cols = []
    for lv, level in enumerate(levels):
        size = level.shape[1]
        nxt = levels[min(lv + 1, len(levels) - 1)]
        sn = nxt.shape[1]
        x = jnp.arange(size)
        y = jnp.arange(size)
        xp = jnp.minimum(x + 1, size - 1)
        yp = jnp.minimum(y + 1, size - 1)
        groups = [level, level[:, :, xp], level[:, yp, :],
                  level[:, yp][:, :, xp]]
        for dy in range(3):
            gy = jnp.clip(y // 2 - 1 + dy, 0, sn - 1)
            for dx in range(3):
                gx = jnp.clip(x // 2 - 1 + dx, 0, sn - 1)
                groups.append(nxt[:, gy][:, :, gx])
        block = jnp.concatenate(groups, axis=-1)
        off = mip_offset_x(lv, s)
        pad_l = off
        pad_r = 2 * s - off - size
        cols.append(jnp.pad(
            block, ((0, 0), (0, s - size), (0, 0), (0, 0))
        ))
        # Horizontal placement happens by summed scatter below; keep
        # per-level blocks padded to full height.
        cols[-1] = jnp.pad(cols[-1], ((0, 0), (0, 0), (pad_l, pad_r),
                                      (0, 0)))
    atlas = cols[0]
    for b in cols[1:]:
        atlas = atlas + b  # mip regions are disjoint in x
    return atlas.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def build_quad_packed_atlas_device(images, out_dtype=jnp.bfloat16):
    """``build_quad_packed_atlas`` on device (see the NumPy twin)."""
    images = jnp.asarray(images, jnp.float32)
    n, s, s2_, c = images.shape
    assert s == s2_ and (s & (s - 1)) == 0

    levels = [images]
    size = s
    while size > 1:
        size //= 2
        levels.append(
            levels[-1].reshape(n, size, 2, size, 2, c).mean(axis=(2, 4))
        )
    blocks = []
    for lv, level in enumerate(levels):
        size = level.shape[1]
        x = jnp.arange(size)
        y = jnp.arange(size)
        xp = jnp.minimum(x + 1, size - 1)
        yp = jnp.minimum(y + 1, size - 1)
        block = jnp.concatenate(
            [level, level[:, :, xp], level[:, yp, :],
             level[:, yp][:, :, xp]], axis=-1,
        )
        off = mip_offset_x(lv, s)
        block = jnp.pad(block, ((0, 0), (0, s - size), (0, 0), (0, 0)))
        blocks.append(jnp.pad(
            block, ((0, 0), (0, 0), (off, 2 * s - off - size), (0, 0))
        ))
    packed = blocks[0]
    for b in blocks[1:]:
        packed = packed + b
    n_, s_, w2, c4 = packed.shape
    return packed.reshape(n_, s_, w2 // 4, 4 * c4).astype(out_dtype)


def _np_to_dtype(a: np.ndarray, out_dtype):
    """Host-side dtype cast matching XLA's convert (bf16 = round-to-
    nearest-even via ml_dtypes)."""
    if out_dtype in (jnp.bfloat16, "bfloat16"):
        import ml_dtypes

        return np.asarray(a, ml_dtypes.bfloat16)
    return np.asarray(a, np.dtype(out_dtype))


def build_mip_pair_atlas_host(images, out_dtype=jnp.bfloat16):
    """First-touch mip-pair atlas build on the HOST (NumPy; returns a
    NumPy array — the caller uploads once and saves the host bytes to
    the disk tier without a device round trip).

    The jitted device twin measured a 554.8 s XLA COMPILE for the
    (1, 256, 256, 1) demo shape on a cold compilation cache (BASELINE.md
    round 4) — two orders of magnitude over the whole NumPy build. Cold
    scene builds therefore pack on host; the content-hash device/disk
    caches (scenebuild.cached_atlas) still make repeat builds free, and
    because every backend consumes the same cached bytes, CPU/TPU golden
    parity is unaffected by host-vs-XLA ULP differences in the mip means.
    """
    return _np_to_dtype(
        build_mip_pair_atlas(np.asarray(images, np.float32)), out_dtype)


def build_quad_packed_atlas_host(images, out_dtype=jnp.bfloat16):
    """``build_quad_packed_atlas`` + cast, on host (see the mip-pair
    host builder for why first-touch builds avoid the jitted twins)."""
    return _np_to_dtype(
        build_quad_packed_atlas(np.asarray(images, np.float32)),
        out_dtype)


def build_quad_pair_atlas_host(images, out_dtype=jnp.bfloat16):
    pair = build_mip_pair_atlas(np.asarray(images, np.float32))
    n, s, w2, c13 = pair.shape
    return _np_to_dtype(pair.reshape(n, s, w2 // 4, 4 * c13), out_dtype)


def sample_trilinear_pair(atlas13: jnp.ndarray, layer, uv, lod, base: int):
    """Trilinear from a mip-pair atlas: ONE gather per pixel.

    Matches sample_trilinear (repeat addressing, clamp at mip borders,
    linear mip blend) — the level-(l+1) 2x2 window is selected out of the
    stored 3x3 with binary row/column selects."""
    c13 = atlas13.shape[-1]
    c = c13 // 13
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, mip_count(base) - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    lvl = l0.astype(jnp.int32)

    size_f = jnp.asarray(base, jnp.float32) / jnp.exp2(l0)
    size_f = jnp.maximum(jnp.floor(size_f + 0.5), 1.0)
    offs = _mip_offsets_table(base)[jnp.clip(lvl, 0, mip_count(base) - 1)]

    uw = uv[..., 0] - jnp.floor(uv[..., 0])
    vw = uv[..., 1] - jnp.floor(uv[..., 1])
    u = uw * size_f - 0.5
    v = vw * size_f - 0.5
    size_i = size_f.astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, size_i - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, size_i - 1)
    fu = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)[..., None]

    layer = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), x0.shape)
    # The gathered row stays in the ATLAS dtype (bf16): casting the full
    # (..., 13c) stack to f32 up front doubles the materialized bytes of
    # the gather's output (XLA does not sink the convert into the
    # consumer fusion at this width); per-group casts are exact.
    row = _gather_texel(atlas13, layer, x0 + offs.astype(jnp.int32), y0)

    def grp(i):
        return row[..., i * c : (i + 1) * c].astype(jnp.float32)

    lo_top = grp(0) * (1 - fu) + grp(1) * fu
    lo_bot = grp(2) * (1 - fu) + grp(3) * fu
    lo = lo_top * (1 - fv) + lo_bot * fv

    # Level l0+1 bilinear out of the 3x3 (groups 4..12, row-major dy,dx).
    s2 = jnp.maximum(size_f * 0.5, 1.0)
    s2_i = s2.astype(jnp.int32)
    u2 = uw * s2 - 0.5
    v2 = vw * s2 - 0.5
    x20 = jnp.clip(jnp.floor(u2).astype(jnp.int32), 0, s2_i - 1)
    y20 = jnp.clip(jnp.floor(v2).astype(jnp.int32), 0, s2_i - 1)
    fu2 = jnp.clip(u2 - x20.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv2 = jnp.clip(v2 - y20.astype(jnp.float32), 0.0, 1.0)[..., None]
    r = jnp.clip(x20 - (x0 // 2 - 1), 0, 1)[..., None]  # column offset
    q = jnp.clip(y20 - (y0 // 2 - 1), 0, 1)[..., None]  # row offset
    r0 = r == 0
    q0 = q == 0

    def nrow(dy):
        a = jnp.where(q0, grp(4 + dy * 3), grp(7 + dy * 3))
        b = jnp.where(q0, grp(5 + dy * 3), grp(8 + dy * 3))
        cc = jnp.where(q0, grp(6 + dy * 3), grp(9 + dy * 3))
        return a, b, cc

    a0, b0, c0 = nrow(0)
    a1, b1, c1 = nrow(1)
    t00h = jnp.where(r0, a0, b0)
    t10h = jnp.where(r0, b0, c0)
    t01h = jnp.where(r0, a1, b1)
    t11h = jnp.where(r0, b1, c1)
    hi_top = t00h * (1 - fu2) + t10h * fu2
    hi_bot = t01h * (1 - fu2) + t11h * fu2
    hi = hi_top * (1 - fv2) + hi_bot * fv2

    return lo * (1 - frac) + hi * frac


def build_quad_packed_atlas(images: np.ndarray) -> np.ndarray:
    """2x2-packed atlas with 4 x-adjacent texel rows fused per table row
    (shape (N, S, S/2, 16C)): 4x fewer gather-table rows. TPU gather cost
    falls sharply with row count (below ~200k rows: ~5 ms vs 7-12 ms per
    2M-pixel pass), and rows up to ~256 B are free; the right base is
    picked from the fetched row with two binary selects."""
    packed = build_packed_mip_atlas(images)
    n, s, w2, c4 = packed.shape
    return packed.reshape(n, s, w2 // 4, 4 * c4)


def _quad_gather(atlas_q: jnp.ndarray, layer, ix, iy, c4: int):
    """Fetch the 2x2-packed group for global atlas column ``ix`` from a
    quad-packed atlas: one row gather + 2-level binary select."""
    n, h, wq, cq = atlas_q.shape
    flat = atlas_q.reshape(n * h * wq, cq)
    idx = (layer * h + iy) * wq + ix // 4
    row = flat[idx]
    j = ix % 4
    half = jnp.where((j[..., None] & 2) == 0, row[..., : 2 * c4],
                     row[..., 2 * c4 :])
    return jnp.where((j[..., None] & 1) == 0, half[..., :c4],
                     half[..., c4:])


def sample_bilinear_level_packed(atlas4: jnp.ndarray, layer, uv, level,
                                 base: int, quad: bool = False):
    """Bilinear tap from a neighborhood-packed atlas: ONE gather per pixel.

    Matches sample_bilinear_level semantics (repeat across tile repeats,
    clamp at mip borders). Works on 2x2-packed (4C), mip-pair (13C) and —
    with ``quad=True`` — quad-packed (4 x 4C) layouts; the level-l 2x2
    occupies the first 4 groups of each."""
    c4 = atlas4.shape[-1] // 4 if quad else atlas4.shape[-1]
    c = _packed_base_channels(c4)
    lvl = jnp.asarray(level, jnp.int32)
    size_f = jnp.asarray(base, jnp.float32) / jnp.exp2(lvl.astype(jnp.float32))
    size_f = jnp.maximum(jnp.floor(size_f + 0.5), 1.0)
    offs = _mip_offsets_table(base)[jnp.clip(lvl, 0, mip_count(base) - 1)]

    uw = uv[..., 0] - jnp.floor(uv[..., 0])
    vw = uv[..., 1] - jnp.floor(uv[..., 1])
    u = uw * size_f - 0.5
    v = vw * size_f - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    size_i = size_f.astype(jnp.int32)
    x0 = jnp.clip(u0.astype(jnp.int32), 0, size_i - 1)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, size_i - 1)
    fu = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)[..., None]

    ox = offs.astype(jnp.int32)
    layer = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), x0.shape)
    if quad:
        texel = _quad_gather(atlas4, layer, x0 + ox, y0, c4)  # (..., 4c)
    else:
        texel = _gather_texel(atlas4, layer, x0 + ox, y0)  # (..., 4c)
    # Cast per-slice (not the whole fetched row) — exact, and keeps the
    # materialized gather output in the atlas dtype (bf16 = half bytes).
    t00 = texel[..., 0:c].astype(jnp.float32)
    t10 = texel[..., c : 2 * c].astype(jnp.float32)
    t01 = texel[..., 2 * c : 3 * c].astype(jnp.float32)
    t11 = texel[..., 3 * c : 4 * c].astype(jnp.float32)
    top = t00 * (1 - fu) + t10 * fu
    bot = t01 * (1 - fu) + t11 * fu
    return top * (1 - fv) + bot * fv


def sample_trilinear_packed(atlas4: jnp.ndarray, layer, uv, lod, base: int,
                            quad: bool = False):
    """Trilinear from a packed atlas: one gather (mip-pair layout) or two
    (2x2 / quad layouts)."""
    if not quad and atlas4.shape[-1] % 13 == 0:
        return sample_trilinear_pair(atlas4, layer, uv, lod, base)
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, mip_count(base) - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    a = sample_bilinear_level_packed(atlas4, layer, uv, l0.astype(jnp.int32),
                                     base, quad=quad)
    b = sample_bilinear_level_packed(
        atlas4, layer, uv,
        jnp.minimum(l0 + 1, mip_count(base) - 1).astype(jnp.int32), base,
        quad=quad,
    )
    return a * (1 - frac) + b * frac


# ------------------------------------------------- merged environment tap

def build_quad_pair_atlas_np(images: np.ndarray) -> np.ndarray:
    """Mip-pair atlas with 4 x-adjacent texel rows fused per table row:
    (N, S, 2S, 13C) -> (N, S, S/2, 52C). One row then serves a full
    TRILINEAR sample for any of its 4 base texels (pair filtering after
    a 4-way base select) — used for the cubemap inside the merged
    environment table, where row COUNT drives gather cost."""
    pair = build_mip_pair_atlas(images)
    n, s, w2, c13 = pair.shape
    return pair.reshape(n, s, w2 // 4, 4 * c13)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def build_quad_pair_atlas_device(images, out_dtype=jnp.bfloat16):
    pair = build_mip_pair_atlas_device(images, out_dtype=jnp.float32)
    n, s, w2, c13 = pair.shape
    return pair.reshape(n, s, w2 // 4, 4 * c13).astype(out_dtype)


def pair_row_context(layer, uv, lod, base: int, quad: bool = False):
    """Index half of ``sample_trilinear_pair``: returns (flat_texel_index,
    ctx) where flat_texel_index addresses the UNQUADDED (layer, y, x)
    texel grid of a (N, S, 2S) pair atlas (the caller maps it to a table
    row; with ``quad`` the caller divides x by 4 and selects by x % 4
    from ctx['qj'])."""
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, mip_count(base) - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    lvl = l0.astype(jnp.int32)
    size_f = jnp.asarray(base, jnp.float32) / jnp.exp2(l0)
    size_f = jnp.maximum(jnp.floor(size_f + 0.5), 1.0)
    offs = _mip_offsets_table(base)[jnp.clip(lvl, 0, mip_count(base) - 1)]

    uw = uv[..., 0] - jnp.floor(uv[..., 0])
    vw = uv[..., 1] - jnp.floor(uv[..., 1])
    u = uw * size_f - 0.5
    v = vw * size_f - 0.5
    size_i = size_f.astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, size_i - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, size_i - 1)
    fu = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)[..., None]

    s2 = jnp.maximum(size_f * 0.5, 1.0)
    s2_i = s2.astype(jnp.int32)
    u2 = uw * s2 - 0.5
    v2 = vw * s2 - 0.5
    x20 = jnp.clip(jnp.floor(u2).astype(jnp.int32), 0, s2_i - 1)
    y20 = jnp.clip(jnp.floor(v2).astype(jnp.int32), 0, s2_i - 1)
    fu2 = jnp.clip(u2 - x20.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv2 = jnp.clip(v2 - y20.astype(jnp.float32), 0.0, 1.0)[..., None]
    xg = x0 + offs.astype(jnp.int32)
    ctx = {
        "frac": frac, "fu": fu, "fv": fv, "fu2": fu2, "fv2": fv2,
        "r": jnp.clip(x20 - (x0 // 2 - 1), 0, 1)[..., None],
        "q": jnp.clip(y20 - (y0 // 2 - 1), 0, 1)[..., None],
        "qj": xg % 4,
    }
    layer = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), x0.shape)
    return layer, xg, y0, ctx


def pair_filter_row(row, ctx, c: int):
    """Filter half of ``sample_trilinear_pair``: ``row`` is the fetched
    (..., 13c) mip-pair texel row (kept in the atlas dtype — selects do
    not round, and per-group f32 casts at the lerps are exact while
    halving the materialized gather output)."""
    fu, fv, fu2, fv2, frac = (ctx["fu"], ctx["fv"], ctx["fu2"],
                              ctx["fv2"], ctx["frac"])

    def grp(i):
        return row[..., i * c : (i + 1) * c]

    def grpf(i):
        return grp(i).astype(jnp.float32)

    lo_top = grpf(0) * (1 - fu) + grpf(1) * fu
    lo_bot = grpf(2) * (1 - fu) + grpf(3) * fu
    lo = lo_top * (1 - fv) + lo_bot * fv

    r0 = ctx["r"] == 0
    q0 = ctx["q"] == 0

    def nrow(dy):
        a = jnp.where(q0, grp(4 + dy * 3), grp(7 + dy * 3))
        b = jnp.where(q0, grp(5 + dy * 3), grp(8 + dy * 3))
        cc = jnp.where(q0, grp(6 + dy * 3), grp(9 + dy * 3))
        return a, b, cc

    a0, b0, c0 = nrow(0)
    a1, b1, c1 = nrow(1)

    def f32(x):
        return x.astype(jnp.float32)

    t00h = f32(jnp.where(r0, a0, b0))
    t10h = f32(jnp.where(r0, b0, c0))
    t01h = f32(jnp.where(r0, a1, b1))
    t11h = f32(jnp.where(r0, b1, c1))
    hi_top = t00h * (1 - fu2) + t10h * fu2
    hi_bot = t01h * (1 - fu2) + t11h * fu2
    hi = hi_top * (1 - fv2) + hi_bot * fv2
    return lo * (1 - frac) + hi * frac


def quad_select(row, j, c4: int):
    """Pick base j (= x % 4) out of a quad-fused row (..., 4*c4)."""
    half = jnp.where((j[..., None] & 2) == 0, row[..., : 2 * c4],
                     row[..., 2 * c4 :])
    return jnp.where((j[..., None] & 1) == 0, half[..., :c4],
                     half[..., c4:])


def quad_row_context(layer, uv, base: int):
    """Index half of the quad-packed mip-0 bilinear tap (sample_base
    quad=True): returns (layer, x_global, y, ctx)."""
    size_f = jnp.asarray(base, jnp.float32)
    uw = uv[..., 0] - jnp.floor(uv[..., 0])
    vw = uv[..., 1] - jnp.floor(uv[..., 1])
    u = uw * size_f - 0.5
    v = vw * size_f - 0.5
    size_i = jnp.int32(base)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, size_i - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, size_i - 1)
    fu = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)[..., None]
    layer = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), x0.shape)
    return layer, x0, y0, {"fu": fu, "fv": fv, "qj": x0 % 4}


def quad_filter_row(row, ctx, c: int):
    """Filter half of the quad bilinear tap: ``row`` = fetched (..., 4c)
    2x2-packed group (after quad_select; kept in the atlas dtype —
    per-slice f32 casts are exact and halve the materialized bytes)."""
    fu, fv = ctx["fu"], ctx["fv"]
    t00 = row[..., 0:c].astype(jnp.float32)
    t10 = row[..., c : 2 * c].astype(jnp.float32)
    t01 = row[..., 2 * c : 3 * c].astype(jnp.float32)
    t11 = row[..., 3 * c : 4 * c].astype(jnp.float32)
    top = t00 * (1 - fu) + t10 * fu
    bot = t01 * (1 - fu) + t11 * fu
    return top * (1 - fv) + bot * fv

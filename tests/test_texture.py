"""Texture sampling: the one-gather mip-pair layout must reproduce the
plain (unpacked) trilinear path bit-for-bit-ish on random data.

The mip-pair atlas stores, per texel, its 2x2 bilinear footprint at its
own level plus the 3x3 footprint at the next level (anchored at
(x//2 - 1, y//2 - 1)); sampling selects the true 2x2 window out of the
3x3 with binary selects. Reference semantics: sample_trilinear over a
build_mip_atlas atlas (repeat addressing, clamp at mip borders, linear
mip blend) — itself a port of the reference's trilinear sampler chain
(RHIGenerateMipmaps ZeldaEngine.cpp:6348, RHICreateSampler :6523).
"""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.ops.texture import (
    build_mip_atlas,
    build_mip_pair_atlas,
    build_packed_mip_atlas,
    sample_trilinear,
    sample_trilinear_packed,
    sample_trilinear_pair,
    sample_base,
)

S = 32
N = 3
C = 4


def _images(rng):
    return rng.rand(N, S, S, C).astype(np.float32)


def _coords(rng, n=4096):
    uv = jnp.asarray(rng.rand(n, 2).astype(np.float32) * 2.0 - 0.5)
    lod = jnp.asarray(rng.rand(n).astype(np.float32) * (S.bit_length() - 1))
    layer = jnp.asarray(rng.randint(0, N, n).astype(np.int32))
    return uv, lod, layer


def test_pair_matches_plain_trilinear(rng):
    """Interior texels at moderate LODs: the packed layouts edge-CLAMP
    bilinear windows at mip borders where the plain path WRAPs (a known,
    documented divergence), so the plain-path comparison stays away from
    texture borders on both blended levels."""
    imgs = _images(rng)
    plain = jnp.asarray(build_mip_atlas(imgs))
    pair = jnp.asarray(build_mip_pair_atlas(imgs))
    n = 4096
    uv = jnp.asarray(0.3 + 0.4 * rng.rand(n, 2).astype(np.float32))
    lod = jnp.asarray(rng.rand(n).astype(np.float32) * 2.0)
    layer = jnp.asarray(rng.randint(0, N, n).astype(np.int32))
    ref = sample_trilinear(plain, layer, uv, lod, S)
    out = sample_trilinear_pair(pair, layer, uv, lod, S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pair_matches_packed_2x2(rng):
    """The 2x2-packed path and the pair path agree (both layouts remain
    in use: cube/sky/bg atlases are QUAD-packed — 4 x-adjacent 2x2 bases
    fused per row, sampled with quad=True — materials are mip-pair; this
    test exercises the plain 2x2 packing both derive from)."""
    imgs = _images(rng)
    packed = jnp.asarray(build_packed_mip_atlas(imgs))
    pair = jnp.asarray(build_mip_pair_atlas(imgs))
    uv, lod, layer = _coords(rng)
    a = sample_trilinear_packed(packed, layer, uv, lod, S)
    b = sample_trilinear_packed(pair, layer, uv, lod, S)  # dispatches pair
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_pair_mip0_base_tap(rng):
    """sample_base (mip-0 bilinear) works on the pair layout: its first 4
    channel groups are the level-l 2x2, same as the 2x2-packed layout."""
    imgs = _images(rng)
    packed = jnp.asarray(build_packed_mip_atlas(imgs))
    pair = jnp.asarray(build_mip_pair_atlas(imgs))
    uv, _, layer = _coords(rng)
    a = sample_base(packed, layer, uv, S)
    b = sample_base(pair, layer, uv, S)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_pair_last_mip_finite(rng):
    """At the last mip level (frac = 0 against the self-referencing 3x3)
    the pair path stays finite and equals the plain path."""
    imgs = _images(rng)
    plain = jnp.asarray(build_mip_atlas(imgs))
    pair = jnp.asarray(build_mip_pair_atlas(imgs))
    uv, _, layer = _coords(rng, n=512)
    lod = jnp.full((512,), float(S.bit_length() - 1), jnp.float32)
    ref = sample_trilinear(plain, layer, uv, lod, S)
    out = sample_trilinear_pair(pair, layer, uv, lod, S)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_quad_packed_matches_2x2(rng):
    """Quad-packed rows (4 x-adjacent bases fused) must reproduce the
    2x2-packed path exactly, at every mip and across the select tree."""
    from zeldaengine_tpu.ops.texture import (
        build_quad_packed_atlas,
        sample_trilinear_packed as stp,
    )

    imgs = _images(rng)
    packed = jnp.asarray(build_packed_mip_atlas(imgs))
    quad = jnp.asarray(build_quad_packed_atlas(imgs))
    uv, lod, layer = _coords(rng)
    a = stp(packed, layer, uv, lod, S)
    b = stp(quad, layer, uv, lod, S, quad=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)
    sa = sample_base(packed, layer, uv, S)
    sb = sample_base(quad, layer, uv, S, quad=True)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               atol=1e-6, rtol=1e-6)


def test_constant_slot_elision_matches_full_atlas(rng):
    """Constant-slot elision (GpuScene.mat_const + SceneMeta.tex_channels)
    is BIT-identical to gathering the full 16-channel atlas: constant
    channels come from the bf16-rounded per-combo table, varying ones
    from the narrow atlas (same mip-pair build)."""
    import jax.numpy as jnp

    from zeldaengine_tpu.config import TEST_CONFIG
    from zeldaengine_tpu.ops.texture import build_mip_pair_atlas
    from zeldaengine_tpu.passes.gbuffer import _material_texels
    from zeldaengine_tpu.scene.mesh import make_cube, make_plane
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder

    cfg = TEST_CONFIG
    sS = cfg.texture_size

    def build(with_var):
        b = SceneBuilder(cfg)
        b.add_object(make_plane(4.0), b.add_material({}), deferred=True)
        if with_var:
            c = (np.indices((sS, sS)).sum(0) // 4 % 2).astype(np.float32)
            img = np.stack([0.2 + 0.5 * c, 0.3 + 0.3 * c, 0.8 - 0.6 * c,
                            np.ones_like(c)], -1)
            solid = np.full((sS, sS, 4), 0.25, np.float32)
            b.add_object(make_cube(1.0), b.add_material({0: img, 1: solid}),
                         deferred=True)
        return b.build()

    for with_var in (False, True):
        scene, meta = build(with_var)
        assert scene.mat_const is not None
        if with_var:
            assert meta.tex_channels == (0, 1, 2)  # basecolor varies
        else:
            assert meta.tex_channels == ()
        # Reference: the full 16-channel atlas of the same combo images,
        # rebuilt here from mat_const + the narrow atlas's source — use
        # the builder's combined images via a fresh full-16 pack.
        mc = scene.mat_const.shape[0]
        hw = (8, 16)
        combo = jnp.asarray(
            np.random.RandomState(0).randint(0, mc, hw), jnp.int32)
        uv = jnp.asarray(np.random.RandomState(1).rand(*hw, 2), jnp.float32)
        lod = jnp.asarray(
            np.random.RandomState(2).rand(*hw) * 3.0, jnp.float32)
        got = _material_texels(scene, cfg, combo, uv, lod,
                               meta.tex_channels)
        assert got.shape == hw + (13,)
        # Constant channels must equal the per-combo constants exactly.
        var = set(meta.tex_channels)
        for c in range(13):
            if c in var:
                continue
            want = np.asarray(scene.mat_const)[np.asarray(combo), c]
            np.testing.assert_array_equal(np.asarray(got[..., c]), want)
        if with_var:
            # Varying channels must match a full-16 atlas gather.
            from zeldaengine_tpu.ops.texture import sample_trilinear_pair
            atlas = scene.combined_atlas
            ref = sample_trilinear_pair(atlas, combo, uv, lod, sS)
            np.testing.assert_array_equal(
                np.asarray(got[..., :3]), np.asarray(ref[..., :3]))

"""Pallas exact-pair rasterizer vs the jnp reference path, in interpret
mode (CPU CI coverage for the TPU kernel: pair expansion + sort binning,
global overflow bucket, boundary-slice lane masking, row bands)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeldaengine_tpu.ops.rasterize import (
    rasterize_visibility,
    triangle_setup,
)

H, W = 64, 128
TILE_H, TILE_W = 8, 128


def _random_setup(rng, n=300, two_sided=True):
    # Clip-space triangles with positive w, spread over the viewport.
    centers = rng.uniform(-1.0, 1.0, (n, 1, 3)).astype(np.float32)
    offs = rng.uniform(-0.15, 0.15, (n, 3, 3)).astype(np.float32)
    pos = centers + offs
    w = rng.uniform(0.5, 3.0, (n, 3, 1)).astype(np.float32)
    z = rng.uniform(0.1, 0.9, (n, 1, 1)).astype(np.float32) * w
    clip = np.concatenate([pos[..., :2] * w, z * np.ones((1, 3, 1)), w], -1)
    return triangle_setup(jnp.asarray(clip), W, H, two_sided=two_sided)


@pytest.mark.parametrize("expand", [2, 8])
@pytest.mark.parametrize("winner", ["accwide", "argmin2"])
def test_pairs_matches_jnp(rng, expand, winner):
    """Exact-pair rasterizer vs jnp reference; small expand caps force
    triangles through the global overflow bucket. ``accwide`` (the
    default full-width-accumulator walk) must match ``argmin2``'s
    semantics exactly."""
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
    )

    setup = _random_setup(rng)
    ref_depth, ref_tid = rasterize_visibility(setup, H, W, chunk=64)
    pairs = build_pairs(setup, W, H, TILE_H, TILE_W, expand=expand)
    depth, tid = rasterize_pairs(
        pairs, H, W, tile_h=TILE_H, tile_w=TILE_W, sub_rows=8,
        interpret=True, winner=winner,
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=5e-5)
    tid, ref_tid = np.asarray(tid), np.asarray(ref_tid)
    assert (tid != ref_tid).mean() < 0.01


def test_pairs_depth_only_and_band(rng):
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
    )

    setup = _random_setup(rng, n=150)
    ref = np.asarray(rasterize_visibility(setup, H, W, chunk=64)[0])
    pairs = build_pairs(setup, W, H, TILE_H, TILE_W)
    depth = rasterize_pairs(pairs, H, W, tile_h=TILE_H, tile_w=TILE_W,
                            depth_only=True, interpret=True)
    np.testing.assert_allclose(np.asarray(depth), ref, atol=5e-5)
    band_rows, y0 = 32, 16
    pairs_b = build_pairs(setup, W, band_rows, TILE_H, TILE_W,
                          y0_tiles=y0 // TILE_H)
    band = rasterize_pairs(pairs_b, band_rows, W, tile_h=TILE_H,
                           tile_w=TILE_W, depth_only=True,
                           y0_tiles=y0 // TILE_H, interpret=True)
    np.testing.assert_allclose(np.asarray(band), ref[y0:y0 + band_rows],
                               atol=5e-5)


def test_pairs_init_depth(rng):
    """Pair raster must z-test against a provided init depth buffer."""
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
    )

    setup = _random_setup(rng, n=80)
    init = jnp.full((H, W), 0.4, jnp.float32)
    ref_depth, ref_tid = rasterize_visibility(setup, H, W, chunk=64,
                                              init_depth=init)
    pairs = build_pairs(setup, W, H, TILE_H, TILE_W)
    depth, tid = rasterize_pairs(pairs, H, W, init_depth=init,
                                 tile_h=TILE_H, tile_w=TILE_W,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=5e-5)
    assert (np.asarray(tid) != np.asarray(ref_tid)).mean() < 0.01


def test_build_pairs_max_pairs_cap(rng):
    """A generous max_pairs cap is a no-op (dead pairs sort last, so the
    live prefix survives the slice); a tiny cap truncates and reports
    the dropped live-pair count (VERDICT r2 #2 cull-aware prep)."""
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
    )

    setup = _random_setup(rng, n=200)
    full = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8)
    # Live pair count (bin-aligned streams intersperse dead padding, so
    # gbounds[1] is an aligned POSITION, not the live count).
    live = int((np.asarray(full.pair_tri) != 200).sum())
    assert live > 0
    cap_ok = ((live + 255) // 128) * 128
    capped = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                         max_pairs=cap_ok)
    assert int(capped.overflow) == 0
    d0, t0 = rasterize_pairs(full, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             interpret=True)
    d1, t1 = rasterize_pairs(capped, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    tiny = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                       max_pairs=128)
    assert int(tiny.overflow) == max(live - 128, 0)


def test_compact_setup_matches_uncompacted(rng):
    """Live-triangle compaction (compact_tris): same depth/tid as the
    uncompacted pair build, overflow counted when the cap is too small."""
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        compact_setup,
        rasterize_pairs,
        remap_pair_tri,
    )

    setup = _random_setup(rng, n=300)
    # Kill a majority of triangles (the meshlet-cull analogue).
    mask = np.ones(300, bool)
    mask[::3] = False
    mask[1::3] = False
    setup = setup._replace(valid=setup.valid & jnp.asarray(mask))

    pairs0 = build_pairs(setup, W, H, TILE_H, TILE_W)
    d0, t0 = rasterize_pairs(pairs0, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             interpret=True)

    from zeldaengine_tpu.ops.rasterize_pallas import _covers_pixel_center

    live = int(np.asarray(
        setup.valid
        & (setup.bbox[:, 2] > setup.bbox[:, 0])
        & (setup.bbox[:, 3] > setup.bbox[:, 1])
        & _covers_pixel_center(setup.bbox)  # round-5 sub-pixel cull
    ).sum())
    cap = live + 8
    s2, _, idx, ovf = compact_setup(setup, cap, center_cull=True)
    assert int(ovf) == 0
    pairs1 = build_pairs(s2, W, H, TILE_H, TILE_W)
    pairs1 = remap_pair_tri(pairs1, idx, 300)
    d1, t1 = rasterize_pairs(pairs1, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=5e-5)
    t0a, t1a = np.asarray(t0), np.asarray(t1)
    # dead encoding: uncompacted uses -1 for uncovered; ids must agree
    assert (t1a != t0a).mean() < 0.005

    # Too-small cap: deterministic overflow is counted.
    _, _, _, ovf2 = compact_setup(setup, max(8, live // 2),
                                  center_cull=True)
    assert int(ovf2) == live - max(8, live // 2)


def test_early_out_exact_vs_reference(rng):
    """Occlusion early-out (front-to-back pairs + per-tile stop) must be
    EXACT: skipped pairs are strictly behind every pixel's current depth
    (strict-< z test), so depth and winner ids match the jnp reference
    bit-for-bit at every stride."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.rasterize import (
        rasterize_depth, rasterize_visibility, triangle_setup)
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs, rasterize_pairs)

    T, H, W = 300, 64, 128
    v = rng.uniform(-1.2, 1.2, (T, 3, 4)).astype(np.float32)
    v[..., 3] = rng.uniform(0.5, 3.0, (T, 3)).astype(np.float32)
    v[..., 2] = rng.uniform(0.0, 1.0, (T, 3)) * v[..., 3]
    setup = triangle_setup(jnp.asarray(v), W, H)
    pairs = build_pairs(setup, W, H, 16, 32, expand=8, sort_z=True)
    d_ref, t_ref = rasterize_visibility(setup, H, W, chunk=64)
    dref = rasterize_depth(setup, H, W, chunk=64)
    for stride in (1, 4):
        d_eo, t_eo = rasterize_pairs(
            pairs, H, W, tile_h=16, tile_w=32, interpret=True,
            early_out=True, z_row=12, eo_stride=stride)
        assert np.array_equal(np.asarray(d_eo), np.asarray(d_ref))
        assert np.array_equal(np.asarray(t_eo), np.asarray(t_ref))
        do = rasterize_pairs(
            pairs, H, W, tile_h=16, tile_w=32, depth_only=True,
            interpret=True, early_out=True, z_row=12, eo_stride=stride)
        assert np.array_equal(np.asarray(do), np.asarray(dref))


def test_ysort_window_skip_exact_vs_reference(rng):
    """Y-bucketed bins + sub-block window skip (build_pairs
    ysort_sub_rows + rasterize y_row) must be EXACT: a triangle's
    coverage outside its binning bbox is empty, so skipping sub-blocks
    outside the slice's reduced span changes nothing. Checked with and
    without the front-to-back z order, depth-only and winner paths."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.rasterize import (
        rasterize_depth, rasterize_visibility, triangle_setup)
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs, rasterize_pairs)

    T, H, W = 300, 64, 128
    v = rng.uniform(-1.2, 1.2, (T, 3, 4)).astype(np.float32)
    v[..., 3] = rng.uniform(0.5, 3.0, (T, 3)).astype(np.float32)
    v[..., 2] = rng.uniform(0.0, 1.0, (T, 3)) * v[..., 3]
    setup = triangle_setup(jnp.asarray(v), W, H)
    d_ref, t_ref = rasterize_visibility(setup, H, W, chunk=64)
    dref = rasterize_depth(setup, H, W, chunk=64)
    th, tw, sub = 16, 32, 4
    for sort_z in (False, True):
        hz = 1 if sort_z else 0
        pairs = build_pairs(setup, W, H, th, tw, expand=8,
                            sort_z=sort_z, ysort_sub_rows=sub)
        d, t = rasterize_pairs(
            pairs, H, W, tile_h=th, tile_w=tw, sub_rows=sub,
            interpret=True, y_row=12 + hz)
        assert np.array_equal(np.asarray(d), np.asarray(d_ref))
        assert np.array_equal(np.asarray(t), np.asarray(t_ref))
        do = rasterize_pairs(
            pairs, H, W, tile_h=th, tile_w=tw, sub_rows=sub,
            depth_only=True, interpret=True, y_row=12 + hz)
        assert np.array_equal(np.asarray(do), np.asarray(dref))


def test_early_out_plus_ysort_exact(rng):
    """early_out combined with y-bucketed bins (ADVICE r4 #2): ysort's
    within-bin key is (y-bucket << zbits | zq), so zq is NOT monotone
    across a bin and the occlusion stop test would skip nearer pairs in
    later y-buckets. The kernel must force early-out OFF when the
    sub-block window skip is active — requesting both must still yield
    bit-exact depth/winners vs the jnp reference."""
    import jax.numpy as jnp

    from zeldaengine_tpu.ops.rasterize import (
        rasterize_depth, rasterize_visibility, triangle_setup)
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs, rasterize_pairs)

    T, H, W = 300, 64, 128
    v = rng.uniform(-1.2, 1.2, (T, 3, 4)).astype(np.float32)
    v[..., 3] = rng.uniform(0.5, 3.0, (T, 3)).astype(np.float32)
    v[..., 2] = rng.uniform(0.0, 1.0, (T, 3)) * v[..., 3]
    setup = triangle_setup(jnp.asarray(v), W, H)
    d_ref, t_ref = rasterize_visibility(setup, H, W, chunk=64)
    dref = rasterize_depth(setup, H, W, chunk=64)
    th, tw, sub = 16, 32, 4
    pairs = build_pairs(setup, W, H, th, tw, expand=8,
                        sort_z=True, ysort_sub_rows=sub)
    for stride in (1, 4):
        d, t = rasterize_pairs(
            pairs, H, W, tile_h=th, tile_w=tw, sub_rows=sub,
            interpret=True, early_out=True, z_row=12, eo_stride=stride,
            y_row=13)
        assert np.array_equal(np.asarray(d), np.asarray(d_ref))
        assert np.array_equal(np.asarray(t), np.asarray(t_ref))
        do = rasterize_pairs(
            pairs, H, W, tile_h=th, tile_w=tw, sub_rows=sub,
            depth_only=True, interpret=True, early_out=True, z_row=12,
            eo_stride=stride, y_row=13)
        assert np.array_equal(np.asarray(do), np.asarray(dref))


def test_aligned_bins_match_unaligned(rng):
    """Slice-aligned pair bins (build_pairs align=True, the default)
    must rasterize identically to the unaligned stream — pad lanes hold
    the never-record — and every walked bin must start on a 128-pair
    slice boundary."""
    from zeldaengine_tpu.ops.rasterize_pallas import (
        build_pairs,
        rasterize_pairs,
    )

    setup = _random_setup(rng, n=300)
    for kw in ({}, {"sort_z": True}, {"max_pairs": 512}):
        pa = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                         align=True, **kw)
        pu = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                         align=False, **kw)
        assert int(jnp.max(pa.starts % 128)) == 0
        assert int(pa.sstarts.shape[0]) == 0 or \
            int(jnp.max(pa.sstarts % 128)) == 0
        assert int(pa.gbounds[0] % 128) == 0
        da, ta = rasterize_pairs(pa, H, W, tile_h=TILE_H, tile_w=TILE_W,
                                 interpret=True)
        du, tu = rasterize_pairs(pu, H, W, tile_h=TILE_H, tile_w=TILE_W,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(da), np.asarray(du))
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tu))


def test_pairs_gather_pack_exact(rng):
    """Packed record gather (build_pairs gather_pack=G): G-rows-per-row
    relayout + one wide gather + group select must reproduce the plain
    single-gather record stream bit-for-bit, including tables whose row
    count is not a multiple of G, under caps/z-sort/y-sort."""
    from zeldaengine_tpu.ops.rasterize_pallas import build_pairs

    setup = _random_setup(rng, n=301)  # 302-row table, not G-aligned
    for kw in ({}, {"sort_z": True}, {"max_pairs": 512},
               {"sort_z": True, "ysort_sub_rows": 8}):
        p1 = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                         gather_pack=1, **kw)
        for g in (4, 8):
            pg = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                             gather_pack=g, **kw)
            np.testing.assert_array_equal(np.asarray(pg.records),
                                          np.asarray(p1.records))
            np.testing.assert_array_equal(np.asarray(pg.pair_tri),
                                          np.asarray(p1.pair_tri))


def test_pairs_gather_chunks_exact(rng):
    """Chunked record gather (build_pairs gather_chunks=G): G contiguous
    row-slice gathers + selects must reproduce the single-gather record
    stream bit-for-bit, for chunk counts that divide the table unevenly
    and under caps/z-sort/y-sort."""
    from zeldaengine_tpu.ops.rasterize_pallas import build_pairs

    setup = _random_setup(rng, n=301)  # odd count -> uneven chunks
    for kw in ({}, {"sort_z": True}, {"max_pairs": 512},
               {"sort_z": True, "ysort_sub_rows": 8}):
        p1 = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                         gather_chunks=1, **kw)
        for g in (3, 4, 8):
            pg = build_pairs(setup, W, H, TILE_H, TILE_W, expand=8,
                             gather_chunks=g, **kw)
            np.testing.assert_array_equal(np.asarray(pg.records),
                                          np.asarray(p1.records))
            np.testing.assert_array_equal(np.asarray(pg.pair_tri),
                                          np.asarray(p1.pair_tri))

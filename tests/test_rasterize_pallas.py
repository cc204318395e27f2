"""Pallas tile-walker rasterizer vs the jnp reference path, in interpret
mode (CPU CI coverage for the TPU kernel: compacted per-tile chunk lists,
double-buffered record DMA, bbox early-outs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeldaengine_tpu.ops.rasterize import (
    rasterize_visibility,
    triangle_setup,
)
from zeldaengine_tpu.ops.rasterize_pallas import (
    build_chunks,
    rasterize_pallas,
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


@pytest.mark.parametrize("chunk", [128, 256])
def test_pallas_matches_jnp(rng, chunk):
    setup = _random_setup(rng)
    ref_depth, ref_tid = rasterize_visibility(setup, H, W, chunk=64)
    chunks = build_chunks(setup, W, H, TILE_H, TILE_W, chunk)
    depth, tid = rasterize_pallas(
        chunks, H, W, tile_h=TILE_H, tile_w=TILE_W, chunk=chunk,
        sub_rows=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=5e-5)
    # Winning ids must agree except at exact depth ties.
    tid, ref_tid = np.asarray(tid), np.asarray(ref_tid)
    disagree = tid != ref_tid
    assert disagree.mean() < 0.01


def test_compacted_binning_lists(rng):
    """Every (tile, chunk) pair that can produce coverage must be listed."""
    setup = _random_setup(rng, n=200)
    chunk = 128
    chunks = build_chunks(setup, W, H, TILE_H, TILE_W, chunk)
    n_chunks = chunks.records.shape[0]
    counts = np.asarray(chunks.counts)
    ids = np.asarray(chunks.chunk_ids)[:, 0, :]
    n_tx = W // TILE_W
    # Reference activity from triangle bboxes.
    bbox = np.asarray(setup.bbox)
    valid = np.asarray(setup.valid)
    for t in range(counts.shape[0]):
        ty, tx = divmod(t, n_tx)
        x0, y0 = tx * TILE_W, ty * TILE_H
        listed = set(ids[t, : counts[t]].tolist())
        # Listed ids are unique and ascending.
        assert sorted(listed) == ids[t, : counts[t]].tolist()
        for i in range(bbox.shape[0]):
            if not valid[i]:
                continue
            bx0, by0, bx1, by1 = bbox[i]
            overlaps = (
                bx0 < x0 + TILE_W and bx1 > x0
                and by0 < y0 + TILE_H and by1 > y0
            )
            # build_chunks bins on floor/ceil tile ranges (conservative);
            # strict overlap must imply membership.
            if overlaps and (bx1 - bx0) > 0 and (by1 - by0) > 0:
                assert i // chunk in listed, (t, i)


def test_pallas_depth_only_and_band(rng):
    setup = _random_setup(rng, n=150)
    ref = np.asarray(rasterize_visibility(setup, H, W, chunk=64)[0])
    chunk = 128
    # Full frame, depth only.
    chunks = build_chunks(setup, W, H, TILE_H, TILE_W, chunk)
    depth = rasterize_pallas(chunks, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             chunk=chunk, depth_only=True, interpret=True)
    np.testing.assert_allclose(np.asarray(depth), ref, atol=5e-5)
    # Row band [16, 48): must equal the same rows of the full frame.
    band_rows = 32
    y0 = 16
    chunks_b = build_chunks(setup, W, band_rows, TILE_H, TILE_W, chunk,
                            y0_tiles=y0 // TILE_H)
    band = rasterize_pallas(chunks_b, band_rows, W, tile_h=TILE_H,
                            tile_w=TILE_W, chunk=chunk, depth_only=True,
                            y0_tiles=y0 // TILE_H, interpret=True)
    np.testing.assert_allclose(np.asarray(band), ref[y0:y0 + band_rows],
                               atol=5e-5)

"""Pallas tiled rasterizer vs the jnp reference path, in interpret mode
(CPU CI coverage for the TPU kernel: binning tables, supertile rows, bbox
early-outs, chunk residency)."""

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
    choose_binning,
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


@pytest.mark.parametrize("chunk,gy", [(128, 1), (256, 2), (384, 4)])
def test_pallas_matches_jnp(rng, chunk, gy):
    setup = _random_setup(rng)
    ref_depth, ref_tid = rasterize_visibility(setup, H, W, chunk=64)
    chunks = build_chunks(setup, W, H, TILE_H, TILE_W, chunk, gy=gy)
    depth, tid = rasterize_pallas(
        chunks, H, W, tile_h=TILE_H, tile_w=TILE_W, chunk=chunk,
        sub_rows=8, gy=gy, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=5e-5)
    # Winning ids must agree except at exact depth ties.
    tid, ref_tid = np.asarray(tid), np.asarray(ref_tid)
    disagree = tid != ref_tid
    assert disagree.mean() < 0.01


def test_pallas_depth_only_and_band(rng):
    setup = _random_setup(rng, n=150)
    ref = np.asarray(rasterize_visibility(setup, H, W, chunk=64)[0])
    chunk, gy = choose_binning(150, H // TILE_H, W // TILE_W)
    # Full frame, depth only.
    chunks = build_chunks(setup, W, H, TILE_H, TILE_W, chunk, gy=gy)
    depth = rasterize_pallas(chunks, H, W, tile_h=TILE_H, tile_w=TILE_W,
                             chunk=chunk, depth_only=True, gy=gy,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(depth), ref, atol=5e-5)
    # Row band [16, 48): must equal the same rows of the full frame.
    band_rows = 32
    y0 = 16
    chunks_b = build_chunks(setup, W, band_rows, TILE_H, TILE_W, chunk,
                            y0_tiles=y0 // TILE_H, gy=gy)
    band = rasterize_pallas(chunks_b, band_rows, W, tile_h=TILE_H,
                            tile_w=TILE_W, chunk=chunk, depth_only=True,
                            y0_tiles=y0 // TILE_H, gy=gy, interpret=True)
    np.testing.assert_allclose(np.asarray(band), ref[y0:y0 + band_rows],
                               atol=5e-5)

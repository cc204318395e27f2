"""Visibility-buffer triangle rasterization (jnp reference implementation).

Replaces the fixed-function Vulkan rasterizer + depth test that the reference
engine gets for free (vkCmdDrawIndexed, ZeldaEngine.cpp:3545-3679). Design is
TPU-first, not a GPU translation:

- **Homogeneous 2D rasterization** (clip-space edge functions via the 3x3
  adjugate of the pixel-space vertex matrix). No near-plane clipping is
  needed: a pixel is covered by the visible part of a triangle iff all three
  adjugate dot products are >= 0 (after orientation normalization), which is
  exact for any sign pattern of vertex w.
- **Z-buffering is a pure min-reduction**: for each pixel, depth candidates
  across triangles reduce with ``min`` and the winning triangle id is kept —
  no atomics, no serialization; maps to VPU reductions.
- **Visibility buffer, not attribute buffer**: the rasterizer outputs only
  (depth, triangle_id) per pixel. Attribute interpolation happens in a
  deferred pass that gathers per-pixel triangle data once — O(pixels)
  gathers instead of O(pixels x triangles) interpolation.

Math: with pixel-space homogeneous vertex matrix M (columns are vertices
(x_pix*w, y_pix*w, w)), the barycentric solve c = M^-1 @ (px, py, 1)
satisfies: pixel covered <=> all c_i >= 0; perspective-correct attribute
a(p) = sum(c_i a_i)/sum(c_i); NDC depth z(p) = sum(c_i z_i) (with
sum(c_i w_i) = 1). We use u = adj(M) @ p = det * c, normalized per triangle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TriangleSetup(NamedTuple):
    """Per-triangle rasterization constants (all shapes (T, ...))."""

    edge: jnp.ndarray  # (T, 3, 3) scaled adjugate rows; inside = all dots >= 0
    zc: jnp.ndarray  # (T, 3) depth coefficients: depth = dot(u, zc)
    valid: jnp.ndarray  # (T,) bool — in-front, non-degenerate, correctly wound
    bbox: jnp.ndarray  # (T, 4) float32 pixel bbox (x0, y0, x1, y1), conservative
    # Conservative per-triangle MINIMUM NDC depth (0 when any vertex w is
    # near/behind zero — the projection is unbounded). Interpolated depth
    # is a convex combination of the vertices' z/w (weights c_i * w_i sum
    # to 1 and are >= 0 inside when all w > 0), so min_i(z_i/w_i) bounds
    # every covered pixel's depth from below. Drives front-to-back pair
    # ordering + per-tile occlusion early-out in the Pallas rasterizer.
    zmin: jnp.ndarray | None = None  # (T,) float32 in [0, 1]


def triangle_setup(
    clip: jnp.ndarray,
    width: int,
    height: int,
    two_sided: jnp.ndarray | bool = False,
    valid_mask: jnp.ndarray | None = None,
    depth_bias: tuple | None = None,
) -> TriangleSetup:
    """Build edge/depth coefficients from clip-space triangle vertices.

    Args:
      clip: (T, 3, 4) clip-space positions (x, y, z, w), Vulkan conventions
        (NDC x,y in [-1,1] with y down after the reference's proj Y flip,
        depth z/w in [0,1]).
      width/height: render-target size in pixels.
      two_sided: per-triangle bool (or scalar) — disable backface culling
        (EXkRenderFlags::TwoSided; pipeline cull mode, ZeldaEngine.cpp:5134).
      valid_mask: optional (T,) bool for padded/inactive triangles.
      depth_bias: optional (constant_factor, slope_factor) — Vulkan-style
        polygon depth bias applied at rasterization, as the shadow pass
        does with vkCmdSetDepthBias(1.25, 0, 7.5) (ZeldaEngine.cpp:
        3280-3287): written depth is offset by
        slope_factor * max(|dz/dx|, |dz/dy|) + constant_factor * r,
        with r = 2^-23 (D32_SFLOAT minimum resolvable difference).
    """
    clip = jnp.asarray(clip, jnp.float32)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    # Fold viewport transform into homogeneous pixel coords:
    # x_pix = (x/w * 0.5 + 0.5) * width  =>  xp = (0.5x + 0.5w) * width
    xp = (0.5 * x + 0.5 * w) * width
    yp = (0.5 * y + 0.5 * w) * height

    x0, x1, x2 = xp[..., 0], xp[..., 1], xp[..., 2]
    y0, y1, y2 = yp[..., 0], yp[..., 1], yp[..., 2]
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]

    # Adjugate of M = [[x0,x1,x2],[y0,y1,y2],[w0,w1,w2]] (columns=vertices).
    adj = jnp.stack(
        [
            jnp.stack([y1 * w2 - y2 * w1, x2 * w1 - x1 * w2, x1 * y2 - x2 * y1], -1),
            jnp.stack([y2 * w0 - y0 * w2, x0 * w2 - x2 * w0, x2 * y0 - x0 * y2], -1),
            jnp.stack([y0 * w1 - y1 * w0, x1 * w0 - x0 * w1, x0 * y1 - x1 * y0], -1),
        ],
        -2,
    )  # (T, 3, 3)
    det = x0 * adj[..., 0, 0] + x1 * adj[..., 1, 0] + x2 * adj[..., 2, 0]

    # Orientation: Vulkan front face is COUNTER_CLOCKWISE in y-down
    # framebuffer coords (ZeldaEngine.cpp:5118), which in this matrix
    # construction is det < 0. Normalize edges by sign(det) so interior
    # pixels always satisfy u_i >= 0.
    sign = jnp.where(det >= 0, 1.0, -1.0)
    front = det < 0
    two_sided = jnp.broadcast_to(jnp.asarray(two_sided, bool), det.shape)
    keep = jnp.where(two_sided, jnp.abs(det) > 0, front)
    if valid_mask is not None:
        keep = keep & valid_mask
    # Reject triangles entirely behind the camera (all w <= 0): their
    # adjugate test would otherwise accept the mirrored projection.
    keep = keep & jnp.any(w > 0, axis=-1)

    # Condition the coefficients: scale rows so |entries| ~ 1.
    scale = jnp.max(jnp.abs(adj), axis=(-2, -1))
    scale = jnp.where(scale > 0, scale, 1.0)
    edge = adj * (sign / scale)[..., None, None]
    det_scaled = det * sign / scale  # positive
    safe_det = jnp.where(jnp.abs(det_scaled) > 1e-20, det_scaled, 1.0)
    zc = z * (1.0 / safe_det)[..., None] * jnp.ones_like(z)
    # depth(p) = dot(u, z)/det_scaled with u = edge @ p; fold 1/det into zc.

    keep = keep & (jnp.abs(det_scaled) > 1e-20)

    if depth_bias is not None:
        const_f, slope_f = depth_bias
        # Screen-space depth gradient: depth(p) = dot(u, zc) with
        # u = edge @ (px, py, 1)  =>  dz/dpx = sum_i zc_i * edge[i, 0].
        zrow = jnp.einsum("ti,tij->tj", zc, edge,
                          precision=jax.lax.Precision.HIGHEST)
        slope = jnp.maximum(jnp.abs(zrow[..., 0]), jnp.abs(zrow[..., 1]))
        bias = slope_f * slope + const_f * 1.1920929e-7
        # Add a constant to the interpolated depth: with the scaled edges,
        # sum(u_i * w_i) = det_scaled, so zc_i += bias * w_i / det_scaled
        # shifts depth(p) by exactly bias.
        zc = zc + (bias / safe_det)[..., None] * w

    # Conservative screen bbox of the visible region. If any w is near/behind
    # zero the projection is unbounded -> full screen.
    w_ok = jnp.all(w > 1e-6, axis=-1)
    px = xp / jnp.where(jnp.abs(w) > 1e-6, w, 1.0)
    py = yp / jnp.where(jnp.abs(w) > 1e-6, w, 1.0)
    fx0 = jnp.where(w_ok, jnp.min(px, -1), 0.0)
    fy0 = jnp.where(w_ok, jnp.min(py, -1), 0.0)
    fx1 = jnp.where(w_ok, jnp.max(px, -1), float(width))
    fy1 = jnp.where(w_ok, jnp.max(py, -1), float(height))
    bbox = jnp.stack(
        [
            jnp.clip(fx0, 0.0, float(width)),
            jnp.clip(fy0, 0.0, float(height)),
            jnp.clip(fx1, 0.0, float(width)),
            jnp.clip(fy1, 0.0, float(height)),
        ],
        -1,
    )
    # Zero-area bbox for culled triangles so binning skips them.
    bbox = jnp.where(keep[..., None], bbox, 0.0)

    # Conservative minimum NDC depth (see TriangleSetup.zmin): covered
    # depth = sum(c_i w_i * z_i/w_i) with nonneg weights summing to 1
    # when all w > 0, so min(z_i/w_i) bounds it below; near-plane
    # crossers get 0. A positive depth_bias only raises depth, so the
    # unbiased bound stays valid.
    z_over_w = z / jnp.where(jnp.abs(w) > 1e-6, w, 1.0)
    zmin = jnp.where(w_ok, jnp.min(z_over_w, axis=-1), 0.0)
    zmin = jnp.clip(zmin, 0.0, 1.0)

    return TriangleSetup(edge=edge, zc=zc, valid=keep, bbox=bbox, zmin=zmin)


def _pixel_grid(height: int, width: int, x0=0, y0=0):
    """Pixel-center coordinates ((H,W) each), offset by an origin.

    Offsets are added in INTEGER pixel space before the float convert so a
    row band at y0 produces bit-identical coordinates to the same rows of a
    full-frame grid (required for sharded == single-chip exactness).
    """
    y0 = jnp.asarray(y0, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)
    py = (jnp.arange(height, dtype=jnp.int32)[:, None] + y0).astype(
        jnp.float32
    ) + 0.5
    px = (jnp.arange(width, dtype=jnp.int32)[None, :] + x0).astype(
        jnp.float32
    ) + 0.5
    return jnp.broadcast_to(px, (height, width)), jnp.broadcast_to(py, (height, width))


def _coverage_chunk(edge, zc, valid, px, py):
    """Depth candidates for a chunk of triangles over a pixel block.

    Returns (depth, covered) of shape (K, H, W).
    """
    # u_i = edge[i,0]*px + edge[i,1]*py + edge[i,2]
    e = edge[:, :, 0, None, None] * px + edge[:, :, 1, None, None] * py \
        + edge[:, :, 2, None, None]  # (K, 3, H, W)
    inside = jnp.all(e >= 0.0, axis=1)  # (K, H, W)
    # Reject the fully-degenerate all-zero case (u = 0 vector).
    esum = e[:, 0] + e[:, 1] + e[:, 2]
    inside = inside & (esum > 0.0)
    depth = (
        e[:, 0] * zc[:, 0, None, None]
        + e[:, 1] * zc[:, 1, None, None]
        + e[:, 2] * zc[:, 2, None, None]
    )
    # Vulkan depth clip: 0 <= z_ndc <= 1 (z < 0 is behind the near plane).
    covered = inside & (depth >= 0.0) & (depth <= 1.0) & valid[:, None, None]
    depth = jnp.where(covered, depth, jnp.inf)
    return depth, covered


def rasterize_visibility(
    setup: TriangleSetup,
    height: int,
    width: int,
    chunk: int = 64,
    init_depth: jnp.ndarray | None = None,
    y0=0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize to a visibility buffer.

    Returns:
      depth: (H, W) float32 NDC depth; pixels with no coverage hold the
        clear value 1.0 (or ``init_depth``).
      tri_id: (H, W) int32 winning triangle index, -1 where uncovered.
    """
    n_tris = setup.edge.shape[0]
    pad = (-n_tris) % chunk
    edge = jnp.pad(setup.edge, ((0, pad), (0, 0), (0, 0)))
    zc = jnp.pad(setup.zc, ((0, pad), (0, 0)))
    valid = jnp.pad(setup.valid, ((0, pad),))
    n_chunks = edge.shape[0] // chunk

    px, py = _pixel_grid(height, width, y0=y0)

    def body(carry, chunk_idx):
        best_depth, best_tri = carry
        sl = chunk_idx * chunk
        e = jax.lax.dynamic_slice_in_dim(edge, sl, chunk, 0)
        z = jax.lax.dynamic_slice_in_dim(zc, sl, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(valid, sl, chunk, 0)
        depth, _ = _coverage_chunk(e, z, v, px, py)
        # Per-pixel winner within the chunk (min depth; ties -> lower index).
        local_best = jnp.min(depth, axis=0)
        local_arg = jnp.argmin(depth, axis=0).astype(jnp.int32) + sl
        take = local_best < best_depth
        best_depth = jnp.where(take, local_best, best_depth)
        best_tri = jnp.where(take, local_arg, best_tri)
        return (best_depth, best_tri), None

    if init_depth is None:
        init_depth = jnp.full((height, width), 1.0, jnp.float32)
    init = (init_depth, jnp.full((height, width), -1, jnp.int32))
    (depth, tri), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return depth, tri


def rasterize_depth(
    setup: TriangleSetup,
    height: int,
    width: int,
    chunk: int = 64,
    y0=0.0,
) -> jnp.ndarray:
    """Depth-only rasterization (the shadowmap pass, XkShadowmapPass
    ZeldaEngine.cpp:1372/:3239). Returns (H, W) float32, clear = 1.0."""
    n_tris = setup.edge.shape[0]
    pad = (-n_tris) % chunk
    edge = jnp.pad(setup.edge, ((0, pad), (0, 0), (0, 0)))
    zc = jnp.pad(setup.zc, ((0, pad), (0, 0)))
    valid = jnp.pad(setup.valid, ((0, pad),))
    n_chunks = edge.shape[0] // chunk

    px, py = _pixel_grid(height, width, y0=y0)

    def body(best_depth, chunk_idx):
        sl = chunk_idx * chunk
        e = jax.lax.dynamic_slice_in_dim(edge, sl, chunk, 0)
        z = jax.lax.dynamic_slice_in_dim(zc, sl, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(valid, sl, chunk, 0)
        depth, _ = _coverage_chunk(e, z, v, px, py)
        return jnp.minimum(best_depth, jnp.min(depth, axis=0)), None

    init = jnp.full((height, width), 1.0, jnp.float32)
    depth, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return depth


def interpolation_coeffs(setup: TriangleSetup, tri_id: jnp.ndarray,
                         height: int, width: int,
                         y0=0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel perspective-correct barycentrics from a visibility buffer.

    Gathers the winning triangle's edge coefficients and normalizes:
    lambda_i = u_i / sum(u). Returns (bary (H,W,3), covered (H,W) bool).
    """
    covered = tri_id >= 0
    safe_id = jnp.maximum(tri_id, 0)
    e = setup.edge[safe_id]  # (H, W, 3, 3)
    px, py = _pixel_grid(height, width, y0=y0)
    u = e[..., 0] * px[..., None] + e[..., 1] * py[..., None] + e[..., 2]
    esum = jnp.sum(u, axis=-1, keepdims=True)
    bary = u / jnp.where(jnp.abs(esum) > 1e-20, esum, 1.0)
    return bary, covered

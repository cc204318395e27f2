"""Rasterizer correctness vs analytic expectations."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.ops.rasterize import (
    triangle_setup,
    rasterize_visibility,
    rasterize_depth,
    interpolation_coeffs,
)
from zeldaengine_tpu.math import look_at, perspective_vk
from zeldaengine_tpu.math.transforms import apply_mat4_h, matmul_f32


def _ndc_tri(v0, v1, v2):
    """Triangle given directly in NDC (w=1)."""
    tri = np.array([v0, v1, v2], np.float32)
    clip = np.concatenate([tri, np.ones((3, 1), np.float32)], axis=1)
    return jnp.asarray(clip)[None]


def test_single_triangle_coverage_and_depth():
    H = W = 64
    # Vulkan-front (CCW in y-down framebuffer) triangle covering the
    # upper-left half of the screen.
    clip = _ndc_tri([-1, -1, 0.5], [-1, 1, 0.5], [1, -1, 0.5])
    setup = triangle_setup(clip, W, H)
    assert bool(setup.valid[0])
    depth, tri = rasterize_visibility(setup, H, W, chunk=4)
    depth, tri = np.asarray(depth), np.asarray(tri)
    # Center of the covered half
    assert tri[16, 16] == 0
    np.testing.assert_allclose(depth[16, 16], 0.5, atol=1e-5)
    # Opposite corner uncovered
    assert tri[48, 48] == -1
    assert depth[48, 48] == 1.0
    # Roughly half the pixels covered
    frac = (tri >= 0).mean()
    assert 0.45 < frac < 0.55


def test_backface_culled_and_two_sided():
    H = W = 32
    # Reversed winding (back-facing under Vulkan conventions)
    clip = _ndc_tri([-1, -1, 0.5], [1, -1, 0.5], [-1, 1, 0.5])
    setup = triangle_setup(clip, W, H)
    assert not bool(setup.valid[0])
    setup2 = triangle_setup(clip, W, H, two_sided=True)
    assert bool(setup2.valid[0])
    _, tri = rasterize_visibility(setup2, H, W, chunk=1)
    assert np.asarray(tri)[8, 8] == 0


def test_depth_test_nearest_wins():
    H = W = 32
    far_tri = _ndc_tri([-1, -1, 0.8], [-1, 1, 0.8], [1, -1, 0.8])
    near_tri = _ndc_tri([-1, -1, 0.2], [-1, 1, 0.2], [1, -1, 0.2])
    clip = jnp.concatenate([far_tri, near_tri], axis=0)
    setup = triangle_setup(clip, W, H)
    depth, tri = rasterize_visibility(setup, H, W, chunk=1)
    assert np.asarray(tri)[8, 8] == 1
    np.testing.assert_allclose(np.asarray(depth)[8, 8], 0.2, atol=1e-5)
    # order independence
    clip_r = jnp.concatenate([near_tri, far_tri], axis=0)
    setup_r = triangle_setup(clip_r, W, H)
    _, tri_r = rasterize_visibility(setup_r, H, W, chunk=1)
    assert np.asarray(tri_r)[8, 8] == 0


def test_depth_range_clip():
    H = W = 16
    # z outside [0,1] is rejected (Vulkan depth clip)
    behind = _ndc_tri([-1, -1, -0.5], [-1, 1, -0.5], [1, -1, -0.5])
    setup = triangle_setup(behind, W, H)
    _, tri = rasterize_visibility(setup, H, W, chunk=1)
    assert (np.asarray(tri) == -1).all()


def test_perspective_triangle_interpolation():
    """A camera-facing quad-like triangle: check perspective-correct depth
    against a direct ray intersection."""
    H = W = 64
    eye = np.array([0.0, -3.0, 0.0], np.float32)
    view = look_at(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]))
    proj = perspective_vk(np.radians(60.0), 1.0, 0.1, 100.0)
    vp = matmul_f32(proj, view)
    # Triangle in the world XZ plane (y=0), straddling the view center.
    world = jnp.array(
        [[-2.0, 0.0, -2.0], [2.0, 0.0, -2.0], [0.0, 0.0, 3.0]], jnp.float32
    )
    clip = apply_mat4_h(vp, world)[None]
    setup = triangle_setup(clip, W, H, two_sided=True)
    assert bool(setup.valid[0])
    depth, tri = rasterize_visibility(setup, H, W, chunk=1)
    assert np.asarray(tri)[32, 32] == 0
    # Analytic: ray through screen center hits the plane y=0 at distance 3
    # from the eye; NDC depth for view-z = -3:
    near, far = 0.1, 100.0
    z_expect = (far / (near - far)) * (-3.0) * (-1) / 3.0 - (far * near / (far - near)) / 3.0
    # z_clip = m22 * z_view + m23; w = -z_view = 3
    m22 = far / (near - far)
    m23 = -(far * near) / (far - near)
    z_expect = (m22 * (-3.0) + m23) / 3.0
    np.testing.assert_allclose(np.asarray(depth)[32, 32], z_expect, rtol=1e-4)

    # Barycentric interpolation of world position reproduces the hit point.
    bary, covered = interpolation_coeffs(setup, tri, H, W)
    assert bool(covered[32, 32])
    # Pixel [32,32] samples at (32.5, 32.5): half a pixel off screen center,
    # which is ~0.027 world units at this distance/fov.
    p = np.asarray(bary)[32, 32] @ np.asarray(world)
    np.testing.assert_allclose(p, [0.0, 0.0, 0.0], atol=6e-2)


def test_partially_behind_camera_triangle():
    """A triangle crossing the w=0 plane still rasterizes its visible part
    (no geometric clipping)."""
    H = W = 64
    eye = np.array([0.0, 0.0, 1.0], np.float32)
    view = look_at(eye, np.array([0.0, 1.0, 1.0]), np.array([0.0, 0.0, 1.0]))
    proj = perspective_vk(np.radians(90.0), 1.0, 0.1, 50.0)
    vp = matmul_f32(proj, view)
    # A huge ground-plane triangle extending behind the camera.
    world = jnp.array(
        [[-40.0, -40.0, 0.0], [40.0, -40.0, 0.0], [0.0, 40.0, 0.0]], jnp.float32
    )
    clip = apply_mat4_h(vp, world)
    w_signs = np.asarray(clip[:, 3])
    assert (w_signs < 0).any() and (w_signs > 0).any()  # genuinely crossing
    setup = triangle_setup(clip[None], W, H, two_sided=True)
    assert bool(setup.valid[0])
    depth, tri = rasterize_visibility(setup, H, W, chunk=1)
    tri = np.asarray(tri)
    # The ground ahead (bottom half of screen, camera looking at horizon)
    # must be covered; the sky (top half) must not.
    assert tri[60, 32] == 0, "ground near bottom of screen should be hit"
    assert tri[4, 32] == -1, "sky should be empty"
    # bbox is conservative full-screen for w-crossing triangles
    np.testing.assert_allclose(np.asarray(setup.bbox[0]), [0, 0, W, H])


def test_rasterize_depth_matches_visibility_depth():
    H = W = 32
    tris = []
    rng = np.random.RandomState(5)
    for _ in range(10):
        base = rng.uniform(-1, 1, (3, 2))
        z = rng.uniform(0.1, 0.9)
        tri = np.concatenate([base, np.full((3, 1), z), np.ones((3, 1))], 1)
        tris.append(tri)
    clip = jnp.asarray(np.stack(tris), jnp.float32)
    setup = triangle_setup(clip, W, H, two_sided=True)
    d1, _ = rasterize_visibility(setup, H, W, chunk=4)
    d2 = rasterize_depth(setup, H, W, chunk=4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

"""Golden tests for GLM-compatible math (SURVEY.md §7 step 1)."""

import numpy as np
import jax.numpy as jnp

from zeldaengine_tpu.math import (
    look_at,
    perspective,
    perspective_vk,
    make_rot_matrix,
    euler_instance_matrix,
    transform_matrix,
    hue2rgb,
)
from zeldaengine_tpu.math.transforms import apply_mat4_h, rotate_z, quat_to_mat4


def test_look_at_matches_glm():
    eye = np.array([5.0, 5.0, 5.0])
    center = np.array([0.0, 0.0, 0.5])
    up = np.array([0.0, 0.0, 1.0])
    m = np.asarray(look_at(eye, center, up))
    # A point at the camera position maps to the origin.
    p = m @ np.array([*eye, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # The lookat target lies on the -Z axis in view space (RH).
    q = m @ np.array([*center, 1.0])
    np.testing.assert_allclose(q[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(q[1], 0.0, atol=1e-5)
    assert q[2] < 0
    np.testing.assert_allclose(-q[2], np.linalg.norm(eye - center), rtol=1e-6)
    # Rotation part is orthonormal.
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_perspective_zero_to_one_depth():
    near, far = 0.1, 45.0
    m = np.asarray(perspective(np.radians(45.0), 16 / 9, near, far))
    # Point on the near plane -> ndc z = 0; far plane -> ndc z = 1.
    pn = m @ np.array([0, 0, -near, 1.0])
    pf = m @ np.array([0, 0, -far, 1.0])
    np.testing.assert_allclose(pn[2] / pn[3], 0.0, atol=1e-6)
    np.testing.assert_allclose(pf[2] / pf[3], 1.0, atol=1e-5)
    # w = -z_view
    np.testing.assert_allclose(pn[3], near, rtol=1e-6)


def test_perspective_vk_flips_y():
    m = np.asarray(perspective(np.radians(45.0), 1.0, 0.1, 10.0))
    mv = np.asarray(perspective_vk(np.radians(45.0), 1.0, 0.1, 10.0))
    assert mv[1, 1] == -m[1, 1]
    np.testing.assert_allclose(np.delete(mv, 1, 0), np.delete(m, 1, 0))


def test_make_rot_matrix_identity_and_orthonormal():
    m0 = np.asarray(make_rot_matrix(jnp.zeros(3)))
    np.testing.assert_allclose(m0, np.eye(3), atol=1e-6)
    m = np.asarray(make_rot_matrix(jnp.array([0.3, 1.1, -0.7])))
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, rtol=1e-5)


def test_make_rot_matrix_component_axes():
    # r.x rotates about +Y: mx columns (c,0,s),(0,1,0),(-s,0,c)
    a = 0.5
    m = np.asarray(make_rot_matrix(jnp.array([a, 0.0, 0.0])))
    c, s = np.cos(a), np.sin(a)
    np.testing.assert_allclose(m, [[c, 0, -s], [0, 1, 0], [s, 0, c]], atol=1e-6)
    # r.y rotates about +Z
    m = np.asarray(make_rot_matrix(jnp.array([0.0, a, 0.0])))
    np.testing.assert_allclose(m, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)
    # r.z rotates about +X
    m = np.asarray(make_rot_matrix(jnp.array([0.0, 0.0, a])))
    np.testing.assert_allclose(m, [[1, 0, 0], [0, c, -s], [0, s, c]], atol=1e-6)


def test_euler_instance_matrix_is_transpose():
    r = jnp.array([0.2, -0.4, 1.3])
    np.testing.assert_allclose(
        np.asarray(euler_instance_matrix(r)),
        np.asarray(make_rot_matrix(r)).T,
    )


def test_transform_matrix_composition_order():
    # S @ R @ T: translation happens in object space before scale.
    loc = jnp.array([1.0, 0.0, 0.0])
    quat = jnp.array([1.0, 0.0, 0.0, 0.0])  # identity
    scale = jnp.array([2.0, 2.0, 2.0])
    m = np.asarray(transform_matrix(loc, quat, scale))
    p = m @ np.array([0.0, 0.0, 0.0, 1.0])
    # translate first (-> (1,0,0)) then scale (-> (2,0,0))
    np.testing.assert_allclose(p[:3], [2.0, 0.0, 0.0], atol=1e-6)


def test_quat_to_mat4_z_rotation():
    ang = 0.8
    q = jnp.array([np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)])
    np.testing.assert_allclose(
        np.asarray(quat_to_mat4(q)), np.asarray(rotate_z(jnp.float32(ang))), atol=1e-6
    )


def test_hue2rgb_known_values():
    np.testing.assert_allclose(np.asarray(hue2rgb(0.0)), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hue2rgb(1.0 / 3.0)), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hue2rgb(2.0 / 3.0)), [0, 0, 1], atol=1e-5)
    # loops via fract
    np.testing.assert_allclose(
        np.asarray(hue2rgb(1.25)), np.asarray(hue2rgb(0.25)), atol=1e-6
    )


def test_apply_mat4_h_matches_matmul():
    m = np.asarray(perspective_vk(np.radians(45.0), 1.5, 0.1, 50.0)) @ np.asarray(
        look_at(np.array([3.0, 2.0, 1.0]), np.zeros(3), np.array([0, 0, 1.0]))
    )
    pts = np.random.RandomState(1).randn(17, 3).astype(np.float32)
    got = np.asarray(apply_mat4_h(jnp.asarray(m), jnp.asarray(pts)))
    want = (np.concatenate([pts, np.ones((17, 1), np.float32)], 1) @ m.T)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

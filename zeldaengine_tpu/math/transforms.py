"""GLM-compatible transform math (column-vector convention, numpy layout).

The reference engine uses glm with ``GLM_FORCE_DEPTH_ZERO_TO_ONE``
(ZeldaEngine.cpp:41-42), i.e. right-handed view space with Vulkan-style
[0, 1] clip depth. glm stores matrices column-major (``m[col][row]``); here
matrices are standard numpy ``M[row, col]`` applied as ``M @ v`` to column
vectors, so ``M[r, c] == glm_m[c][r]``.

Parity sources (reference file:line):
- look_at           <- glm::lookAt used at ZeldaEngine.cpp:4650 (up=(0,0,1))
- perspective_vk    <- glm::perspective + proj[1][1] *= -1 (ZeldaEngine.cpp:4651, :4615)
- transform_matrix  <- XkTransfrom::GetMatrix (ZeldaEngine.cpp:398-406):
                       scale(I,S) * mat4_cast(Q) * translate(Location)
- make_rot_matrix   <- MakeRotMatrix (Shaders/Common.glsl:60-87), replicated
                       numerically including its axis-naming quirks
- euler_instance_matrix <- BaseInstanced.vert:69-75 instance placement
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def matmul_f32(a, b):
    """Matrix multiply at full fp32 precision.

    TPU matmuls default to bfloat16 passes; transform composition needs
    fp32, so every matrix product in the engine routes through here.
    """
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def _normalize(v, axis=-1, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps))


def look_at(eye, center, up):
    """glm::lookAtRH. Returns 4x4 view matrix."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = _normalize(center - eye)
    s = _normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    m = jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ]
    )
    return m


def perspective(fovy_radians, aspect, z_near, z_far):
    """glm::perspectiveRH_ZO (GLM_FORCE_DEPTH_ZERO_TO_ONE): depth in [0,1]."""
    tan_half = jnp.tan(jnp.asarray(fovy_radians, jnp.float32) / 2.0)
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    m00 = 1.0 / (aspect * tan_half)
    m11 = 1.0 / tan_half
    m22 = z_far / (z_near - z_far)
    m23 = -(z_far * z_near) / (z_far - z_near)
    return jnp.stack(
        [
            jnp.stack([m00, zero, zero, zero]),
            jnp.stack([zero, m11, zero, zero]),
            jnp.stack([zero, zero, m22 * one, m23 * one]),
            jnp.stack([zero, zero, -one, zero]),
        ]
    )


def perspective_vk(fovy_radians, aspect, z_near, z_far):
    """perspective with the Vulkan Y flip the reference applies
    (``Proj[1][1] *= -1``, ZeldaEngine.cpp:4615/:4658)."""
    m = perspective(fovy_radians, aspect, z_near, z_far)
    return m.at[1, 1].multiply(-1.0)


def rotate_z(angle):
    """glm::rotate(mat4(1), angle, (0,0,1)) — the stage-roll localToWorld
    (ZeldaEngine.cpp:4614)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, zero]),
            jnp.stack([s, c, zero, zero]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def quat_to_mat4(q):
    """glm::mat4_cast for quaternion (w, x, y, z)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    zero = jnp.zeros_like(w)
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy), zero]),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx), zero]),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy), zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def scale_mat(s3):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[0, 0].set(s3[0]).at[1, 1].set(s3[1]).at[2, 2].set(s3[2])


def translate_mat(t3):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[0, 3].set(t3[0]).at[1, 3].set(t3[1]).at[2, 3].set(t3[2])


def transform_matrix(location, quaternion, scale3d):
    """XkTransfrom::GetMatrix (ZeldaEngine.cpp:398-406).

    glm composes: M = scale(I, S); M *= mat4_cast(Q); M = translate(M, Loc)
    which in column-vector math is ``S @ R @ T`` (translation applied first
    in object space — the reference's exact, slightly unusual, order).
    """
    location = jnp.asarray(location, jnp.float32)
    quaternion = jnp.asarray(quaternion, jnp.float32)
    scale3d = jnp.asarray(scale3d, jnp.float32)
    return matmul_f32(matmul_f32(scale_mat(scale3d), quat_to_mat4(quaternion)), translate_mat(location))


def make_rot_matrix(r3):
    """Numerical replica of Common.glsl:60-87 MakeRotMatrix (3x3 part).

    The GLSL builds three matrices from (r.x, r.y, r.z) — despite the
    comments, mx rotates about +Y, my about +Z, mz about +X — and returns
    ``mz * my * mx``. GLSL ``m[i]`` is column i, so in row-major numpy:

      mx = [[ c,0,-s],[0,1,0],[ s,0,c]]   (angle r.x)
      my = [[ c,-s,0],[ s,c,0],[0,0,1]]   (angle r.y)
      mz = [[1,0,0],[0, c,-s],[0, s,c]]   (angle r.z)
    """
    r3 = jnp.asarray(r3, jnp.float32)
    sx, cx = jnp.sin(r3[..., 0]), jnp.cos(r3[..., 0])
    sy, cy = jnp.sin(r3[..., 1]), jnp.cos(r3[..., 1])
    sz, cz = jnp.sin(r3[..., 2]), jnp.cos(r3[..., 2])
    zero = jnp.zeros_like(sx)
    one = jnp.ones_like(sx)
    mx = jnp.stack(
        [
            jnp.stack([cx, zero, -sx], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([sx, zero, cx], -1),
        ],
        -2,
    )
    my = jnp.stack(
        [
            jnp.stack([cy, -sy, zero], -1),
            jnp.stack([sy, cy, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    mz = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cz, -sz], -1),
            jnp.stack([zero, sz, cz], -1),
        ],
        -2,
    )
    return matmul_f32(matmul_f32(mz, my), mx)


def euler_instance_matrix(rotation3):
    """The 3x3 used by BaseInstanced.vert:69-71.

    GLSL does ``position * mat3(rotMat)`` — a row-vector multiply, i.e.
    rotMat^T applied to a column vector. This returns the matrix R such that
    ``R @ p`` reproduces ``p * mat3(MakeRotMatrix(rotation))``.
    """
    return jnp.swapaxes(make_rot_matrix(rotation3), -1, -2)


def apply_mat4_point(m, p):
    """(..., 4, 4) @ point (..., 3) with w=1 -> (..., 3) (no divide)."""
    return (
        p[..., 0, None] * m[..., :3, 0]
        + p[..., 1, None] * m[..., :3, 1]
        + p[..., 2, None] * m[..., :3, 2]
        + m[..., :3, 3]
    )


def apply_mat4_h(m, p):
    """(4,4) @ (..., 3, ) point with w=1 -> homogeneous (..., 4)."""
    return (
        p[..., 0, None] * m[..., :, 0]
        + p[..., 1, None] * m[..., :, 1]
        + p[..., 2, None] * m[..., :, 2]
        + m[..., :, 3]
    )

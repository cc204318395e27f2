"""GPU-driven meshlet culling: frustum + backface-cone tests.

Implements what the reference bakes but never executes (XkMeshlet carries
bounds/cone data, ZeldaEngine.cpp:689-702; the runtime consumption is the
'WIP' of README.md:8). Fully vectorized over meshlets — one frame's cull of
a million-triangle scene is a handful of fused VPU ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def frustum_planes(view_proj: jnp.ndarray) -> jnp.ndarray:
    """Gribb-Hartmann plane extraction from a (4,4) view-proj matrix.

    Returns (6, 4) planes (a,b,c,d) with inside <=> a*x+b*y+c*z+d >= 0,
    for clip conventions -w<=x,y<=w, 0<=z<=w (Vulkan).
    """
    m = view_proj
    planes = jnp.stack(
        [
            m[3] + m[0],  # left:   x >= -w
            m[3] - m[0],  # right:  x <=  w
            m[3] + m[1],  # bottom
            m[3] - m[1],  # top
            m[2],         # near:   z >= 0
            m[3] - m[2],  # far:    z <= w
        ]
    )
    norm = jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    return planes / jnp.maximum(norm, 1e-20)


def frustum_cull_spheres(planes: jnp.ndarray, centers: jnp.ndarray,
                         radii: jnp.ndarray) -> jnp.ndarray:
    """visible mask (M,): sphere intersects/inside all 6 planes."""
    d = centers @ planes[:, :3].T + planes[None, :, 3]  # (M, 6)
    return jnp.all(d >= -radii[:, None], axis=1)


def cone_cull(centers, radii, cone_axis, cone_cutoff, camera_pos):
    """meshopt-style backface cone test (sphere-apex conservative form):

    culled <=> dot(normalize(center - camera), axis) >= cutoff + r/|c-cam|
    Returns the *visible* mask.
    """
    to_c = centers - camera_pos
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_c * to_c, axis=-1), 1e-20))
    dirn = to_c / dist[:, None]
    facing_away = jnp.sum(dirn * cone_axis, -1) >= (
        cone_cutoff + radii / dist
    )
    # cutoff >= 1 encodes "never cull" (degenerate normal spread)
    return ~(facing_away & (cone_cutoff < 1.0))


def meshlet_cull(
    meshlet_records: jnp.ndarray,  # (M, 16) from MeshletSet.arrays()
    view_proj: jnp.ndarray,
    camera_pos: jnp.ndarray,
    model: jnp.ndarray | None = None,
    cone: bool = True,
) -> jnp.ndarray:
    """Frustum + cone cull. Returns visible mask (M,).

    ``model`` (4,4) transforms bounds to world space (localToWorld).
    ``cone=False`` keeps the frustum test only — the shadow pass uses it
    with the LIGHT frustum (always exact: casters outside the shadow
    frustum cannot write the map) and adds the light-apex cone test only
    when the scene opts in (exact for closed meshes: a light-backfacing
    surface of a watertight mesh is never the nearest light-space depth).
    """
    centers = meshlet_records[:, 4:7]
    radii = meshlet_records[:, 7]
    axis = meshlet_records[:, 11:14]
    cutoff = meshlet_records[:, 14]
    if model is not None:
        centers = centers @ model[:3, :3].T + model[:3, 3]
        axis = axis @ model[:3, :3].T
        scale = jnp.linalg.norm(model[:3, :3], axis=0).max()
        radii = radii * scale
    planes = frustum_planes(view_proj)
    vis = frustum_cull_spheres(planes, centers, radii)
    if cone:
        vis = vis & cone_cull(centers, radii, axis, cutoff, camera_pos)
    return vis


def expand_meshlet_mask(visible: jnp.ndarray, tri_meshlet: jnp.ndarray):
    """Per-triangle validity from a per-meshlet visible mask — the
    'compacted indirect draw list' consumed by the rasterizer (the TPU
    analogue of vkCmdDrawIndexedIndirect over per-meshlet commands,
    ZeldaEngine.cpp:4216-4237)."""
    return visible[tri_meshlet]

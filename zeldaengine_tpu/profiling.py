"""Per-pass frame profiling — the tracing/observability subsystem the
reference lacks entirely (SURVEY.md §5 row 1: no timestamp queries, no
frame timers anywhere in ZeldaEngine.cpp).

``profile_passes`` decomposes one frame into independently jitted stages
(shadow raster, deferred raster, attribute resolve, PCF, lighting, sky)
and times each with honest fencing (a scalar fetch — ``block_until_ready``
returns early on some remote backends). Stage inputs are precomputed
device arrays, so each number is that stage's cost alone; ``full`` is the
whole fused frame for comparison (XLA fusion makes the parts sum to more
than the whole).
"""

from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.color import gamma_correct
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.lighting import shade_pixels
from zeldaengine_tpu.ops.rasterize import triangle_setup
from zeldaengine_tpu.passes import frame as F
from zeldaengine_tpu.passes.gbuffer import surface_attributes
from zeldaengine_tpu.scene.scenebuild import GpuScene, SceneMeta


def _fence(x) -> None:
    """Force execution to finish with ONE host fetch: reduce every leaf to
    a single scalar on device, then fetch it. (Per-leaf fetches each pay
    the ~29 ms tunnel round trip on the axon backend.)"""
    total = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    np.asarray(total)


def _time_stage(fn, args, reps: int) -> float:
    _fence(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        _fence(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times)) * 1000.0


def profile_passes(
    scene: GpuScene,
    view,
    meta: SceneMeta,
    config: EngineConfig,
    reps: int = 3,
    include_full: bool = True,
) -> Dict[str, float]:
    """Returns {stage: median ms}. Stages mirror RecordCommandBuffer's pass
    order (ZeldaEngine.cpp:3160-3744): shadow, deferred raster, attribute
    resolve, PCF shadow factor, lighting resolve, sky. ``vertex`` covers
    the vertex/binning work shared by the raster stages."""

    @jax.jit
    def vertex(scene, view):
        world = apply_mat4_point(view.model, scene.pair_pos)
        n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
        n_world = jnp.einsum(
            "pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
            precision=jax.lax.Precision.HIGHEST,
        )
        clip = apply_mat4_h(view.view_proj, world)
        setup = triangle_setup(
            clip[scene.tri_vtx], config.width, config.height,
            two_sided=scene.tri_two_sided,
            valid_mask=scene.tri_valid & scene.tri_deferred,
        )
        return world, n_world, setup

    @jax.jit
    def shadow(scene, view, world):
        clip_sh = apply_mat4_h(view.shadow_space, world)
        setup_sh = triangle_setup(
            clip_sh[scene.tri_vtx], config.shadowmap_dim,
            config.shadowmap_dim, two_sided=True,
            valid_mask=scene.tri_valid,
            depth_bias=(config.shadow_bias_constant,
                        config.shadow_bias_slope),
        )
        return F._raster_depth(setup_sh, config.shadowmap_dim, config)[0]

    @jax.jit
    def raster(setup):
        return F._raster_vis(setup, config.height, config.width, config)[:2]

    @jax.jit
    def attrs_fn(scene, setup, tid, world, n_world):
        return surface_attributes(scene, setup, tid, world, n_world, config,
                                  var_ch=meta.tex_channels)

    @jax.jit
    def pcf(shadowmap, world_pos, view):
        return F._shadow_factor(shadowmap, world_pos, view, config)

    @jax.jit
    def lighting(attrs, shadow_factor, view, scene):
        lit = shade_pixels(
            attrs.base_color, attrs.metallic, attrs.roughness, attrs.normal,
            attrs.ao, attrs.world_pos, shadow_factor, view,
            scene.cube_atlas, config.cubemap_size,
        )
        return gamma_correct(lit["final"] * attrs.mask[..., None])

    @jax.jit
    def sky(scene, view, depth):
        color = jnp.zeros((config.height, config.width, 3), jnp.float32)
        if config.skydome_mode == "analytic":
            return F._skydome_analytic(
                scene, view, depth, color, jnp.bool_(True),
                config.height, config.width, config, 0.0,
            )
        return F._skydome_mesh(
            scene, view, depth, color, jnp.bool_(True),
            config.height, config.width, config, 0.0, True,
        )

    out: Dict[str, float] = {}
    # Dispatch+fetch floor of this backend: subtract mentally from every
    # stage (remote/tunneled backends pay ~30 ms per call).
    out["null"] = _time_stage(jax.jit(lambda t: t + 1.0),
                              (jnp.float32(0),), reps)
    out["vertex"] = _time_stage(vertex, (scene, view), reps)
    world, n_world, setup = vertex(scene, view)
    if config.enable_shadow:
        out["shadow"] = _time_stage(shadow, (scene, view, world), reps)
        shadowmap = shadow(scene, view, world)
    else:
        shadowmap = jnp.ones(
            (config.shadowmap_dim, config.shadowmap_dim), jnp.float32
        )
    out["raster"] = _time_stage(raster, (setup,), reps)
    _, tid = raster(setup)
    out["attrs"] = _time_stage(
        attrs_fn, (scene, setup, tid, world, n_world), reps
    )
    attrs = attrs_fn(scene, setup, tid, world, n_world)
    if config.enable_shadow:
        out["pcf"] = _time_stage(pcf, (shadowmap, attrs.world_pos, view),
                                 reps)
        shadow_factor = pcf(shadowmap, attrs.world_pos, view)
    else:
        shadow_factor = jnp.ones(attrs.world_pos.shape[:2], jnp.float32)
    out["lighting"] = _time_stage(
        lighting, (attrs, shadow_factor, view, scene), reps
    )
    if meta.enable_skydome and config.enable_skydome:
        depth, _ = raster(setup)
        out["sky"] = _time_stage(sky, (scene, view, depth), reps)

    if include_full:
        full = jax.jit(
            functools.partial(F.render_rows, meta=meta, config=config)
        )
        out["full"] = _time_stage(full, (scene, view), reps)
    out["sum_of_parts"] = float(
        sum(v for k, v in out.items() if k not in ("full", "sum_of_parts"))
    )
    return out

"""Cumulative-prefix frame accounting in the steady-state harness."""
import time
import numpy as np, jax, jax.numpy as jnp
import jax.tree_util as jtu
from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.rasterize import triangle_setup
from zeldaengine_tpu.passes import frame as F
from zeldaengine_tpu.passes.gbuffer import surface_attributes, pack_gbuffer
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.scene.demo import build_demo_scene

def fence(x):
    total = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    np.asarray(total)

def t_of(fn, *args):
    fence(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.time(); fence(fn(*args)); ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000

config = EngineConfig()
scene, meta, world = build_demo_scene(config, grass=10000, rocks=65)
views = [build_view_state(world, config, time=0.1 * i,
                          light_capacities=(8, 16, 8)) for i in range(2)]
vstack = jtu.tree_map(lambda *xs: jnp.stack(xs), *views)
fence(vstack)
H, W = config.height, config.width

def stage_chain(scene, view, upto):
    world_p = apply_mat4_point(view.model, scene.pair_pos)
    n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
    n_world = jnp.einsum("pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
                         precision=jax.lax.Precision.HIGHEST)
    clip = apply_mat4_h(view.view_proj, world_p)
    if upto == 1:
        return clip.sum()
    setup = triangle_setup(clip[scene.tri_vtx], W, H,
                           two_sided=scene.tri_two_sided,
                           valid_mask=scene.tri_valid & scene.tri_deferred)
    clip_sh = apply_mat4_h(view.shadow_space, world_p)
    setup_sh = triangle_setup(clip_sh[scene.tri_vtx], 1024, 1024,
                              two_sided=True, valid_mask=scene.tri_valid,
                              depth_bias=(1.25, 7.5))
    shadowmap = F._raster_depth(setup_sh, 1024, config)
    if upto == 2:
        return shadowmap.sum()
    depth, tid = F._raster_vis(setup, H, W, config)
    if upto == 3:
        return depth.sum() + tid.sum()
    attrs = surface_attributes(scene, setup, tid, world_p, n_world, config)
    gbuf = pack_gbuffer(attrs, depth)
    if upto == 4:
        return gbuf.gbuffer_c.sum()
    color = F.resolve_lighting(gbuf, shadowmap, scene, view, config,
                               enable_vis=True)
    if upto == 5:
        return color.sum()
    show_env = view.debug_view == 0
    color, depth = F._skydome_analytic(scene, view, depth, color, show_env,
                                       H, W, config, 0.0)
    return jnp.clip(color, 0.0, 1.0).sum()

def steady(upto):
    def run(n):
        @jax.jit
        def f(scene, vstack):
            def body(c, i):
                v = jtu.tree_map(lambda x: x[i % 2], vstack)
                v = v._replace(time=v.time + c * 1e-12)
                return c + stage_chain(scene, v, upto) * 1e-12, 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c
        return t_of(f, scene, vstack)
    return (run(5) - run(1)) / 4

prev = 0.0
for upto, name in ((1, "vertex"), (2, "+shadow"), (3, "+vis raster"),
                   (4, "+attrs/gbuf"), (5, "+resolve"), (6, "+sky")):
    t = steady(upto)
    print(f"{name:12s}: {t:7.1f}  (marginal {t - prev:+.1f})")
    prev = t

"""Steady-state stage costs with real data dependencies."""
import time
import numpy as np, jax, jax.numpy as jnp
import jax.tree_util as jtu
from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.rasterize import triangle_setup
from zeldaengine_tpu.ops.rasterize_pallas import build_pairs, rasterize_pairs
from zeldaengine_tpu.passes import frame as F
from zeldaengine_tpu.passes.gbuffer import surface_attributes
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
view = build_view_state(world, config, light_capacities=(8, 16, 8))
H, W = config.height, config.width
PH, PW = config.padded_height, config.padded_width

@jax.jit
def vstage(scene, view):
    world_p = apply_mat4_point(view.model, scene.pair_pos)
    n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
    n_world = jnp.einsum("pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
                         precision=jax.lax.Precision.HIGHEST)
    clip = apply_mat4_h(view.view_proj, world_p)
    setup = triangle_setup(clip[scene.tri_vtx], W, H,
                           two_sided=scene.tri_two_sided,
                           valid_mask=scene.tri_valid & scene.tri_deferred)
    return world_p, n_world, setup

world_p, n_world, setup = vstage(scene, view)
pairs0 = jax.jit(lambda s: build_pairs(s, PW, PH, 32, 128, expand=8))(setup)
depth0, tid0 = jax.jit(lambda p: rasterize_pairs(p, PH, PW, sub_rows=8))(pairs0)
for x in (world_p, n_world, setup, pairs0, depth0, tid0):
    fence(x)

def rate(make_body, tag, n1=1, n2=5):
    def run(n):
        @jax.jit
        def f(c0):
            def body(c, _):
                return make_body(c), 0.0
            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c
        return t_of(f, jnp.float32(1e-12))
    print(tag, round((run(n2) - run(n1)) / (n2 - n1), 1))

def vary_setup(c):
    return setup._replace(zc=setup.zc * (1.0 + c))

rate(lambda c: c + F._raster_vis(vary_setup(c), H, W, config)[0].sum() * 1e-12,
     "raster full (prep+kernel):")
rate(lambda c: c + build_pairs(vary_setup(c), PW, PH, 32, 128,
                               expand=8).records.sum() * 1e-12,
     "raster prep only        :")
def kern_body(c):
    p = pairs0._replace(records=pairs0.records * (1.0 + c))
    return c + rasterize_pairs(p, PH, PW, sub_rows=8)[0].sum() * 1e-12
rate(kern_body, "raster kernel only      :")
def attrs_body(c):
    wp = world_p * (1.0 + c)
    a = surface_attributes(scene, setup, tid0[:H, :W], wp, n_world, config)
    return c + a.world_pos.sum() * 1e-12
rate(attrs_body, "attrs (true)            :")

"""Attribute resolve_lighting's cost (steady harness)."""
import time
import numpy as np, jax, jax.numpy as jnp
from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.math.color import gamma_correct
from zeldaengine_tpu.math.transforms import apply_mat4_h, apply_mat4_point
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.lighting import shade_pixels
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

def rate(body, tag, n1=1, n2=7):
    def run(n):
        @jax.jit
        def f(seed, scene, gbuf, sm, view):
            def bd(c, _):
                return body(c, scene, gbuf, sm, view), 0.0
            c, _ = jax.lax.scan(bd, seed, None, length=n)
            return c
        return t_of(f, seed0, scene, gbuf, sm, view)
    print(tag, round((run(n2) - run(n1)) / (n2 - n1), 1))

config = EngineConfig()
scene, meta, world = build_demo_scene(config, grass=10000, rocks=65)
view = build_view_state(world, config, light_capacities=(8, 16, 8))
H, W = config.height, config.width

@jax.jit
def upstream(scene, view):
    world_p = apply_mat4_point(view.model, scene.pair_pos)
    n1 = apply_mat4_point(view.model, pbr.normalize(scene.pair_nrm))
    n_world = jnp.einsum("pij,pj->pi", scene.rot_table[scene.pair_rot], n1,
                         precision=jax.lax.Precision.HIGHEST)
    clip = apply_mat4_h(view.view_proj, world_p)
    setup = triangle_setup(clip[scene.tri_vtx], W, H,
                           two_sided=scene.tri_two_sided,
                           valid_mask=scene.tri_valid & scene.tri_deferred)
    clip_sh = apply_mat4_h(view.shadow_space, world_p)
    setup_sh = triangle_setup(clip_sh[scene.tri_vtx], 1024, 1024,
                              two_sided=True, valid_mask=scene.tri_valid,
                              depth_bias=(1.25, 7.5))
    sm = F._raster_depth(setup_sh, 1024, config)
    depth, tid = F._raster_vis(setup, H, W, config)
    attrs = surface_attributes(scene, setup, tid, world_p, n_world, config)
    return pack_gbuffer(attrs, depth), sm

gbuf, sm = upstream(scene, view)
fence(gbuf); fence(sm)
key = jax.random.PRNGKey(0)
seed0 = jax.jit(lambda: jax.random.uniform(key, (H, W)))()
fence(seed0)

def vary(c, gbuf):
    return gbuf._replace(gbuffer_d=gbuf.gbuffer_d + c[..., None] * 1e-9)

rate(lambda c, scene, gbuf, sm, view:
     c + F.resolve_lighting(vary(c, gbuf), sm, scene, view, config,
                            enable_vis=True).sum(-1) * 1e-9,
     "resolve vis=True :")
rate(lambda c, scene, gbuf, sm, view:
     c + F.resolve_lighting(vary(c, gbuf), sm, scene, view, config,
                            enable_vis=False).sum(-1) * 1e-9,
     "resolve vis=False:")

def resolve_core(c, scene, gbuf, sm, view, with_pcf=True, with_light=True):
    g = vary(c, gbuf)
    base_color = g.gbuffer_c[..., :3]
    metallic = pbr.saturate(g.gbuffer_b[..., 0])
    roughness = jnp.maximum(0.01, pbr.saturate(g.gbuffer_b[..., 2]))
    normal = g.gbuffer_a[..., :3] * 2.0 - 1.0
    ao = pbr.saturate(g.gbuffer_c[..., 3])
    mask = g.scene_color[..., 3]
    world_pos = g.gbuffer_d[..., :3]
    if with_pcf:
        sf = F._shadow_factor(sm, world_pos, view, config,
                              valid=g.depth < 1.0)
    else:
        sf = jnp.ones((H, W), jnp.float32) * (1 + c * 1e-12)
    if with_light:
        lit = shade_pixels(base_color, metallic, roughness, normal, ao,
                           world_pos, sf, view, scene.cube_atlas,
                           config.cubemap_size)
        final = gamma_correct(lit["final"] * mask[..., None])
    else:
        final = base_color * sf[..., None]
    return c + final.sum(-1) * 1e-9

rate(lambda c, s, g, m, v: resolve_core(c, s, g, m, v, True, True),
     "core pcf+light   :")
rate(lambda c, s, g, m, v: resolve_core(c, s, g, m, v, False, True),
     "core light only  :")
rate(lambda c, s, g, m, v: resolve_core(c, s, g, m, v, True, False),
     "core pcf only    :")

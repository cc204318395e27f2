"""Frame-cost attribution by config toggles (steady-state scan harness)."""
import time
import numpy as np, jax, jax.numpy as jnp
import jax.tree_util as jtu
from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.passes.frame import render_rows
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

base = EngineConfig()
scene, meta, world = build_demo_scene(base, grass=10000, rocks=65)
views = [build_view_state(world, base, time=0.1 * i,
                          light_capacities=(8, 16, 8)) for i in range(2)]
vstack = jtu.tree_map(lambda *xs: jnp.stack(xs), *views)
fence(vstack)

def steady(config, meta_over=None):
    m = meta_over or meta
    def run(n):
        @jax.jit
        def f(scene, vstack):
            def body(c, i):
                v = jtu.tree_map(lambda x: x[i % 2], vstack)
                v = v._replace(time=v.time + c * 1e-12)
                img, aux = render_rows(scene, v, m, config)
                return c + jnp.sum(img) * 1e-9, 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c
        return t_of(f, scene, vstack)
    return (run(5) - run(1)) / 4

full = steady(base)
print(f"full           : {full:.1f}")
print(f"no shadow+pcf  : {steady(base.replace(enable_shadow=False)):.1f}")
print(f"no skydome     : {steady(base.replace(enable_skydome=False)):.1f}")
print(f"no both        : {steady(base.replace(enable_shadow=False, enable_skydome=False)):.1f}")

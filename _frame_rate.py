"""Ground-truth frame cost: N frames inside one jit (scan over varying
views), differenced — immune to the tunnel's 25-55 ms dispatch noise."""
import time, sys
import numpy as np, jax, jax.numpy as jnp
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

config = EngineConfig()
scene, meta, world = build_demo_scene(config, grass=10000, rocks=65)
views = [build_view_state(world, config, time=0.1 * i,
                          light_capacities=(8, 16, 8)) for i in range(2)]
# stack the two views so scan can alternate (shapes identical)
import jax.tree_util as jtu
vstack = jtu.tree_map(lambda *xs: jnp.stack(xs), *views)
fence(vstack)

def run(n):
    @jax.jit
    def f(scene, vstack):
        def body(c, i):
            v = jtu.tree_map(lambda x: x[i % 2], vstack)
            # fold the carry into the view time so no frame is hoisted
            v = v._replace(time=v.time + c * 1e-12)
            img, aux = render_rows(scene, v, meta, config)
            return c + jnp.sum(img) * 1e-9, 0.0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return c
    return t_of(f, scene, vstack)

n1, n2 = 1, 5
t1, t2 = run(n1), run(n2)
print(f"frame_ms (steady-state): {(t2 - t1) / (n2 - n1):.1f}")

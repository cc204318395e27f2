"""A/B cube atlas layouts for reflection_color (steady harness)."""
import time
import numpy as np, jax, jax.numpy as jnp
from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.ops import pbr
from zeldaengine_tpu.ops.lighting import reflection_color
from zeldaengine_tpu.ops.texture import build_packed_mip_atlas, build_mip_pair_atlas
from zeldaengine_tpu.scene.demo import build_demo_scene
from zeldaengine_tpu.passes.view import build_view_state

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

def rate(body, *args, n1=1, n2=7):
    def run(n):
        @jax.jit
        def f(seed, *args):
            def bd(c, _):
                return body(c, *args), 0.0
            c, _ = jax.lax.scan(bd, seed, None, length=n)
            return c
        return t_of(f, seed0, *args)
    return round((run(n2) - run(n1)) / (n2 - n1), 1)

config = EngineConfig()
scene, meta, world = build_demo_scene(config, grass=10000, rocks=65)
view = build_view_state(world, config, light_capacities=(8, 16, 8))
H, W = 1080, 1920
key = jax.random.PRNGKey(0)
seed0 = jax.jit(lambda: jax.random.uniform(key, (H, W)))()
fence(seed0)

# rebuild raw cube faces from the scene's packed atlas mip0 (groups 0 = t00)
cube_p = scene.cube_atlas  # (6, S, 2S, 16) packed
S = cube_p.shape[1]
faces = np.asarray(cube_p[:, :, :S, :4].astype(jnp.float32))
cube_pair = jnp.asarray(build_mip_pair_atlas(faces), jnp.bfloat16)       # 52ch
pad = np.zeros(faces.shape[:-1] + (12,), np.float32)
cube_pair64 = jnp.asarray(
    build_mip_pair_atlas(np.concatenate([faces, pad], -1))[..., :],
    jnp.bfloat16)  # 16base -> 208ch (as combined)
fence(cube_pair); fence(cube_pair64)

base_color = jnp.ones((H, W, 3)) * 0.5
metallic = jnp.ones((H, W)) * 0.3
rough = jnp.ones((H, W)) * 0.4
ao = jnp.ones((H, W))

def refl_body(c, atlas):
    n = pbr.normalize(jnp.stack([jnp.sin(c), jnp.cos(c), jnp.ones_like(c)], -1))
    v = pbr.normalize(jnp.stack([jnp.cos(c), jnp.sin(c * 1.3), jnp.ones_like(c)], -1))
    ndotv = pbr.saturate(jnp.sum(n * v, -1))
    out = reflection_color(base_color, metallic, rough + c * 1e-9, n, v,
                           ndotv, ao, atlas, config.cubemap_size,
                           view.lights_count[3])
    return c + out.sum(-1) * 1e-9

print("cube 2x2-packed 16ch (2 taps):", rate(refl_body, scene.cube_atlas))
print("cube mip-pair 52ch (1 tap)   :", rate(refl_body, cube_pair))
print("cube mip-pair 208ch (1 tap)  :", rate(refl_body, cube_pair64))

import time
import numpy as np, jax, jax.numpy as jnp

def fence(x):
    np.asarray(jnp.sum(x.astype(jnp.float32)))

def t_of(fn, *args):
    fence(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.time(); fence(fn(*args)); ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000

def rate(tbl, n1=1, n2=9):
    rows = tbl.shape[0]
    def run(n):
        @jax.jit
        def f(tbl, c0):
            def body(c, _):
                i = (jnp.abs(c) * 7919.7).astype(jnp.int32) % rows
                return c + tbl[i].sum(-1) * 1e-12, 0.0
            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c
        return t_of(f, tbl, seed0)
    return round((run(n2) - run(n1)) / (n2 - n1), 1)

H, W = 1080, 1920
key = jax.random.PRNGKey(0)
seed0 = None
rows = 1 << 20
seed0 = jax.jit(lambda: jax.random.uniform(key, (H, W)))()
fence(seed0)
for C in (4, 7, 8, 16, 32, 64, 128):
    tbl = jax.jit(lambda: jax.random.uniform(key, (rows, C)))()
    fence(tbl)
    print(f"({rows}x{C}) f32 [{rows*C*4>>20}MB logical]: {rate(tbl)} ms/gather")

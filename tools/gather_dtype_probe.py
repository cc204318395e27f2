"""Probe: XLA gather cost vs row dtype/width at the supertexture scale.

The round-3 gather curve (BASELINE.md) showed per-op cost jumps from
~4.5 ms to ~8 ms when rows cross ~256 B (104ch f32 vs 208ch f32-equiv).
The combined supertexture row is 208ch bf16 = 416 B. If u8 rows
(208 B) fall back into the fast tier, quantizing the atlas to u8 saves
~4 ms/frame. This measures gather+decode+reduce cost for each layout
with 2M indices (the 1080p pixel count).

Usage: python tools/gather_dtype_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def steady(f, *args, n1=1, n2=8, reps=3):
    def run(n):
        @jax.jit
        def g(*a):
            def body(c, i):
                return c + f(*a, c) * 1e-12, 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c
        float(g(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(g(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


def main():
    R = 131072
    N = 1920 * 1080
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, size=(N,)), jnp.int32)

    def mk(dtype, ch):
        return jnp.asarray(
            rng.random((R, ch), np.float32).astype(dtype)
            if dtype != np.uint8
            else rng.integers(0, 256, (R, ch), dtype=np.uint8)
        )

    cases = [
        ("bf16 208ch (416B, current)", jnp.bfloat16, 208),
        ("u8 208ch (208B)", np.uint8, 208),
        ("bf16 104ch (208B)", jnp.bfloat16, 104),
        ("u8 104ch (104B)", np.uint8, 104),
        ("f32 52ch (208B)", jnp.float32, 52),
    ]
    for name, dt, ch in cases:
        tab = mk(dt, ch)

        def f(t, i, c):
            g = t[(i + c.astype(jnp.int32)) % R]
            return jnp.sum(g[..., :4].astype(jnp.float32))

        print(f"{name}: {steady(f, tab, idx):.2f} ms", flush=True)

    # u8 + full decode of all 208 channels to f32 (the real consumer
    # decodes every channel it filters).
    tab = mk(np.uint8, 208)

    def fdec(t, i, c):
        g = t[(i + c.astype(jnp.int32)) % R].astype(jnp.float32) \
            * jnp.float32(1 / 255)
        return jnp.sum(g)

    print(f"u8 208ch + full f32 decode: {steady(fdec, tab, idx):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

"""Probe: demo-scene texture LOD / combo distribution + gather-cost A/B.

Questions this answers (round-3 texture lever, ~16 ms of the 92 ms
frame):
  1. What fraction of demo pixels sample at lod >= L?  If most pixels
     are minified, a small "levels >= L" sub-table could serve them in
     the fast gather regime, with the big table only touched by a
     compacted minority.
  2. What does the supertexture gather cost as a function of table row
     count and index count, measured with the in-jit scan-differencing
     protocol on the real index distribution?

Usage: python tools/tex_lod_probe.py
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
    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=1920, height=1080, raster="fused",
                          pcf_backend="vmem")
    t0 = time.time()
    scene, meta, world = build_demo_scene(config)
    print(f"# scene build {time.time()-t0:.1f}s", flush=True)
    view = build_view_state(world, config, time=0.5)

    A = scene.combined_atlas
    print("combined_atlas", A.shape, A.dtype,
          f"{np.prod(A.shape) * A.dtype.itemsize / 1e6:.1f} MB")

    # ---- 1. real per-pixel lod/combo via the lodprobe ablation
    cap = config.replace(ablate="lodprobe", enable_skydome=False,
                         enable_background=False)
    pview = view._replace(debug_view=jnp.int32(1))
    img = np.asarray(jax.jit(
        lambda s, v: render_rows(s, v, meta, cap)[0]
    )(scene, pview))
    lod = img[..., 0] * 16.0
    combo = np.round(img[..., 1] * 64.0).astype(np.int32)
    covered = img[..., 2] > 0.5
    n_cov = int(covered.sum())
    print(f"covered {n_cov} / {covered.size} = {n_cov/covered.size:.3f}")
    lc = lod[covered]
    for L in (1, 2, 3, 4, 5):
        print(f"  lod >= {L}: {float((lc >= L).mean()):.3f}")
    print("  lod hist:", np.histogram(lc, bins=np.arange(10))[0])
    print("  combos used:", np.unique(combo[covered]))

    # ---- 2. gather cost vs table rows / index count (bf16 rows like
    # the real atlas; indices drawn from the captured distribution)
    H, W = lod.shape
    rows_full = A.shape[0] * A.shape[1] * A.shape[2]
    flat = jnp.asarray(A).reshape(rows_full, A.shape[-1])
    # real-ish indices: uniform rows weighted toward high-mip offsets
    rng = np.random.default_rng(0)
    idx_real = jnp.asarray(
        rng.integers(0, rows_full, size=(H, W)), jnp.int32)
    ms = steady(lambda f, i, c: jnp.sum(f[(i + c.astype(jnp.int32))
                                          % rows_full][..., :4]
                                        .astype(jnp.float32)),
                flat, idx_real)
    print(f"full-table gather ({rows_full} rows, {A.shape[-1]}ch bf16): "
          f"{ms:.2f} ms")
    for frac in (0.5, 0.25, 0.125):
        r = int(rows_full * frac)
        ms = steady(
            lambda f, i, c, r=r: jnp.sum(
                f[:r][(i + c.astype(jnp.int32)) % r][..., :4]
                .astype(jnp.float32)),
            flat, idx_real)
        print(f"  {r} rows: {ms:.2f} ms")
    # index-count scaling: gather over a compacted subset
    for frac in (0.5, 0.25, 0.125):
        n = int(H * W * frac)
        sub = idx_real.reshape(-1)[:n]
        ms = steady(
            lambda f, i, c: jnp.sum(
                f[(i + c.astype(jnp.int32)) % rows_full][..., :4]
                .astype(jnp.float32)),
            flat, sub)
        print(f"  {n} indices, full table: {ms:.2f} ms")


if __name__ == "__main__":
    main()

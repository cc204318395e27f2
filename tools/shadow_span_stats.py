"""Shadow-footprint locality stats for the in-VMEM PCF kernel design.

For each group of G consecutive pixels in a screen row, measures the
span (max-min, plus the PCF tap halo) of the shadow-map row index fy
and column index fx across the group, over the reference-scale demo
frame. If p99.9 spans fit a (16, 128) patch, the PCF kernel can slice
per-group patches straight out of a VMEM-resident shadowmap without
sorting pixels by shadow bin.

Usage: python tools/shadow_span_stats.py [--grass 10000 --rocks 65]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

# The axon backend cannot run host callbacks; force CPU the same way
# tests/conftest.py does (sitecustomize overrides a bare JAX_PLATFORMS).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    ap.add_argument("--group", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import zeldaengine_tpu.passes.frame as F
    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=1920, height=1080)  # auto -> jnp on CPU
    scene, meta, world = build_demo_scene(config, grass=args.grass,
                                          rocks=args.rocks)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))

    captured = {}
    orig = F._shadow_factor

    def patched(shadowmap, world_pos, view, cfg, valid=None):
        sc = F.compute_shadow_coord(view.shadow_space, world_pos)
        if sc.ndim == 3 and sc.shape[0] >= 256:  # the main resolve only
            jax.debug.callback(
                lambda a, v: captured.update(
                    sc=np.asarray(a),
                    valid=None if v is None else np.asarray(v)),
                sc, valid if valid is not None else jnp.ones(
                    sc.shape[:2], bool))
        return orig(shadowmap, world_pos, view, cfg, valid)

    F._shadow_factor = patched
    try:
        img = jax.jit(
            lambda s, v: F.render_rows(s, v, meta, config)[0]
        )(scene, view)
        img.block_until_ready()
    finally:
        F._shadow_factor = orig

    sc = captured["sc"]
    valid = captured["valid"]
    dim = config.shadowmap_dim
    w = sc[..., 3:4]
    scn = sc / np.where(np.abs(w) > 1e-20, w, 1.0)
    fy = scn[..., 1] * dim
    fx = scn[..., 0] * dim
    H, W = fy.shape
    G = args.group
    ngx = W // G
    halo = 7 + 1  # tap rows span floor(-3.0)..floor(3.0)+1 = 8 rows

    def spans(f):
        g = f[:, : ngx * G].reshape(H, ngx, G)
        m = valid[:, : ngx * G].reshape(H, ngx, G)
        lo = np.where(m, g, np.inf).min(-1)
        hi = np.where(m, g, -np.inf).max(-1)
        any_cov = m.any(-1)
        s = np.where(any_cov, np.floor(hi) - np.floor(lo) + halo, 0.0)
        return s[any_cov]

    sy, sx = spans(fy), spans(fx)
    wrap = ((fy < 0) | (fy >= dim) | (fx < 0) | (fx >= dim)) & valid
    print(f"covered px: {valid.mean():.3f}  wrap px: {wrap.mean():.5f}")
    for name, s in (("y", sy), ("x", sx)):
        q = np.percentile(s, [50, 90, 99, 99.9, 100])
        print(f"{name}-span per {G}px group: p50={q[0]:.0f} p90={q[1]:.0f} "
              f"p99={q[2]:.0f} p99.9={q[3]:.0f} max={q[4]:.0f}")
    for (ty, tx) in ((16, 128), (16, 256), (32, 128), (32, 256), (64, 256)):
        fit = float(((sy <= ty) & (sx <= tx)).mean())
        print(f"fit ({ty:3d},{tx:3d}) patch: {fit*100:.2f}%")


if __name__ == "__main__":
    main()

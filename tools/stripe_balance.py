"""Striped vs contiguous multi-chip load balance on the DEMO scene.

VERDICT r4 #5: contiguous row bands put 73% of the demo's band-live
triangles on one device (content concentrates mid-screen). This probe
runs band_pair_stats both ways on the reference-scale demo over an
8-virtual-CPU-device mesh and prints per-device (live, pairs) with the
max/mean balance ratio (ask: striped <= 1.5).

Usage: python tools/stripe_balance.py [--grass 10000 --rocks 65 -n 8]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < args.n or jax.default_backend() != "cpu":
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.n)

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.parallel.tiles import (
        band_pair_stats, make_tile_mesh)
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=1920, height=1080, tile_h=64, tile_w=32)
    scene, meta, world = build_demo_scene(config, grass=args.grass,
                                          rocks=args.rocks)
    view = build_view_state(world, config, time=0.0,
                            light_capacities=(8, 16, 8))
    mesh = make_tile_mesh(jax.devices()[: args.n])

    for name, stripe in (("contiguous", False), ("striped", True)):
        st = band_pair_stats(scene, view, meta, config, mesh,
                             stripe=stripe)
        pairs = st[:, 1].astype(float)
        ratio = pairs.max() / max(pairs.mean(), 1.0)
        print(f"{name}: " + " ".join(
            f"d{i}=({int(a)},{int(b)})" for i, (a, b) in enumerate(st))
            + f"  max/mean pairs = {ratio:.2f}")


if __name__ == "__main__":
    main()

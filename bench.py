"""Benchmark driver: renders the headline config and prints ONE JSON line.

Headline metric (BASELINE.json): 1080p deferred-PBR frames/sec with meshlet
culling and PCF shadows on a single TPU chip; baseline target 60 FPS.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--grass", type=int, default=400)
    parser.add_argument("--rocks", type=int, default=64)
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    config = EngineConfig(width=args.width, height=args.height)
    scene, meta, world = build_demo_scene(
        config, grass=args.grass, rocks=args.rocks
    )
    n_tris = meta.num_triangles

    view = build_view_state(
        world, config, light_capacities=(16, 16, 16), animate_point_lights=True
    )

    @jax.jit
    def step(scene, view):
        color, _ = render_rows(scene, view, meta, config)
        return color

    def force(x):
        # NOTE: on the tunneled axon backend block_until_ready returns
        # before execution completes; a scalar fetch is the honest fence.
        return float(x.sum())

    t0 = time.time()
    force(step(scene, view))
    compile_s = time.time() - t0

    # Steady-state: vary time/lights per frame like the real loop would.
    times = []
    for i in range(args.frames):
        view_i = build_view_state(
            world, config, time=float(i) / 60.0, roll_light=float(i) * 0.02,
            light_capacities=(16, 16, 16),
        )
        t0 = time.time()
        color = step(scene, view_i)
        force(color)
        times.append(time.time() - t0)
    frame_s = float(np.median(times))
    fps = 1.0 / frame_s
    mtris = n_tris * fps / 1e6

    if args.verbose:
        print(
            f"# {n_tris} tris, compile {compile_s:.1f}s, frame "
            f"{frame_s * 1000:.1f} ms, {fps:.2f} fps, {mtris:.1f} Mtri/s",
            flush=True,
        )
        img = np.asarray(color)
        print(f"# image mean {img.mean():.4f}, coverage sane: {img.std():.4f}")

    print(
        json.dumps(
            {
                "metric": "1080p deferred-PBR frames/sec",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 4),
                "detail": {
                    "triangles": int(n_tris),
                    "mtris_per_sec": round(mtris, 2),
                    "frame_ms": round(frame_s * 1000, 2),
                    "resolution": f"{args.width}x{args.height}",
                    "compile_s": round(compile_s, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

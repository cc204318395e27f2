"""Benchmark driver: renders a BASELINE.json config and prints ONE JSON line.

Default (config 3) is the headline metric: 1080p deferred-PBR frames/sec
with PCF shadows on a single TPU chip; baseline target 60 FPS.

Configs (BASELINE.md):
  1  single mesh + 1 directional light, forward PBR, 512x512
  2  1k instanced cubes with shadow map + PCF, 1024x1024
  3  full deferred path @1080p (headline)
  4  GPU-driven meshlet scene: bake -> frustum/cone cull, ~1M tris
  5  livelink streaming: TCP world updates re-rendered per frame
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _force(x) -> float:
    # block_until_ready returns early on the tunneled axon backend; a
    # scalar fetch is the honest execution fence.
    return float(x.sum())


def _bench_loop(step, scene, make_view, frames):
    import jax  # noqa: F401

    t0 = time.time()
    _force(step(scene, make_view(0)))
    compile_s = time.time() - t0
    times = []
    for i in range(frames):
        view_i = make_view(i + 1)
        t0 = time.time()
        out = step(scene, view_i)
        _force(out)
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def _steady_loop(render, scene, make_view, frames):
    """Steady-state frame time: N frames inside ONE jitted scan, with the
    carry folded into each view so no frame hoists out of the loop, then
    differenced across two lengths. This removes the per-dispatch
    round-trip of the tunneled backend (25-55 ms of noise per call) that
    per-frame host timing cannot separate from device work.
    """
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    views = [make_view(i) for i in range(2)]
    vstack = jtu.tree_map(lambda *xs: jnp.stack(xs), *views)

    compile_s = [0.0]

    def run(n):
        @jax.jit
        def f(scene, vstack):
            def body(c, i):
                v = jtu.tree_map(lambda x: x[i % 2], vstack)
                v = v._replace(time=v.time + c * 1e-12)
                img = render(scene, v)
                return c + jnp.sum(img) * 1e-9, 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return c

        t0 = time.time()
        _force(f(scene, vstack))
        compile_s[0] += time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            _force(f(scene, vstack))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    n1, n2 = 1, max(frames, 2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), compile_s[0]


def _run_all(argv_rest, headline_last: bool = False) -> None:
    """--all: run every BASELINE config as a subprocess (fresh process =
    honest compile/caching behavior per config) and print one JSON line
    each. With --record, append a dated table to BASELINE.md so a config
    regression can never hide for a round (VERDICT r3 #3).

    ``headline_last``: the driver-invocation mode (bare ``python
    bench.py``) — configs 1/2/4/5 report to STDERR, config 3 runs LAST
    and its JSON line is the only stdout output (the driver parses
    stdout's tail), and the full table is always recorded. A failing
    side config never blocks the headline line (VERDICT r4 #7)."""
    import os
    import subprocess
    import sys

    record = "--record" in argv_rest or headline_last
    rest = [a for a in argv_rest if a != "--record"]
    here = os.path.dirname(os.path.abspath(__file__))
    order = (("1", "2", "3t", "4", "5", "3") if headline_last
             else ("1", "2", "3", "3t", "4", "5"))
    lines = []
    for c in order:
        cmd = [sys.executable, os.path.join(here, "bench.py"),
               "--config", c]
        if c in ("1", "2", "3t", "4"):
            cmd.append("--steady")
        cmd += rest
        r = None
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=7200 if c == "3" else 3600)
            out = (r.stdout.strip().splitlines() or ["{}"])[-1]
            parsed = json.loads(out)
        except (subprocess.TimeoutExpired, json.JSONDecodeError) as e:
            err = (r.stdout + r.stderr) if r is not None else str(e)
            parsed = {"metric": f"config {c}", "value": None,
                      "error": str(err)[-400:]}
        stream = sys.stderr if (headline_last and c != "3") else sys.stdout
        print(json.dumps(parsed), file=stream, flush=True)
        lines.append((c, parsed))
    if record:
        import datetime

        rows = ["", f"## bench --all {datetime.date.today()}", "",
                "| # | metric | value | frame_ms | per_dispatch_ms |", "|---|---|---|---|---|"]
        for c, p in sorted(lines, key=lambda cp: cp[0]):
            d = p.get("detail", {})
            rows.append(
                f"| {c} | {p.get('metric')} | {p.get('value')} "
                f"{p.get('unit', '')} | {d.get('frame_ms', '-')} "
                f"| {d.get('per_dispatch_ms', '-')} |"
            )
        with open(os.path.join(here, "BASELINE.md"), "a") as f:
            f.write("\n".join(rows) + "\n")


def main() -> None:
    import sys

    if len(sys.argv) == 1:
        # Bare `python bench.py` = the driver's end-of-round command:
        # run ALL five configs (so BASELINE.md records every row, every
        # round) but keep stdout's last line the headline config-3 JSON.
        _run_all([], headline_last=True)
        return
    if "--all" in sys.argv[1:]:
        _run_all([a for a in sys.argv[1:] if a != "--all"])
        return

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="3",
                        choices=("1", "2", "3", "3t", "4", "5"))
    parser.add_argument("--frames", type=int, default=8)
    # Headline default = the reference demo scale: 2 x 10,000 grass + 65
    # rocks + terrain (ZeldaUntitled.py:103-128).
    parser.add_argument("--grass", type=int, default=10000)
    parser.add_argument("--rocks", type=int, default=65)
    parser.add_argument("--lights", type=int, default=16,
                        help="point lights for config 3 (>64 exercises "
                             "tiled light culling at 512 capacity)")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--steady", action="store_true",
                        help="steady-state scan timing (subtracts the "
                             "tunneled backend's per-dispatch round trip)")
    parser.add_argument("--profile", action="store_true",
                        help="per-pass ms breakdown (profiling.py)")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--no-golden", action="store_true",
                        help="skip the cross-backend golden check that "
                             "normally gates the headline config")
    args = parser.parse_args()

    import jax

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene
    from zeldaengine_tpu.scene.scenebuild import SceneBuilder
    from zeldaengine_tpu.scene.world import World, CameraDesc, LightDesc

    def make_world(pos=(5.0, 5.0, 5.0), lookat=(0.0, 0.0, 0.5), z_far=60.0):
        w = World()
        w.main_camera = CameraDesc(
            position=np.asarray(pos, np.float32),
            lookat=np.asarray(lookat, np.float32),
            z_far=z_far,
        )
        moon = np.array([20.0, 0.0, 20.0], np.float32)
        w.directional_lights = [
            LightDesc(position=moon, type=0,
                      color=np.array([1.0, 0.95, 0.85], np.float32),
                      intensity=3.0, direction=moon / np.linalg.norm(moon))
        ]
        return w

    detail = {}

    # Wake the device link before any timed section: on the tunneled
    # backend the FIRST transfer of a process pays one-time connection
    # bring-up (measured 8-12 s of a "16 s" cold scene build; the same
    # build is 3.5 s once the link is up). That cost belongs to the
    # harness, not to scene building or frames.
    import jax.numpy as _jnp
    float(_jnp.zeros((), _jnp.float32) + 0.0)

    if args.config == "1":
        config = EngineConfig(width=512, height=512, shadowmap_dim=256,
                              enable_shadow=False, enable_skydome=False,
                              texture_size=128, cubemap_size=64,
                              background_size=128, max_point_lights=8)
        b = SceneBuilder(config)
        b.enable_skydome = False
        from zeldaengine_tpu.scene.mesh import make_sphere
        import os
        mesh = make_sphere(1.0, rings=48, sectors=96)
        ref = "/root/reference/Engine/ZeldaEngine/Content/Models/sphere.obj"
        if os.path.exists(ref):
            from zeldaengine_tpu.scene.mesh import load_obj
            mesh = load_obj(ref)
        b.add_object(mesh, b.add_material({}), deferred=False)
        scene, meta = b.build()
        world = make_world(pos=(0.0, -3.0, 1.0), lookat=(0.0, 0.0, 0.0))
        metric, unit, target = "forward-PBR 512px frames/sec", "fps", 60.0

    elif args.config == "2":
        config = EngineConfig(width=1024, height=1024, shadowmap_dim=1024,
                              texture_size=128, cubemap_size=64,
                              background_size=128, max_point_lights=8)
        b = SceneBuilder(config)
        from zeldaengine_tpu.scene.mesh import make_cube, make_plane
        b.add_object(make_plane(20.0, uv_scale=8.0), b.add_material({}))
        rng = np.random.RandomState(0)
        inst = np.zeros((1000, 8), np.float32)
        ang = rng.uniform(0, 2 * np.pi, 1000)
        rad = rng.uniform(2.0, 14.0, 1000)
        inst[:, 0] = np.sin(ang) * rad
        inst[:, 1] = np.cos(ang) * rad
        inst[:, 2] = 0.25
        inst[:, 4] = rng.uniform(0, np.pi, 1000)  # yaw
        inst[:, 6] = rng.uniform(0.3, 0.8, 1000)
        inst[:, 7] = rng.randint(0, 256, 1000)
        b.add_object(make_cube(1.0), b.add_material({}), instances=inst)
        scene, meta = b.build()
        world = make_world(pos=(14.0, 14.0, 9.0), lookat=(0.0, 0.0, 0.0))
        metric, unit, target = "instanced+PCF 1024px frames/sec", "fps", 60.0

    elif args.config == "4":
        # pair_expand=4: meshlet triangles are tiny on screen (a bbox
        # covering >4 tiles is rare), and pair-binning prep (T*E keys to
        # sort + gather) scales linearly with the cap at T~1M.
        # compact_tris (VERDICT r2 #2): live (post-cone-cull, on-screen)
        # triangles cumsum-compact into 512k slots BEFORE pair expansion,
        # so the sort/gather prep tracks the CULL RESULT (~half the
        # sphere meshlets face away) instead of the 1M-tri pool.
        # max_pairs: the record gather runs over live pairs only (the
        # sized indirect-command-buffer analogue).
        # Round-4 capacity audit: the shadow pass must not inherit the
        # camera cull's compact cap (it silently dropped ~half the 1.03M
        # casters in rounds 2-3); it gets its own capacity, sized after
        # the light-frustum + closed-mesh cone cull (the spheres are
        # watertight, so shadow_cone_cull is exact here).
        config = EngineConfig(width=1024, height=1024, shadowmap_dim=512,
                              texture_size=128, cubemap_size=64,
                              background_size=128, max_point_lights=8,
                              pair_expand=4,
                              # shadow casters are tiny in the 512px
                              # light view too: expand=2 measured -3 ms
                              pair_expand_shadow=2,
                              # Caps sized to MEASURED live counts under
                              # the sub-pixel cull (tools/c4_live_counts:
                              # camera 338k pairs, shadow 55k — at 512^2
                              # ~90% of casters cover no texel center);
                              # the record gathers are needle-count =
                              # CAP, so right-sized caps are the round-5
                              # c4 lever. Headroom ~1.15x cam / ~1.2x
                              # shadow; the rolled-light worst case is
                              # image-checked by tools/c4_image_ab
                              # (c4_shtrim bit-identical to wide caps).
                              compact_tris=384 * 1024,
                              compact_tris_shadow=96 * 1024,
                              shadow_cone_cull=True,
                              subpixel_cull=True,
                              max_pairs=384 * 1024,
                              max_pairs_shadow=64 * 1024)
        from zeldaengine_tpu.meshlet import build_meshlets
        from zeldaengine_tpu.scene.mesh import make_sphere

        b = SceneBuilder(config)
        mat = b.add_material({})
        # ~1M triangles: a dense sphere grid baked to meshlets
        total = 0
        t0 = time.time()
        rng = np.random.RandomState(1)
        for i in range(16):
            mesh = make_sphere(0.8, rings=140, sectors=230)  # ~64k tris
            offs = np.array(
                [(i % 4 - 1.5) * 2.2, (i // 4 - 1.5) * 2.2, 0.8], np.float32
            )
            ms = build_meshlets(mesh.positions + offs, mesh.indices,
                                normals=mesh.normals, uvs=mesh.uvs)
            b.add_meshlet_object(ms, mat)
            total += mesh.num_triangles
        bake_s = time.time() - t0
        scene, meta = b.build()
        world = make_world(pos=(6.0, -6.0, 3.0), lookat=(0.0, 0.0, 0.8),
                           z_far=80.0)
        detail.update(bake_s=round(bake_s, 2), meshlets=meta.num_meshlets)
        metric, unit = "meshlets culled/sec", "meshlets/s"
        target = None

        # Report the ACTUAL per-frame cull result (VERDICT r2 #2: a frame
        # where culling provably removes >=50% of meshlets): frustum +
        # backface-cone cull at this camera kills the away-facing half of
        # every sphere.
        import jax.numpy as jnp
        from zeldaengine_tpu.ops.culling import meshlet_cull
        from zeldaengine_tpu.passes.view import build_view_state as _bvs

        v0 = _bvs(world, config, time=0.0)
        vp_model = np.asarray(v0.view_proj) @ np.asarray(v0.model)
        vis = np.asarray(meshlet_cull(
            scene.meshlet_records, jnp.asarray(vp_model), v0.camera_pos,
            model=v0.model,
        ))
        culled = int(vis.size - vis.sum())
        detail.update(meshlets_culled=culled,
                      culled_frac=round(culled / max(vis.size, 1), 3))

    elif args.config == "5":
        # Livelink streaming: a procedurally generated world is sent over
        # TCP and re-rendered each frame (BASELINE config 5).
        import threading

        from zeldaengine_tpu.engine import Engine
        from zeldaengine_tpu.livelink import send_data_to_engine
        from zeldaengine_tpu.scene.world import make_demo_world

        config = EngineConfig(width=512, height=512, shadowmap_dim=512,
                              texture_size=128, cubemap_size=64,
                              background_size=128, max_point_lights=16)
        w = make_demo_world()
        w.object_descs[3].instance_count = 200
        w.object_descs[4].instance_count = 200
        port = 18085
        engine = Engine(config=config, world=w, livelink_port=port)
        engine.start()
        engine.tick()  # compile

        stop = threading.Event()

        def streamer():
            i = 0
            while not stop.is_set():
                w2 = make_demo_world()
                w2.object_descs[3].instance_count = 200
                w2.object_descs[4].instance_count = 200
                w2.main_camera.position = np.array(
                    [5.0 + 0.1 * i, 5.0, 5.0], np.float32
                )
                try:
                    send_data_to_engine(w2.to_json(), port=port)
                except OSError:
                    break
                i += 1
                time.sleep(0.05)

        t = threading.Thread(target=streamer, daemon=True)
        t.start()
        # Throughput protocol for the MAILBOX present mode (the
        # reference's preferred swapchain mode): ticks no longer block
        # on the tunneled device->host frame fetch, so per-tick host
        # timing would only measure dispatch. Time N ticks end-to-end,
        # then FENCE the device queue (a scalar fetched through the same
        # in-order execution stream completes after every queued frame)
        # — frames/sec counts device-COMPLETED rendered frames, exactly
        # the reference's uncapped mailbox FPS (ZeldaEngine.cpp:6589).
        import jax.numpy as jnp

        n = max(args.frames, 8) * 4  # enough frames that device gates
        t0 = time.time()
        for _ in range(n):
            engine.tick()
        float(jnp.zeros((), jnp.float32) + 0.0)  # device fence
        total = time.time() - t0
        stop.set()
        engine.stop()
        frame_s = total / n
        fps = 1.0 / frame_s
        print(json.dumps({
            "metric": "livelink streamed re-render frames/sec",
            "value": round(fps, 3),
            "unit": "fps",
            "vs_baseline": round(fps / 60.0, 4),
            "detail": {"frame_ms": round(frame_s * 1000, 2),
                       "frames": n,
                       "reloads": engine.stats.reloads,
                       "presents_dropped": engine.stats.presents_dropped,
                       "triangles": engine.stats.triangles,
                       "resolution": "512x512", "config": 5},
        }))
        return

    elif args.config == "3t":
        # Textured-headline guard (VERDICT r4 weak #6): the demo scene
        # with REAL per-slot PBR textures, so the per-pixel supertexture
        # gather, the TBN, and the variable-lod cube reflection are all
        # exercised — optimizations that only help the textureless path
        # can no longer regress the general path invisibly. Same frame
        # config as config 3.
        from zeldaengine_tpu.scene.demo import build_textured_demo_scene

        config = EngineConfig(width=1920, height=1080,
                              tile_h=64, tile_w=32,
                              max_pairs=384 * 1024,
                              max_pairs_shadow=256 * 1024)
        t0 = time.time()
        scene, meta, world = build_textured_demo_scene(
            config, grass=args.grass, rocks=args.rocks)
        detail.update(scene_build_s=round(time.time() - t0, 2),
                      instances=meta.num_instances,
                      tex_channels=len(meta.tex_channels or ()))
        metric, unit, target = \
            "1080p textured deferred-PBR frames/sec", "fps", 60.0

    else:  # config 3, headline
        # Round-3 tuned bundle (hardware A/B ledger, BASELINE.md): tall
        # narrow raster tiles (demo grass is vertical slivers — 64x32
        # quarters the dense pixels-x-pairs product), low-tier cube
        # reflection (one 39-ch gather; sky/bg ride the windowed VMEM
        # taps — beats the merged 208-ch env row by ~8 ms), live-pair
        # caps sized to the demo's worst frame.
        # reflection_half measured +5.2 ms at this scale (the 2x bilinear
        # upsample's row/lane interleave relayouts outweigh the halved
        # gather — BASELINE.md round 4): rejected from the bundle.
        config = EngineConfig(width=1920, height=1080,
                              tile_h=64, tile_w=32,
                              max_pairs=384 * 1024,
                              max_pairs_shadow=256 * 1024)
        t0 = time.time()
        scene, meta, world = build_demo_scene(config, grass=args.grass,
                                              rocks=args.rocks)
        build_s = time.time() - t0
        # Livelink reload budget: rebuild the scene pools once more, warm.
        t0 = time.time()
        build_demo_scene(config, grass=args.grass, rocks=args.rocks)
        detail.update(scene_build_s=round(build_s, 2),
                      scene_rebuild_s=round(time.time() - t0, 2),
                      instances=meta.num_instances)
        if args.lights > 16:
            # Extra warm point lights in the demo ring (tests the tiled
            # light culling at the reference's 512 capacity).
            rng = np.random.RandomState(3)
            from zeldaengine_tpu.scene.world import LightDesc as LD

            while len(world.point_lights) < args.lights:
                a = rng.uniform(0, 2 * np.pi)
                d = rng.uniform(0.5, 8.0)
                world.point_lights.append(LD(
                    position=np.array([np.sin(a) * d, np.cos(a) * d, 1.0],
                                      np.float32),
                    type=1,
                    color=np.array([rng.uniform(0.4, 0.8),
                                    rng.uniform(0.2, 0.5), 0.1], np.float32),
                    intensity=8.0, radius=1.5,
                ))
            detail.update(point_lights=args.lights)
        metric, unit, target = "1080p deferred-PBR frames/sec", "fps", 60.0

    n_tris = meta.num_triangles

    @jax.jit
    def step(scene, view):
        color, _ = render_rows(scene, view, meta, config)
        return color

    def make_view(i):
        # Adaptive capacities (config.adaptive_light_capacity): the
        # unrolled loop pays full BxDF per CAPACITY slot, and the
        # reference loops only lightsCount — fixed (8, 16, 8) padding
        # billed ~5 ms/frame of dead light math to the demo scene.
        return build_view_state(
            world, config, time=i / 60.0, roll_light=i * 0.02,
        )

    # The headline (config 3) reports steady-state by default: this
    # harness reaches the chip through a tunnel that costs 25-55 ms per
    # dispatch — a property of the remote link, not of the engine. Both
    # numbers are recorded.
    if args.steady or args.config in ("3", "3t"):
        disp_s, _ = _bench_loop(step, scene, make_view, args.frames)
        frame_s, compile_s = _steady_loop(
            lambda s, v: render_rows(s, v, meta, config)[0],
            scene, make_view, args.frames,
        )
        detail["timing"] = "steady-state scan"
        detail["per_dispatch_ms"] = round(disp_s * 1000, 2)
    else:
        frame_s, compile_s = _bench_loop(step, scene, make_view,
                                         args.frames)
    fps = 1.0 / frame_s
    mtris = n_tris * fps / 1e6

    if args.profile:
        from zeldaengine_tpu.profiling import profile_passes

        passes = profile_passes(scene, make_view(0), meta, config,
                                include_full=False)
        detail["pass_ms"] = {k: round(v, 1) for k, v in passes.items()}

    if args.out:
        from zeldaengine_tpu.utils import write_png

        img = np.asarray(step(scene, make_view(0)))
        write_png(args.out, img)

    if args.config == "4":
        value = meta.num_meshlets * fps
        vs_baseline = fps / 60.0
    else:
        value = fps
        vs_baseline = fps / (target or 60.0)

    detail.update(
        triangles=int(n_tris),
        mtris_per_sec=round(mtris, 2),
        frame_ms=round(frame_s * 1000, 2),
        fps=round(fps, 3),
        resolution=f"{config.width}x{config.height}",
        compile_s=round(compile_s, 1),
        config=args.config,
    )

    if args.config == "3" and not args.no_golden:
        # Hardware golden gate (VERDICT r2 #9): every headline bench run
        # re-validates the TPU kernels against the CPU goldens — the one
        # check that catches TPU-only numeric regressions (it caught the
        # denormal-flushed material ids in round 2).
        import os
        import subprocess

        r = subprocess.run(
            ["python", os.path.join(os.path.dirname(__file__) or ".",
                                    "tools", "tpu_golden_check.py")],
            capture_output=True, text=True, timeout=3600,
        )
        detail["golden_check"] = "ok" if r.returncode == 0 else "FAIL"
        if r.returncode != 0:
            detail["golden_check_tail"] = r.stdout[-300:] + r.stderr[-300:]
    if args.verbose:
        print(f"# {detail}", flush=True)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()

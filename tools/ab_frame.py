"""A/B harness: steady-state full-frame timing across config variants.

Builds the reference-scale demo scene once, then measures render_rows
under each named EngineConfig variant with the in-jit scan-differencing
protocol (the only trustworthy timing on the tunneled backend — see
BASELINE.md). Usage:

    python tools/ab_frame.py --variants base,pcf_window1 --frames 6
    python tools/ab_frame.py --list

Variants are defined in VARIANTS below; add entries as experiments are
designed. Each line of output is one variant's steady-state ms/frame.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = {
    "base": {},
    "pcf_window1": {"pcf_backend": "window1"},
    "pcf_exact": {"pcf_backend": "exact"},
    "pcf_packed4": {"pcf_backend": "packed4"},
    "expand16": {"pair_expand": 16},
    "tile16": {"tile_h": 16},
    "tile64": {"tile_h": 64},
    "subrows4": {"sub_rows": 4},
    "subrows16": {"sub_rows": 16},
    "fused": {"raster": "fused"},
    "fused_pcf1": {"raster": "fused", "pcf_backend": "window1"},
    "fused_pcf4": {"raster": "fused", "pcf_backend": "packed4"},
    "fused_caps": {"raster": "fused", "_adaptive_caps": True},
    "fused_tiled": {"raster": "fused", "tiled_lights_min": 9},
    "fused_all": {"raster": "fused", "pcf_backend": "packed4",
                  "_adaptive_caps": True, "tiled_lights_min": 9},
    "fused_env": {"raster": "fused", "env_merge": True},
    "fused_pcf_exact": {"raster": "fused", "pcf_backend": "exact"},
    "fused_pcf4b": {"raster": "fused", "pcf_backend": "packed4"},
    "fused_pcf8": {"raster": "fused", "pcf_backend": "packed8"},
    "fused_pcf16": {"raster": "fused", "pcf_backend": "packed16"},
    "fused_noshadow": {"raster": "fused", "enable_shadow": False},
    "fused_pcfpacked": {"raster": "fused", "pcf_backend": "packed"},
    "fused_winroll": {"raster": "fused", "pcf_backend": "window_roll"},
    "ab_nopcf": {"raster": "fused", "ablate": "nopcf"},
    "ab_nolight": {"raster": "fused", "ablate": "nolight"},
    "ab_notex": {"raster": "fused", "ablate": "notex"},
    "ab_noswitch": {"raster": "fused", "ablate": "noswitch"},
    "ab_nosky": {"raster": "fused", "ablate": "nosky"},
    "ab_pcfbuild": {"raster": "fused", "ablate": "pcfbuild"},
    "ab_bare": {"raster": "fused",
                "ablate": "nopcf,nolight,notex,noswitch,nosky",
                "enable_shadow": False},
    "ab_noattrs": {"raster": "fused",
                   "ablate": "noattrs,nopcf,nolight,notex,noswitch,nosky",
                   "enable_shadow": False},
    "fused_env_caps": {"raster": "fused", "env_merge": True,
                       "_adaptive_caps": True},
    "fused_env_caps_tiled": {"raster": "fused", "env_merge": True,
                             "_adaptive_caps": True,
                             "tiled_lights_min": 9},
    # Round-3b: half-res PCF (4x fewer gather indices) + pair caps.
    "fused_pcfhalf": {"raster": "fused", "pcf_backend": "half"},
    "fused_pcfhalfn": {"raster": "fused", "pcf_backend": "half_nearest"},
    "fused_cap384": {"raster": "fused", "max_pairs": 384 * 1024,
                     "max_pairs_shadow": 256 * 1024},
    "fused_cap256": {"raster": "fused", "max_pairs": 256 * 1024,
                     "max_pairs_shadow": 192 * 1024},
    "fused_half_cap": {"raster": "fused", "pcf_backend": "half",
                       "max_pairs": 384 * 1024,
                       "max_pairs_shadow": 256 * 1024},
    # Demo-scene live pairs measured 174k vis / 126k shadow (25% / 36%
    # of capacity): 192k/144k leaves ~10% headroom.
    "fused_cap192": {"raster": "fused", "max_pairs": 192 * 1024,
                     "max_pairs_shadow": 144 * 1024},
    "fused_halfwr": {"raster": "fused", "pcf_backend": "half_wr"},
    # Round-3c: tile granularity. Phase-1 raster work scales as
    # pairs x tile_px; tiny demo triangles still emit ~1 pair at 8-row
    # tiles, so shrinking tile_h cuts the pixelxtriangle product ~4x.
    # Supertile pixel footprint stays constant (see _super_h).
    "fused_tile8": {"raster": "fused", "tile_h": 8},
    "fused_tile16": {"raster": "fused", "tile_h": 16},
    "fused_tile8_e16": {"raster": "fused", "tile_h": 8, "pair_expand": 16},
    # Round-3d: y-packed PCF row table (3 gathers at 264k rows).
    "fused_pcfy4": {"raster": "fused", "pcf_backend": "packed_y4"},
    "fused_sr16": {"raster": "fused", "sub_rows": 16},
    "fused_sr32": {"raster": "fused", "sub_rows": 32},
    "fused_pcfy8": {"raster": "fused", "pcf_backend": "packed_y8"},
    "fused_half_y4": {"raster": "fused", "pcf_backend": "half_y4"},
    "fused_y4_cap": {"raster": "fused", "pcf_backend": "packed_y4",
                     "max_pairs": 384 * 1024,
                     "max_pairs_shadow": 256 * 1024},
    "fused_tile8_half_cap": {"raster": "fused", "tile_h": 8,
                             "pcf_backend": "half",
                             "max_pairs": 512 * 1024,
                             "max_pairs_shadow": 320 * 1024},
    # Round-3e (accwide era): batched-index PCF gather, combined bests.
    "fused_pcfb": {"raster": "fused", "pcf_backend": "packed_b"},
    "best_half_caps": {"raster": "fused", "pcf_backend": "half",
                       "_adaptive_caps": True,
                       "max_pairs": 384 * 1024,
                       "max_pairs_shadow": 256 * 1024},
    # Round-3f: VMEM-resident Pallas PCF (exact; ~4.5 ms standalone).
    "fused_pcfvmem": {"raster": "fused", "pcf_backend": "vmem"},
    "fused_vmem_cap": {"raster": "fused", "pcf_backend": "vmem",
                       "max_pairs": 384 * 1024,
                       "max_pairs_shadow": 256 * 1024},
    # Post-vmem combination re-checks (marginals change as the frame
    # shrinks: caps/env/tiled were neutral at 157 ms).
    "vm_caps": {"raster": "fused", "pcf_backend": "vmem",
                "_adaptive_caps": True},
    "vm_env": {"raster": "fused", "pcf_backend": "vmem",
               "env_merge": True},
    "vm_tiled": {"raster": "fused", "pcf_backend": "vmem",
                 "tiled_lights_min": 9},
    "vm_all": {"raster": "fused", "pcf_backend": "vmem",
               "_adaptive_caps": True, "env_merge": True,
               "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024},
    # Raster tile-SHAPE sweep under vm_all: demo grass is vertical
    # slivers, so narrow/tall tiles cut the dense pixels-x-pairs product
    # (each pair evaluates the whole tile).
    "vm_tw64": {"raster": "fused", "pcf_backend": "vmem",
                "_adaptive_caps": True, "env_merge": True,
                "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                "tile_w": 64},
    "vm_tw32": {"raster": "fused", "pcf_backend": "vmem",
                "_adaptive_caps": True, "env_merge": True,
                "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                "tile_w": 32},
    "vm_t64x32": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True, "env_merge": True,
                  "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                  "tile_h": 64, "tile_w": 32},
    "vm_t16x64": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True, "env_merge": True,
                  "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                  "tile_h": 16, "tile_w": 64},
    "vm_t64x64": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True, "env_merge": True,
                  "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                  "tile_h": 64, "tile_w": 64},
    "vm_t128x32": {"raster": "fused", "pcf_backend": "vmem",
                   "_adaptive_caps": True, "env_merge": True,
                   "max_pairs": 384 * 1024,
                   "max_pairs_shadow": 256 * 1024,
                   "tile_h": 128, "tile_w": 32},
    "vm_t64x32_sr16": {"raster": "fused", "pcf_backend": "vmem",
                       "_adaptive_caps": True, "env_merge": True,
                       "max_pairs": 384 * 1024,
                       "max_pairs_shadow": 256 * 1024,
                       "tile_h": 64, "tile_w": 32, "sub_rows": 16},
    # Ablation batch on the round-3g best bundle (bench config 3).
    **{
        f"t64_{k}": {
            "raster": "fused", "pcf_backend": "vmem",
            "_adaptive_caps": True, "env_merge": True,
            "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
            "tile_h": 64, "tile_w": 32, **v,
        }
        for k, v in {
            "notex": {"ablate": "notex"},
            "nolight": {"ablate": "nolight"},
            "norefl": {"ablate": "norefl"},
            "nodirect": {"ablate": "nodirect"},
            "reflgather": {"ablate": "reflgather"},
            "nopcf": {"ablate": "nopcf"},
            "nosky": {"ablate": "nosky"},
            "noswitch": {"ablate": "noswitch"},
            "noattrs": {"ablate": "noattrs"},
            "noshadow": {"enable_shadow": False},
            "bare": {"ablate": "nopcf,nolight,notex,noswitch,nosky",
                     "enable_shadow": False},
        }.items()
    },
    # Ablation batch on the CURRENT bench bundle (t64 + pair1 low-tier
    # reflection, no env_merge — bench.py config 3 defaults).
    **{
        f"p1_{k}": {
            "raster": "fused", "pcf_backend": "vmem",
            "_adaptive_caps": True,
            "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
            "tile_h": 64, "tile_w": 32, **v,
        }
        for k, v in {
            "notex": {"ablate": "notex"},
            "nolight": {"ablate": "nolight"},
            "norefl": {"ablate": "norefl"},
            "nodirect": {"ablate": "nodirect"},
            "nopcf": {"ablate": "nopcf"},
            "nosky": {"ablate": "nosky"},
            "noswitch": {"ablate": "noswitch"},
            "noattrs": {"ablate": "noattrs"},
            "noshadow": {"enable_shadow": False},
            "bare": {"ablate": "nopcf,nolight,notex,noswitch,nosky",
                     "enable_shadow": False},
        }.items()
    },
    # env_merge off under the t64 bundle: reflection via the quad cube
    # (2 x 64ch gathers) + sky/bg via the windowed VMEM taps.
    "t64_noenv": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True,
                  "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                  "tile_h": 64, "tile_w": 32},
    "t64_pair1": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True,
                  "max_pairs": 384 * 1024,
                  "max_pairs_shadow": 256 * 1024,
                  "tile_h": 64, "tile_w": 32},
    # Round-4 A/B: slice-aligned pair bins off (build_pairs align).
    "t64_noalign": {"raster": "fused", "pcf_backend": "vmem",
                    "_adaptive_caps": True,
                    "max_pairs": 384 * 1024,
                    "max_pairs_shadow": 256 * 1024,
                    "tile_h": 64, "tile_w": 32,
                    "pair_align": False},
    "t64_pcfnofix": {"raster": "fused", "pcf_backend": "vmem",
                     "_adaptive_caps": True,
                     "max_pairs": 384 * 1024,
                     "max_pairs_shadow": 256 * 1024,
                     "tile_h": 64, "tile_w": 32,
                     "pcf_fallback_cap": 0},
    # Shadow-pass tile-shape override + pair_expand sweep under t64.
    "t64_sh32x128": {"raster": "fused", "pcf_backend": "vmem",
                     "_adaptive_caps": True, "env_merge": True,
                     "max_pairs": 384 * 1024,
                     "max_pairs_shadow": 256 * 1024,
                     "tile_h": 64, "tile_w": 32,
                     "shadow_tile_h": 32, "shadow_tile_w": 128},
    "t64_sh64x128": {"raster": "fused", "pcf_backend": "vmem",
                     "_adaptive_caps": True, "env_merge": True,
                     "max_pairs": 384 * 1024,
                     "max_pairs_shadow": 256 * 1024,
                     "tile_h": 64, "tile_w": 32,
                     "shadow_tile_h": 64, "shadow_tile_w": 128},
    "t64_exp4": {"raster": "fused", "pcf_backend": "vmem",
                 "_adaptive_caps": True, "env_merge": True,
                 "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                 "tile_h": 64, "tile_w": 32, "pair_expand": 4},
    "t64_exp12": {"raster": "fused", "pcf_backend": "vmem",
                  "_adaptive_caps": True, "env_merge": True,
                  "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
                  "tile_h": 64, "tile_w": 32, "pair_expand": 12},
    # Post-vmem attribution: split the lighting ablation into its
    # direct-loop and IBL-reflection (cubemap gather) halves.
    # Shadow-pass shape/expand sweep under the CURRENT bench bundle.
    **{
        f"p1sh_{k}": {
            "raster": "fused", "pcf_backend": "vmem",
            "_adaptive_caps": True,
            "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
            "tile_h": 64, "tile_w": 32, **v,
        }
        for k, v in {
            "32x128": {"shadow_tile_h": 32, "shadow_tile_w": 128},
            "64x128": {"shadow_tile_h": 64, "shadow_tile_w": 128},
            "64x32": {"shadow_tile_h": 64, "shadow_tile_w": 32},
            "exp2": {"pair_expand_shadow": 2},
            "cap192": {"max_pairs_shadow": 192 * 1024},
        }.items()
    },
    # Config-4 (1M-tri meshlet scene) tuning: live-triangle compaction
    # sized to the post-cull count (cone cull kills ~half the sphere
    # meshlets), live-pair caps, tile shapes. Run with --scene c4.
    "c4_base": {},
    # Round-5 c4 resolve attribution (the right-sized-caps config is the
    # _scenes.py default; these ablate the non-raster passes).
    **{
        f"c4_{k}": v
        for k, v in {
            "nopcf": {"ablate": "nopcf"},
            "nolight": {"ablate": "nolight"},
            "notex": {"ablate": "notex"},
            "nosky": {"ablate": "nosky"},
            "noswitch": {"ablate": "noswitch"},
            "noattrs": {"ablate": "noattrs,nopcf,nolight,notex,noswitch"},
            "noshadow": {"enable_shadow": False},
            "pcffix0": {"pcf_fallback_cap": 0},
            "pcfpacked": {"pcf_backend": "packed"},
            "pcfhalf": {"pcf_backend": "half"},
            "win24": {"pcf_vmem_rows": 24},
            "win16": {"pcf_vmem_rows": 16},
            "pcfy4": {"pcf_backend": "packed_y4"},
            "pcfy8": {"pcf_backend": "packed_y8"},
            "pcfcoords": {"ablate": "pcfcoords"},
            "bare": {"ablate": "nopcf,nolight,notex,noswitch,nosky",
                     "enable_shadow": False},
            "pcfy4fix0": {"pcf_backend": "packed_y4",
                          "pcf_fallback_cap": 0},
        }.items()
    },
    # Shadow caps trimmed to ~1.5x the measured 55k live shadow pairs
    # (c4_live_counts); exactness gated by tools/c4_image_ab.
    "c4_shtrim": {"compact_tris_shadow": 96 * 1024,
                  "max_pairs_shadow": 64 * 1024},
    "c4_cap": {"max_pairs": 512 * 1024, "max_pairs_shadow": 256 * 1024},
    "c4_compact": {"compact_tris": 512 * 1024,
                   "max_pairs": 512 * 1024,
                   "max_pairs_shadow": 256 * 1024},
    "c4_compact_t64": {"compact_tris": 512 * 1024,
                       "max_pairs": 512 * 1024,
                       "max_pairs_shadow": 256 * 1024,
                       "tile_h": 64, "tile_w": 32},
    "c4_compact_e8": {"compact_tris": 512 * 1024,
                      "max_pairs": 512 * 1024,
                      "max_pairs_shadow": 256 * 1024,
                      "pair_expand": 8},
    "c4_compact_sh": {"compact_tris": 512 * 1024,
                      "max_pairs": 512 * 1024,
                      "max_pairs_shadow": 192 * 1024,
                      "shadow_tile_h": 32, "shadow_tile_w": 128},
    # Round-5: Pallas tile-restricted point lights (default-on bundle =
    # t64_pair1; these isolate the kernel + its block-height sweep).
    **{
        f"p1_{k}": {
            "raster": "fused", "pcf_backend": "vmem",
            "_adaptive_caps": True,
            "max_pairs": 384 * 1024, "max_pairs_shadow": 256 * 1024,
            "tile_h": 64, "tile_w": 32, **v,
        }
        for k, v in {
            "punroll": {"point_light_kernel": "unroll"},
            "pb8": {"point_block_h": 8},
            "pb40": {"point_block_h": 40},
            "pb120": {"point_block_h": 120},
            "pcffix0": {"pcf_fallback_cap": 0},
            "pcfcoords": {"ablate": "pcfcoords"},
            "bare": {"ablate": "nopcf,nolight,notex,noswitch,nosky",
                     "enable_shadow": False},
        }.items()
    },
    "vm_norefl": {"raster": "fused", "pcf_backend": "vmem",
                  "ablate": "norefl"},
    "vm_nodirect": {"raster": "fused", "pcf_backend": "vmem",
                    "ablate": "nodirect"},
    "vm_notex": {"raster": "fused", "pcf_backend": "vmem",
                 "ablate": "notex"},
    "vm_nosky": {"raster": "fused", "pcf_backend": "vmem",
                 "ablate": "nosky"},
    "vm_nolight": {"raster": "fused", "pcf_backend": "vmem",
                   "ablate": "nolight"},
    "vm_nopcf": {"raster": "fused", "pcf_backend": "vmem",
                 "ablate": "nopcf"},
    "vm_noshadow": {"raster": "fused", "pcf_backend": "vmem",
                    "enable_shadow": False},
}


def steady_ms(render, scene, make_view, frames=6, reps=4):
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
        float(f(scene, vstack))
        compile_s[0] += time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(scene, vstack))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t1, t2 = run(1), run(max(frames, 2))
    return (t2 - t1) / (max(frames, 2) - 1) * 1000.0, compile_s[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str, default="base")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--grass", type=int, default=10000)
    ap.add_argument("--rocks", type=int, default=65)
    ap.add_argument("--lights", type=int, default=16)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--scene", type=str, default="demo",
                    choices=("demo", "c4"))
    ap.add_argument("--caps", type=str, default="8,16,8")
    args = ap.parse_args()

    if args.list:
        for k, v in VARIANTS.items():
            print(k, v)
        return

    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state
    from zeldaengine_tpu.scene.demo import build_demo_scene

    if args.scene == "c4":
        from _scenes import build_c4_scene, c4_config

        base = c4_config(EngineConfig)
        scene, meta, world = build_c4_scene(base)
    else:
        base = EngineConfig(width=1920, height=1080)
        t0 = time.time()
        scene, meta, world = build_demo_scene(base, grass=args.grass,
                                              rocks=args.rocks)
        print(f"# scene build {time.time()-t0:.1f}s "
              f"tris={meta.num_triangles}", flush=True)
    base_caps = tuple(int(x) for x in args.caps.split(","))

    def make_view(i, caps=base_caps):
        return build_view_state(world, base, time=i / 60.0,
                                roll_light=i * 0.02,
                                light_capacities=caps)

    for name in args.variants.split(","):
        over = dict(VARIANTS[name])
        adaptive = over.pop("_adaptive_caps", False)
        cfg = base.replace(**over) if over else base
        caps = None if adaptive else base_caps
        try:
            ms, comp = steady_ms(
                lambda s, v, cfg=cfg: render_rows(s, v, meta, cfg)[0],
                scene, lambda i: make_view(i, caps), frames=args.frames,
            )
            print(json.dumps({"variant": name, "ms": round(ms, 1),
                              "compile_s": round(comp, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()

"""Image-exactness A/B at config-4 scale: render ONE frame under two
config variants (names from tools/ab_frame.VARIANTS) and report the
pixel diff. Used to qualify perf levers that are only conditionally
exact (e.g. pcf_fallback_cap=0 is exact iff no block overflows the
VMEM window at this scene's shadow scale).

Usage: python tools/c4_image_ab.py --a c4_base --b c4_pcffix0
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=str, default="c4_base")
    ap.add_argument("--b", type=str, required=True)
    ap.add_argument("--rolls", type=str, default="0",
                    help="comma list of light-roll angles to check "
                         "(capacity levers must hold on the bench's "
                         "WORST rolled-light frame, not just t=0)")
    args = ap.parse_args()

    import jax

    from _scenes import build_c4_scene, c4_config
    from ab_frame import VARIANTS
    from zeldaengine_tpu.config import EngineConfig
    from zeldaengine_tpu.passes.frame import render_rows
    from zeldaengine_tpu.passes.view import build_view_state

    base = c4_config(EngineConfig)
    scene, meta, world = build_c4_scene(base)
    rolls = [float(x) for x in args.rolls.split(",")]

    fns = {}
    for name in (args.a, args.b):
        over = dict(VARIANTS[name])
        over.pop("_adaptive_caps", None)
        cfg = base.replace(**over) if over else base
        fns[name] = jax.jit(
            lambda s, v, cfg=cfg: render_rows(s, v, meta, cfg)[0])

    for roll in rolls:
        view = build_view_state(world, base, time=0.0, roll_light=roll,
                                light_capacities=(8, 16, 8))
        a = np.asarray(fns[args.a](scene, view))
        b = np.asarray(fns[args.b](scene, view))
        diff = np.abs(a - b)
        print(json.dumps({
            "a": args.a, "b": args.b, "roll": roll,
            "max": float(diff.max()),
            "mean": float(diff.mean()),
            "frac_gt_1tap": float((diff > 0.045).mean()),
            "frac_gt_ulp": float((diff > 1e-5).mean()),
            "identical": bool((a == b).all()),
        }), flush=True)


if __name__ == "__main__":
    main()

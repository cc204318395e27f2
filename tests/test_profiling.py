"""Per-pass profiler smoke test (runs on CPU with the test config)."""

import numpy as np

from zeldaengine_tpu.config import TEST_CONFIG
from zeldaengine_tpu.passes.view import build_view_state
from zeldaengine_tpu.profiling import profile_passes
from zeldaengine_tpu.scene.demo import build_demo_scene


def test_profile_passes_reports_all_stages():
    config = TEST_CONFIG
    scene, meta, world = build_demo_scene(config, grass=8, rocks=4)
    view = build_view_state(world, config, light_capacities=(2, 8, 2))
    out = profile_passes(scene, view, meta, config, reps=1)
    for key in ("vertex", "shadow", "raster", "attrs", "pcf", "lighting",
                "full", "sum_of_parts"):
        assert key in out, out.keys()
        assert np.isfinite(out[key]) and out[key] >= 0.0

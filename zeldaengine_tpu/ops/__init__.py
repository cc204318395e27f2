from zeldaengine_tpu.ops.rasterize import (
    triangle_setup,
    rasterize_visibility,
    rasterize_depth,
)
from zeldaengine_tpu.ops.rasterize_pallas import (
    build_pairs,
    rasterize_pairs,
)
from zeldaengine_tpu.ops.culling import meshlet_cull, expand_meshlet_mask
from zeldaengine_tpu.ops.shadow import (
    compute_shadow_coord,
    compute_pcf,
    compute_pcf_packed,
)
from zeldaengine_tpu.ops.pcf_pallas import compute_pcf_pallas

__all__ = [
    "triangle_setup",
    "rasterize_visibility",
    "rasterize_depth",
    "build_pairs",
    "rasterize_pairs",
    "meshlet_cull",
    "expand_meshlet_mask",
    "compute_shadow_coord",
    "compute_pcf",
    "compute_pcf_packed",
    "compute_pcf_pallas",
]

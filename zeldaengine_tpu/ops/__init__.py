from zeldaengine_tpu.ops.rasterize import (
    triangle_setup,
    rasterize_visibility,
    rasterize_depth,
)

__all__ = [
    "triangle_setup",
    "rasterize_visibility",
    "rasterize_depth",
]

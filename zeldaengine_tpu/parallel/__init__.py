from zeldaengine_tpu.parallel.tiles import (
    make_tile_mesh,
    render_frame_sharded,
)

__all__ = ["make_tile_mesh", "render_frame_sharded"]

"""Multi-chip rendering: screen-row sharding over a device mesh.

The TPU-native analogue of multi-GPU split-frame rendering. Design
(SURVEY.md §2.4): the screen is the data-parallel axis. Scene pools are
replicated (they are read-only and small relative to HBM); each device
rasterizes + shades its own horizontal band of the frame, so the
O(pixels x triangles) rasterization and the O(pixels x lights) resolve —
the two dominant costs — scale linearly with devices. The shadow map is
also computed band-sharded, then all-gathered over ICI (every band needs
arbitrary shadow-map taps).

Collectives used: one ``all_gather`` (shadow map rows) inside the step;
output image is left sharded across devices ('rows' axis) — gathering it
to the host is presentation, not rendering.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from zeldaengine_tpu.config import EngineConfig
from zeldaengine_tpu.passes.frame import render_rows
from zeldaengine_tpu.scene.scenebuild import GpuScene, SceneMeta

AXIS = "rows"


def make_tile_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def render_frame_sharded(
    scene: GpuScene,
    view,
    meta: SceneMeta,
    config: EngineConfig,
    mesh: Mesh,
):
    """Render one frame with pixel rows sharded over ``mesh``.

    Returns the (H, W, 3) image with rows distributed across devices
    (PartitionSpec('rows', None, None)).
    """
    n = mesh.shape[AXIS]
    assert config.height % n == 0, (
        f"height {config.height} must divide the {n}-device mesh"
    )
    assert config.shadowmap_dim % n == 0
    rows = config.height // n
    s_rows = config.shadowmap_dim // n

    def step(scene, view):
        idx = jax.lax.axis_index(AXIS)
        y0 = (idx * rows).astype(jnp.int32)
        sy0 = (idx * s_rows).astype(jnp.int32)

        def gather_shadow(band):
            # (s_rows, D) band -> full (D, D) shadow map on every device
            full = jax.lax.all_gather(band, AXIS, axis=0, tiled=True)
            return full

        color, _aux = render_rows(
            scene,
            view,
            meta,
            config,
            y0=y0,
            rows=rows,
            shadow_rows=(sy0, s_rows, gather_shadow),
            full_frame=False,
        )
        return color

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(AXIS, None, None),
        check_rep=False,
    )
    return fn(scene, view)


def jit_sharded_renderer(meta: SceneMeta, config: EngineConfig, mesh: Mesh):
    """A jitted closure over the static scene meta/config/mesh."""

    @jax.jit
    def step(scene, view):
        return render_frame_sharded(scene, view, meta, config, mesh)

    return step

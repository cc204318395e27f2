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


def band_compact_config(config: EngineConfig, meta: SceneMeta, n: int,
                        slack: float = 2.0) -> EngineConfig:
    """Size live-triangle compaction to a band share (VERDICT r3 #7).

    Each device's pair-binning prep (the T*expand key sort + record
    gather) runs after a band-intersection validity mask
    (frame._band_mask_setup), so compacting to ``slack * T / n`` slots
    makes prep cost track the band's triangle count (~1/N) instead of
    replicating the full scene on every device. ``slack`` absorbs
    non-uniform screen distributions; overflow (a band holding more than
    cap triangles) drops the highest triangle ids deterministically and
    is surfaced by validation mode — raise slack (or set
    ``config.compact_tris`` yourself) for strongly skewed scenes.
    """
    if config.compact_tris is not None:
        return config
    t = max(int(meta.num_triangles), 1)
    cap = max(1024, -(-int(slack * t / max(n, 1)) // 128) * 128)
    if cap >= t:
        return config  # no saving at this scale
    return config.replace(compact_tris=cap)


def stripe_layout(config: EngineConfig, n: int):
    """Striped row assignment: device d owns tile rows d, d+n, d+2n, ...
    (granularity = config.tile_h pixel rows). Returns (S strips per
    device, strip height px, padded tile rows). Static contiguous bands
    concentrate work on whichever device owns mid-screen (the round-4
    dryrun measured one device holding 73% of band-live triangles);
    striping interleaves content across devices at tile granularity."""
    th = config.tile_h
    n_trows = -(-config.height // th)
    s = -(-n_trows // n)
    return s, th, s * n


def unstripe_perm(config: EngineConfig, n: int) -> jnp.ndarray:
    """Row permutation mapping the strip-major sharded output back to
    screen order: screen tile row t was rendered by device t % n as its
    strip t // n."""
    import numpy as np

    s, th, _ = stripe_layout(config, n)
    t = np.arange(n * s)
    src_row = ((t % n) * s + t // n)[:, None] * th + np.arange(th)[None]
    return jnp.asarray(src_row.reshape(-1)[: n * s * th], jnp.int32)


def render_frame_sharded(
    scene: GpuScene,
    view,
    meta: SceneMeta,
    config: EngineConfig,
    mesh: Mesh,
    band_compact_slack: float | None = None,
    stripe: bool = True,
):
    """Render one frame with pixel rows sharded over ``mesh``.

    Returns the (H, W, 3) image in screen order with rows distributed
    across devices. ``band_compact_slack`` opts into band-sized prep
    compaction (see band_compact_config).

    ``stripe`` (default): device d renders tile rows d, d+n, d+2n, ...
    as S strips (stripe_layout) — raster/prep work balances across
    devices for any content distribution, the shadow map is built once
    per device (contiguous shadow bands + all_gather, reused by every
    strip via shadowmap_override), and the strip-major output is
    permuted back to screen order (one cross-device row exchange, the
    presentation-side collective). ``stripe=False`` keeps the round-4
    contiguous bands.
    """
    n = mesh.shape[AXIS]
    assert config.shadowmap_dim % n == 0
    if band_compact_slack is not None:
        config = band_compact_config(config, meta, n,
                                     slack=band_compact_slack)
    s_rows = config.shadowmap_dim // n

    if not stripe:
        assert config.height % n == 0, (
            f"height {config.height} must divide the {n}-device mesh"
        )
        rows = config.height // n

        def step(scene, view):
            idx = jax.lax.axis_index(AXIS)
            y0 = (idx * rows).astype(jnp.int32)
            sy0 = (idx * s_rows).astype(jnp.int32)

            def gather_shadow(band):
                # (s_rows, D) band -> full (D, D) map on every device
                return jax.lax.all_gather(band, AXIS, axis=0, tiled=True)

            color, _aux = render_rows(
                scene, view, meta, config,
                y0=y0, rows=rows,
                shadow_rows=(sy0, s_rows, gather_shadow),
                full_frame=False,
            )
            return color

        fn = shard_map(step, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(AXIS, None, None), check_rep=False)
        return fn(scene, view)

    n_strips, th, _ = stripe_layout(config, n)

    def step(scene, view):
        idx = jax.lax.axis_index(AXIS)
        sy0 = (idx * s_rows).astype(jnp.int32)

        def gather_shadow(band):
            return jax.lax.all_gather(band, AXIS, axis=0, tiled=True)

        strips = []
        shadowmap = None
        for s in range(n_strips):
            y0 = ((idx + s * n) * th).astype(jnp.int32)
            color, aux = render_rows(
                scene, view, meta, config,
                y0=y0, rows=th,
                shadow_rows=(None if shadowmap is not None
                             else (sy0, s_rows, gather_shadow)),
                shadowmap_override=shadowmap,
                full_frame=False,
            )
            shadowmap = aux["shadowmap"]
            strips.append(color)
        return jnp.concatenate(strips, axis=0)  # (S*th, W, 3) strip-major

    fn = shard_map(step, mesh=mesh, in_specs=(P(), P()),
                   out_specs=P(AXIS, None, None), check_rep=False)
    out = fn(scene, view)  # (n*S*th, W, 3) device-major strips
    perm = unstripe_perm(config, n)
    return jnp.take(out, perm, axis=0)[: config.height]


def jit_sharded_renderer(meta: SceneMeta, config: EngineConfig, mesh: Mesh,
                         band_compact_slack: float | None = None):
    """A jitted closure over the static scene meta/config/mesh."""

    @jax.jit
    def step(scene, view):
        return render_frame_sharded(scene, view, meta, config, mesh,
                                    band_compact_slack=band_compact_slack)

    return step


def band_pair_stats(scene, view, meta, config: EngineConfig, mesh: Mesh,
                    stripe: bool = True):
    """Per-device (band-live triangles, band pair count) for the deferred
    pass — the dryrun's proof that prep sharding tracks the band share
    (VERDICT r3 #7) and that STRIPED assignment balances it (round 5:
    contiguous bands put 73% of the demo's band-live triangles on one
    device). Mirrors render_rows' vertex/setup prep (frame.py) for the
    deferred pass only; with ``stripe`` the counts sum each device's
    strips (a triangle spanning k of the device's strips counts k times,
    exactly like its prep does)."""
    from zeldaengine_tpu.math.transforms import (
        apply_mat4_h, apply_mat4_point)
    from zeldaengine_tpu.ops import pbr
    from zeldaengine_tpu.ops.rasterize import triangle_setup
    from zeldaengine_tpu.passes.frame import _band_mask_setup

    n = mesh.shape[AXIS]
    if stripe:
        n_strips, th, _ = stripe_layout(config, n)

        def stats(scene, view):
            idx = jax.lax.axis_index(AXIS)
            world = apply_mat4_point(view.model, scene.pair_pos)
            clip = apply_mat4_h(view.view_proj, world)
            setup0 = triangle_setup(
                clip[scene.tri_vtx], config.width, config.height,
                two_sided=scene.tri_two_sided,
                valid_mask=scene.tri_valid & scene.tri_deferred,
            )
            tw = config.tile_w
            n_tx = -(-config.width // tw)
            acc = jnp.zeros((2,), jnp.float32)
            for s in range(n_strips):
                y0 = ((idx + s * n) * th).astype(jnp.int32)
                setup = _band_mask_setup(setup0, y0, th)
                live = (setup.valid
                        & (setup.bbox[:, 2] > setup.bbox[:, 0])
                        & (setup.bbox[:, 3] > setup.bbox[:, 1]))
                tx0 = jnp.clip(jnp.floor(setup.bbox[:, 0] / tw),
                               0, n_tx - 1)
                tx1 = jnp.clip(jnp.ceil(setup.bbox[:, 2] / tw) - 1.0,
                               0, n_tx - 1)
                ncov = jnp.where(live, tx1 - tx0 + 1, 0.0)
                acc = acc + jnp.stack(
                    [jnp.sum(live).astype(jnp.float32), jnp.sum(ncov)])
            return acc[None]

        fn = shard_map(stats, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(AXIS, None), check_rep=False)
        import numpy as np

        return np.asarray(jax.jit(fn)(scene, view)).astype(int)

    rows = config.height // n

    def stats(scene, view):
        idx = jax.lax.axis_index(AXIS)
        y0 = (idx * rows).astype(jnp.int32)
        world = apply_mat4_point(view.model, scene.pair_pos)
        clip = apply_mat4_h(view.view_proj, world)
        setup = triangle_setup(
            clip[scene.tri_vtx], config.width, config.height,
            two_sided=scene.tri_two_sided,
            valid_mask=scene.tri_valid & scene.tri_deferred,
        )
        setup = _band_mask_setup(setup, y0, rows)
        live = (setup.valid
                & (setup.bbox[:, 2] > setup.bbox[:, 0])
                & (setup.bbox[:, 3] > setup.bbox[:, 1]))
        # Covered-tile pair count within the band (build_pairs' ncov).
        th, tw = config.tile_h, config.tile_w
        n_tx = -(-config.width // tw)
        n_ty = -(-rows // th)
        y0t = (y0 // th).astype(jnp.float32)  # band origin in tile rows
        tx0 = jnp.clip(jnp.floor(setup.bbox[:, 0] / tw), 0, n_tx - 1)
        ty0 = jnp.clip(jnp.floor(setup.bbox[:, 1] / th) - y0t,
                       0, n_ty - 1)
        tx1 = jnp.clip(jnp.ceil(setup.bbox[:, 2] / tw) - 1.0, 0, n_tx - 1)
        ty1 = jnp.clip(jnp.ceil(setup.bbox[:, 3] / th) - 1.0 - y0t,
                       0, n_ty - 1)
        ncov = jnp.where(live, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0.0)
        # (1, 2) per device; shard_map's out_specs concatenates to (N, 2).
        return jnp.stack([jnp.sum(live).astype(jnp.float32),
                          jnp.sum(ncov)])[None]

    fn = shard_map(stats, mesh=mesh, in_specs=(P(), P()),
                   out_specs=P(AXIS, None), check_rep=False)
    import numpy as np

    return np.asarray(jax.jit(fn)(scene, view)).astype(int)

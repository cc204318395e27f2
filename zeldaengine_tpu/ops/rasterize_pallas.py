"""Pallas TPU exact-pair tiled rasterizer — the performance path.

Replaces the jnp chunked rasterizer (ops/rasterize.py) for the hot passes.
Same math (homogeneous edge functions from ``triangle_setup``), a
TPU-shaped schedule:

- **Exact-pair binning in XLA**: every triangle emits one (tile, triangle)
  pair per screen tile its bbox covers (up to ``expand``; bigger bboxes
  fall into one global bucket walked by all tiles). Pairs are sorted by
  tile and the 16-float rasterization records are gathered into pair
  order, so each tile owns a dense, exactly-sized range of record slices.
  (Chunk-granularity binning — walk a 128-triangle chunk if ANY of its
  triangles touches the tile — measured 9-16x slack at demo scale even
  with Morton-ordered triangles.)
- The kernel grid is just ``(n_tiles,)``: each tile walks its own slice
  range with a dynamic ``fori_loop``, double-buffering records HBM→VMEM
  with ``make_async_copy`` so DMA overlaps the edge math. The per-slice
  body is straight-line vector code: no lax.cond early-outs — scalar
  branches stall the VPU pipeline for longer than the work they skip
  (measured ~24 us/visit with bbox conds vs ~4 us straight-line).
- Inside a slice, pixels ride the sublane axis and triangles the lane
  axis: ``e = px_col * c_row + ...`` — pure broadcast FMAs, no
  transposes. The depth winner per pixel uses a single f32 min-reduction
  over a packed key (depth quantized to 2^16 levels in the high bits,
  lane index in the low bits — both exact integers < 2^24). int32
  reductions hit a slow VPU path; the all-f32 packing stays on the fast
  one and costs < 1.6e-5 depth quantization, below raster tolerance.

Depth is evaluated in barycentric form, ``d = sum_i e_i * zc_i`` — the
algebraically-equivalent folded screen-linear form (``px*zr0 + py*zr1 +
zr2``) catastrophically cancels near z ~ 1 (measured ~1e-3 error on
shadow maps, where projections pack depth near the far plane), while the
edge values e_i are O(1) and condition the sum well.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeldaengine_tpu.ops.rasterize import TriangleSetup

NO_HIT = 3.0e38  # plain float: jnp constants may not be captured by kernels

# DMA pipeline depth of the slice walks (slots double-buffering records
# HBM->VMEM). 4 hides HBM latency at demo scale; kept module-level so
# probes can sweep it.
N_SLOTS = 4

# Paired-walk step (see _make_walk) and phase-2 per-group fetch gating
# (_pair_fused_kernel): module-level so stage probes can sweep them.
# Round-5 hardware A/Bs (BASELINE.md): WALK_STEP 2 measured +0.8 ms on
# demo phase 1 (the walk is not DMA-issue bound the way round-3 data
# suggested) — default 1, mechanism kept. FETCH_GATE ~-1 ms on phase 2.
WALK_STEP = 1
FETCH_GATE = True
# Exact sub-pixel cull (_covers_pixel_center) — config-driven per call
# (EngineConfig.subpixel_cull): removing the no-coverage pairs measured
# +2.5 ms on the demo kernel (bin-structure perturbation) but shrinks
# the config-4 pair stream, whose record-gather needle count is the c4
# wall. This module default only seeds probes.
CENTER_CULL = False


def _walk_step(n_slices: int) -> int:
    """Paired-walk step (see _make_walk): WALK_STEP unless the stream
    is too short to copy that many slices."""
    return WALK_STEP if n_slices >= WALK_STEP else 1


class PairedTriangles(NamedTuple):
    """Exact (tile, triangle) pair stream for the pair rasterizer.

    ``records`` holds per-PAIR rasterization records gathered into sorted
    pair order (16 rows x 128 lanes per slice); tile t's pairs occupy the
    contiguous index range [starts[t], ends[t]). Triangles whose bbox
    covers more than ``expand`` tiles get SUPERTILE pairs (a supertile is
    ``super_h x SUPER_W`` tiles; range [sstarts[s], sends[s]) walked by
    each of the supertile's tiles); only triangles too big for the
    supertile budget land in the global bucket [gbounds[0], gbounds[1])
    walked by every tile."""

    records: jnp.ndarray  # (n_slices, 16, 128) float32
    pair_tri: jnp.ndarray  # (n_slices * 128,) int32 original triangle id
    starts: jnp.ndarray  # (n_tiles,) int32 first pair index of the tile
    ends: jnp.ndarray  # (n_tiles,) int32 one-past-last pair index
    sstarts: jnp.ndarray  # (n_super,) int32 supertile range start
    sends: jnp.ndarray  # (n_super,) int32 supertile range end
    gbounds: jnp.ndarray  # (2,) int32 global-bucket [start, end)
    # Number of LIVE pairs dropped by the ``max_pairs`` capacity (0 when
    # uncapped); surfaced by validation mode.
    overflow: jnp.ndarray | int = 0


# Supertile geometry (in tiles) and its pair budget: a triangle covering
# more than ``expand`` tiles emits up to SUPER_EXPAND supertile pairs
# (each walked by super_h*SUPER_W tiles) before falling into the global
# bucket walked by EVERY tile. At the demo scale the global bucket held
# 248 near-camera terrain triangles = 46% of all kernel visits (3 slices
# x 510 tiles); two-level binning cuts that to the handful of triangles
# spanning more than ~16 supertiles. The supertile PIXEL footprint stays
# constant (64 x 512 px) as tile_h shrinks — otherwise the global-bucket
# cost scales with n_tiles (4x at tile_h=8).
SUPER_W = 4
SUPER_EXPAND = 4


def _super_h(tile_h: int) -> int:
    """Supertile height in tiles: fixed 64-px footprint (2 at tile_h=32)."""
    return max(1, 64 // tile_h)


def _super_w(tile_w: int) -> int:
    """Supertile width in tiles: fixed 512-px footprint (4 at tile_w=128).

    Narrow raster tiles (tile_w < 128, walked as column sub-tiles of a
    128-wide Pallas block) scale the tile count up; keeping the supertile
    PIXEL footprint constant keeps the global bucket's fan-out constant."""
    return max(1, (SUPER_W * 128) // max(tile_w, 1))


def _covers_pixel_center(bbox):
    """EXACT sub-pixel cull: coverage samples pixel CENTERS (x + 0.5 —
    the kernels' px/py iotas), so a triangle whose bbox straddles no
    center in x or in y rasterizes zero pixels anywhere. At meshlet
    scale (config 4: ~1M tris at 1024^2, ~1 px^2 each) a large fraction
    of live triangles fail this test — culling them shrinks the pair
    stream, whose per-needle record gather is the c4 wall (BASELINE.md
    round 4). Conservative: only culls when the bbox PROVABLY contains
    no center (floor(x1 - 0.5) + 0.5 < x0 means no i + 0.5 in
    [x0, x1]); never culls a covering triangle."""
    has_cx = jnp.floor(bbox[:, 2] - 0.5) + 0.5 >= bbox[:, 0]
    has_cy = jnp.floor(bbox[:, 3] - 0.5) + 0.5 >= bbox[:, 1]
    return has_cx & has_cy


def compact_setup(
    setup: TriangleSetup,
    cap: int,
    extra: jnp.ndarray | None = None,
    center_cull: bool | None = None,
):
    """Compact live triangles into a ``cap``-sized prefix (VERDICT r2 #2).

    At meshlet scale (1M-tri capacity, most culled by the frustum/cone
    pass) the pair-binning prep sorts T*expand keys and gathers T-sized
    records regardless of the cull result — the prep cost tracks
    CAPACITY, defeating the cull. Compacting live (post-cull, on-screen)
    triangles first makes every downstream cost track the live count:
    one O(T) cumsum + one T-element scatter replaces sorting the dead
    majority.

    Returns (setup', extra', idx, overflow): ``idx`` (cap,) maps
    compacted rows to ORIGINAL triangle ids (== original T for dead
    padding rows), for remapping ``pair_tri``; ``overflow`` counts live
    triangles dropped by the cap (deterministically, highest ids first).
    """
    t = setup.edge.shape[0]
    live = (
        setup.valid
        & (setup.bbox[:, 2] > setup.bbox[:, 0])
        & (setup.bbox[:, 3] > setup.bbox[:, 1])
    )
    if center_cull if center_cull is not None else CENTER_CULL:
        live = live & _covers_pixel_center(setup.bbox)
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    n_live = jnp.where(live.shape[0] > 0, pos[-1] + 1, 0)
    tgt = jnp.where(live & (pos < cap), pos, cap)
    idx = (
        jnp.full((cap + 1,), t, jnp.int32)
        .at[tgt]
        .set(jnp.arange(t, dtype=jnp.int32), mode="drop")[:cap]
    )
    overflow = jnp.maximum(n_live - cap, 0)

    def g(a, dead_val=0.0):
        pad = jnp.full((1, *a.shape[1:]), dead_val, a.dtype)
        return jnp.concatenate([a, pad], axis=0)[idx]

    setup2 = TriangleSetup(
        edge=g(setup.edge),
        zc=g(setup.zc),
        valid=g(setup.valid, dead_val=False),
        bbox=g(setup.bbox),
        zmin=None if setup.zmin is None else g(setup.zmin),
    )
    extra2 = None if extra is None else g(extra)
    return setup2, extra2, idx, overflow


def remap_pair_tri(pairs: PairedTriangles, idx: jnp.ndarray,
                   orig_t: int) -> PairedTriangles:
    """Map compacted pair_tri back to original triangle ids (dead pairs
    -> orig_t, matching the uncompacted dead convention)."""
    idx_pad = jnp.concatenate(
        [idx, jnp.full((1,), orig_t, jnp.int32)], axis=0
    )
    return pairs._replace(pair_tri=idx_pad[pairs.pair_tri])


def build_pairs(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    expand: int = 8,
    y0_tiles=0,
    extra: jnp.ndarray | None = None,
    max_pairs: int | None = None,
    sort_z: bool = False,
    align: bool = False,
    ysort_sub_rows: int | None = None,
    gather_chunks: int = 1,
    gather_pack: int = 1,
    center_cull: bool | None = None,
) -> PairedTriangles:
    """Compact triangles into exact per-tile pair lists (TPU binning).

    Each triangle emits one pair per covered tile (up to ``expand``;
    bigger bboxes fall into one global bucket), pairs are sorted by tile,
    and the records are gathered into pair order — every tile then walks
    a dense, exactly-sized slice range.

    ``extra``: optional (T, E) float32 per-triangle payload columns
    appended to the 12 rasterization rows (record rows 12..12+E-1,
    rounded up to a multiple of 16 rows). The fused raster+interpolate
    kernel uses E=34: material-combo id + 3 corners x 11 interpolants.

    ``sort_z``: order each bin's pairs FRONT TO BACK by the triangle's
    conservative ``setup.zmin`` (quantized into the low sort-key bits)
    instead of by triangle id. Coverage and depths are unchanged; only
    exact-depth ties between DIFFERENT triangles can resolve to another
    winner (the kernel keeps the lowest PAIR id among minimum-depth
    candidates). The payoff is the fused kernel's phase 2: winners are
    the nearest surfaces, so the per-tile winner windows collapse to the
    first slice(s) of each range instead of spanning it (BASELINE.md
    round 4).

    ``align``: start every bin's pair range at a 128-slice boundary
    (pad positions hold the dead never-record). Unaligned, each bin's
    first/last slice is SHARED with its key-space neighbor, so both
    tiles DMA + walk it (~1 extra visit per bin, ~13% of demo visits);
    aligned, a bin walks exactly ceil(len/128) slices. Exact — pad
    lanes evaluate the never-record (no coverage). OFF by default: the
    repositioning needs two extra ~P-needle gathers (bin-table lookup +
    stri remap) plus 128*n_bins extra record-gather rows, measured
    +20 ms of prep at demo scale against ~3 ms of skipped visits
    (BASELINE.md round 4) — TPU gathers price per needle, so any
    per-pair stream rewrite must save MORE than a gather's worth.

    ``ysort_sub_rows``: bucket each bin's pairs by the triangle's first
    covered SUB-BLOCK row (``sub_rows``-row horizontal strips — MUST
    match the raster kernel's ``sub_rows``) ahead of the z order, and
    append a record row carrying the triangle's packed absolute
    sub-block span (``ysub1 * 4096 + ysub0``). The kernel then reduces
    each 128-pair slice's span to a scalar window and SKIPS the
    sub-blocks outside it (``y_row`` in rasterize_pairs*) — at meshlet
    scale triangles cover 1 of a tile's 8 sub-blocks, so the dense
    pixels-x-pairs product drops up to 8x. Exact: a triangle's coverage
    outside its binning bbox is empty by construction.

    ``gather_chunks``: split the pair record gather into G gathers over
    CONTIGUOUS row-slices of the record table (free slices — no
    relayout), each with needles clamped into its slice, mask-selected
    by chunk ownership. Exact for any G. Measured at c4 shapes
    (tools/gather_pair_probe.py, real TPU): plain 27.2 ms vs chunk4
    32.2 ms — REJECTED as a default (the per-gather cost follows the
    needle count, so G sub-gathers only add select traffic); kept for
    the ledger + tests.

    ``gather_pack``: pack the record table G rows per physical row
    ((rows, rec) -> (rows/G, G*rec)) so ONE wide gather with stri//G
    needles hits a G-fold smaller table, then select the record by
    stri%G from the G row-groups. Exact for any G. This is the c4 fix:
    TPU row-gather cost jumps sharply above ~200k table rows, and at
    config-4 scale (~1M-row table) the probe measures plain
    gather+transpose = 27.2 ms vs packed8 = 11.58 ms (2.35x). 0 = auto:
    8 when the table exceeds 262144 rows, else 1 (demo-scale tables
    keep the plain gather — bit-identical, no relayout cost).
    """
    edge = setup.edge
    t = edge.shape[0]
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)
    n_tiles = n_ty * n_tx
    y0f = jnp.asarray(y0_tiles, jnp.float32)
    # Supertile grid + the z sort-key bit budget (all static).
    super_w = _super_w(tile_w)
    n_sx = -(-n_tx // super_w)
    super_h = _super_h(tile_h)
    n_sy = -(-n_ty // super_h)
    n_super = n_sy * n_sx
    n_bins = n_tiles + n_super + 2  # dense + super + global + dead
    has_z = 1 if (sort_z and setup.zmin is not None) else 0
    has_y = 1 if ysort_sub_rows else 0
    n_sub = (tile_h // ysort_sub_rows) if has_y else 1
    ybits = max(1, (n_sub - 1).bit_length()) if has_y else 0
    # Front-to-back key low bits: (n_bins << (ybits + zbits)) < 2^31.
    zbits = (min(16, 30 - max(n_bins - 1, 1).bit_length() - ybits)
             if has_z else 0)
    zscale = float((1 << zbits) - 1) if has_z else 1.0

    n_extra = 0 if extra is None else extra.shape[1]
    rec_rows = max(16, ((12 + n_extra + has_z + has_y + 15) // 16) * 16)
    never = jnp.zeros((rec_rows,), jnp.float32).at[2].set(-1.0) \
        .at[5].set(-1.0).at[8].set(-1.0)
    if has_y:
        # Never-record y span: ysub0 = 4095 (min-reduce ignores it),
        # ysub1 = 0 (max-reduce ignores it) — dead lanes in a shared
        # boundary slice must not widen the window.
        never = never.at[12 + n_extra + has_z].set(4095.0)
    bbox = setup.bbox
    cols = [edge.reshape(t, 9), setup.zc]
    if extra is not None:
        cols.append(extra.astype(jnp.float32))
    if has_z:
        # Record row 12+n_extra carries the triangle's SORT-BUCKET floor
        # (quantized zmin): within a z-sorted bin, every later pair's
        # true depth is >= this slice's max bucket value — the kernel's
        # occlusion early-out bound (rasterize_pairs z_row/early_out).
        zq_val = jnp.floor(
            jnp.clip(setup.zmin, 0.0, 1.0) * zscale) / zscale
        cols.append(zq_val[:, None])
    if has_y:
        # Absolute sub-block span of the binning bbox, packed into one
        # row (both < 4096; the packed value < 2^24 stays exact in f32).
        ysub0 = jnp.clip(jnp.floor(bbox[:, 1] / ysort_sub_rows), 0.0,
                         4095.0)
        ysub1 = jnp.clip(jnp.ceil(bbox[:, 3] / ysort_sub_rows) - 1.0,
                         0.0, 4095.0)
        cols.append((ysub1 * 4096.0 + ysub0)[:, None])
    pad_cols = rec_rows - 12 - n_extra - has_z - has_y
    if pad_cols:
        cols.append(jnp.zeros((t, pad_cols), jnp.float32))
    rec = jnp.concatenate(cols, axis=1)
    rec = jnp.where(setup.valid[:, None], rec, never[None, :])
    rec16 = jnp.concatenate([rec, never[None, :]], axis=0)  # row t = dead

    # Covered tile ranges (band-relative rows).
    bbox = setup.bbox
    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / tile_h) - y0f, 0, n_ty - 1)
    tx1 = jnp.clip(jnp.ceil(bbox[:, 2] / tile_w) - 1.0, 0, n_tx - 1)
    ty1 = jnp.clip(jnp.ceil(bbox[:, 3] / tile_h) - 1.0 - y0f, 0, n_ty - 1)
    # Live = valid AND bbox intersects this row band AND overlaps the
    # screen in x (fully off-screen-left/right triangles would otherwise
    # clip into the edge tile columns and rasterize for nothing).
    live = (
        setup.valid
        & (bbox[:, 2] > bbox[:, 0])
        & (bbox[:, 3] > bbox[:, 1])
        & (bbox[:, 2] > 0)
        & (bbox[:, 0] < width)
        & (bbox[:, 3] / tile_h > y0f)
        & (bbox[:, 1] / tile_h < y0f + n_ty)
    )
    if center_cull if center_cull is not None else CENTER_CULL:
        live = live & _covers_pixel_center(bbox)
    nx = (tx1 - tx0 + 1.0)
    ny = (ty1 - ty0 + 1.0)
    ncov = jnp.where(live, nx * ny, 0.0)

    # Supertile ranges (two-level binning; see SUPER_* above).
    sx0 = jnp.floor(tx0 / super_w)
    sy0 = jnp.floor(ty0 / super_h)
    sx1 = jnp.floor(tx1 / super_w)
    sy1 = jnp.floor(ty1 / super_h)
    snx = sx1 - sx0 + 1.0
    ncov_s = jnp.where(live, snx * (sy1 - sy0 + 1.0), 0.0)

    # Pair expansion: slot e of a small triangle covers tile
    # (ty0 + e // nx, tx0 + e % nx); slot e < SUPER_EXPAND of a medium
    # triangle covers supertile (sy0 + e // snx, sx0 + e % snx), keyed
    # after the dense tiles. DEAD sorts after the global bucket.
    g_key = jnp.float32(n_tiles + n_super)
    dead = g_key + 1.0
    e = jnp.arange(expand, dtype=jnp.float32)[None, :]
    ey = jnp.floor((e + 0.5) / nx[:, None])
    ex = e - ey * nx[:, None]
    tile = (ty0[:, None] + ey) * n_tx + (tx0[:, None] + ex)
    sey = jnp.floor((e + 0.5) / snx[:, None])
    sex = e - sey * snx[:, None]
    stile = n_tiles + (sy0[:, None] + sey) * n_sx + (sx0[:, None] + sex)
    small = ncov <= expand
    med = (~small) & (ncov_s <= SUPER_EXPAND)
    keys = jnp.where(
        (e < ncov[:, None]) & small[:, None], tile,
        jnp.where((e < ncov_s[:, None]) & med[:, None], stile, dead),
    )
    # Oversized triangles: one pair in the global bucket.
    keys = keys.at[:, 0].set(
        jnp.where(live & ~small & ~med, g_key, keys[:, 0])
    )
    pad = (-(t * expand)) % 128
    keys = jnp.pad(keys.reshape(-1), ((0, pad)), constant_values=dead)
    tri_ids = jnp.tile(jnp.arange(t, dtype=jnp.int32)[:, None],
                       (1, expand))
    tri_ids = jnp.pad(tri_ids.reshape(-1), ((0, pad)), constant_values=t)
    tri_ids = jnp.where(keys >= dead, t, tri_ids)

    if has_z or has_y:
        # Within-bin order: key = bin << (ybits + zbits) | y-bucket <<
        # zbits | quantized zmin. The bin ids stay exact in f32
        # (< 2^24); the composite is assembled in int32, sized so
        # (n_bins << (ybits + zbits)) < 2^31.
        low = jnp.zeros_like(tri_ids)
        if has_y:
            # First covered sub-block RELATIVE to the pair's own tile
            # (dense pairs only; supertile/global pairs take bucket 0 —
            # their order within the bin is free).
            yb_tri = jnp.clip(jnp.floor(bbox[:, 1] / ysort_sub_rows),
                              0.0, 4095.0)
            tile_base = (ty0[:, None] + ey + y0f) * float(n_sub)
            yb = jnp.clip(yb_tri[:, None] - tile_base, 0.0,
                          float(n_sub - 1))
            yb = jnp.where((e < ncov[:, None]) & small[:, None], yb, 0.0)
            yb = jnp.pad(yb.reshape(-1), ((0, pad)))
            low = yb.astype(jnp.int32) << zbits
        if has_z:
            zq = jnp.clip(
                jnp.floor(setup.zmin * zscale), 0.0, zscale
            ).astype(jnp.int32)
            zq = jnp.pad(
                jnp.tile(zq[:, None], (1, expand)).reshape(-1), ((0, pad))
            )
            low = low | zq
        keys_i = (keys.astype(jnp.int32) << (ybits + zbits)) | low
    else:
        keys_i = keys.astype(jnp.int32)

    skey, stri = jax.lax.sort((keys_i, tri_ids), num_keys=1)

    # Live-pair capacity (VERDICT r2 #2): dead pairs sort LAST, so the
    # live pairs occupy a prefix of the sorted stream — slicing to
    # ``max_pairs`` makes the O(P) record gather (the dominant prep cost
    # at meshlet scale) track the POST-CULL pair count instead of
    # T * expand capacity. Overflow (live pairs beyond the cap) is
    # counted for validation mode; ranges clamp automatically because
    # searchsorted runs on the sliced keys.
    overflow = jnp.int32(0)
    if max_pairs is not None and max_pairs < skey.shape[0]:
        cap = max(128, (max_pairs // 128) * 128)
        live_end = jnp.searchsorted(
            skey,
            jnp.int32((n_tiles + n_super + 1) << (ybits + zbits)),
            side="left",
        ).astype(jnp.int32)
        overflow = jnp.maximum(live_end - cap, 0)
        skey = skey[:cap]
        stri = stri[:cap]

    # Per-bin offsets (n_tiles dense + n_super supertile + global + dead)
    # via binary search over the SORTED keys — 0.5k searches of log(P)
    # instead of a P-element scatter-add histogram. Bin b's keys occupy
    # [b << k, (b+1) << k), k = ybits + zbits, when sort_y/sort_z pack
    # bucket low bits.
    off = jnp.searchsorted(
        skey,
        jnp.arange(n_bins, dtype=jnp.int32) << (ybits + zbits),
        side="left",
    ).astype(jnp.int32)
    if align:
        # Reposition every walked bin (dense + super + global) to a
        # 128-slice boundary. Formulated as a GATHER over the aligned
        # positions (TPU-friendly): output j belongs to bin b_j =
        # searchsorted(aoff, j) - 1 and reads source off[b_j] + (j -
        # aoff[b_j]); tail positions past the bin's length hold the
        # dead id t (the never-record — no coverage, exact).
        n_walk = n_tiles + n_super + 1
        p0 = stri.shape[0]
        lens = off[1 : n_walk + 1] - off[:n_walk]
        # The dead bin has no off[n_walk + 1]; global's end IS
        # off[n_walk] (dead start), already covered above.
        aoff = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(((lens + 127) // 128) * 128, dtype=jnp.int32),
        ])
        total = p0 + 128 * n_walk  # static upper bound, slice-aligned
        j = jnp.arange(total, dtype=jnp.int32)
        # b_j = (count of bin starts <= j) - 1, via a tiny scatter-add
        # + cumsum — a 524k-needle searchsorted measured ~60 ms here;
        # this formulation is ~free. Coincident starts (empty bins)
        # resolve to the LAST bin at that position, which is the one
        # that owns the positions.
        ind = jnp.zeros((total,), jnp.int32).at[aoff[:n_walk]].add(
            1, mode="drop")
        b_j = jnp.clip(jnp.cumsum(ind) - 1, 0, n_walk - 1)
        rel = j - aoff[b_j]
        src = jnp.minimum(off[b_j] + rel, p0 - 1)
        stri = jnp.where(rel < lens[b_j], stri[src], t)
        starts = aoff[:n_tiles]
        ends = starts + lens[:n_tiles]
        sstarts = aoff[n_tiles : n_tiles + n_super]
        sends = sstarts + lens[n_tiles : n_tiles + n_super]
        g0 = aoff[n_tiles + n_super]
        gbounds = jnp.stack([g0, g0 + lens[n_tiles + n_super]])
    else:
        starts = off[:n_tiles]
        ends = off[1 : n_tiles + 1]
        sstarts = off[n_tiles : n_tiles + n_super]
        sends = off[n_tiles + 1 : n_tiles + n_super + 1]
        gbounds = off[n_tiles + n_super : n_tiles + n_super + 2]

    if gather_pack == 0:  # auto by table size
        gather_pack = 8 if rec16.shape[0] > 262144 else 1
    if gather_chunks == 0:  # auto by table size
        gather_chunks = 1
        while (gather_chunks < 8
               and -(-rec16.shape[0] // gather_chunks) > 131072):
            gather_chunks *= 2
    if gather_pack > 1:
        gp = gather_pack
        n_rows = rec16.shape[0]
        rows_p = -(-n_rows // gp) * gp
        rec_p = rec16 if rows_p == n_rows else jnp.concatenate(
            [rec16, jnp.zeros((rows_p - n_rows, rec_rows), rec16.dtype)],
            axis=0)
        packed = rec_p.reshape(rows_p // gp, gp * rec_rows)
        # Materialize the packed table: without the barrier XLA fuses
        # the reshape into the gather and the physical gather still
        # walks the tall unpacked layout (measured: no win at c4; the
        # isolated probe with a materialized table wins 2.35x).
        packed = jax.lax.optimization_barrier(packed)
        wide = packed[stri // gp]  # (P, gp*rec_rows) — small-table tier
        grp = stri % gp
        pair_rec = jax.lax.slice_in_dim(wide, 0, rec_rows, axis=1)
        for c in range(1, gp):
            pair_rec = jnp.where(
                (grp == c)[:, None],
                jax.lax.slice_in_dim(wide, c * rec_rows,
                                     (c + 1) * rec_rows, axis=1),
                pair_rec)
    elif gather_chunks > 1:
        n_rows = rec16.shape[0]
        nc = -(-n_rows // gather_chunks)
        pair_rec = None
        for c in range(gather_chunks):
            lo = c * nc
            sub = jax.lax.slice_in_dim(
                rec16, lo, min(lo + nc, n_rows), axis=0)
            part = sub[jnp.clip(stri - lo, 0, sub.shape[0] - 1)]
            pair_rec = part if pair_rec is None else jnp.where(
                (stri >= lo)[:, None], part, pair_rec)
    else:
        pair_rec = rec16[stri]  # (P, rec_rows)
    n_slices = pair_rec.shape[0] // 128
    records = pair_rec.reshape(n_slices, 128, rec_rows).transpose(0, 2, 1)
    return PairedTriangles(
        records=records,
        pair_tri=stri,
        starts=starts,
        ends=ends,
        sstarts=sstarts,
        sends=sends,
        gbounds=gbounds,
        overflow=overflow,
    )


def count_oversized(setup: TriangleSetup, width: int, height: int,
                    tile_h: int, tile_w: int, expand: int):
    """Validation counter: triangles that fall into the GLOBAL bucket
    every tile walks — bbox covers more than ``expand`` tiles AND more
    than SUPER_EXPAND supertiles (the middle tier absorbs medium
    triangles) — ADVICE r2: a scene full of them degrades toward
    O(n_tiles * n_big_tris) raster work with no warning."""
    bbox = setup.bbox
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)
    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / tile_h), 0, n_ty - 1)
    tx1 = jnp.clip(jnp.ceil(bbox[:, 2] / tile_w) - 1.0, 0, n_tx - 1)
    ty1 = jnp.clip(jnp.ceil(bbox[:, 3] / tile_h) - 1.0, 0, n_ty - 1)
    live = (
        setup.valid
        & (bbox[:, 2] > bbox[:, 0])
        & (bbox[:, 3] > bbox[:, 1])
        & (bbox[:, 2] > 0)
        & (bbox[:, 0] < width)
    )
    ncov = (tx1 - tx0 + 1.0) * (ty1 - ty0 + 1.0)
    super_w = _super_w(tile_w)
    super_h = _super_h(tile_h)
    ncov_s = (
        (jnp.floor(tx1 / super_w) - jnp.floor(tx0 / super_w) + 1.0)
        * (jnp.floor(ty1 / super_h) - jnp.floor(ty0 / super_h) + 1.0)
    )
    return jnp.sum(
        live & (ncov > expand) & (ncov_s > SUPER_EXPAND)
    ).astype(jnp.int32)


def _pack_rows(tile_h: int, tile_w: int, sub_rows: int):
    """Packed-block geometry for narrow tiles: each (jc, sb) sub-block's
    ``p_sub = sub_rows * tile_w`` linear pixels occupy ``pr = p_sub/128``
    native 128-lane rows of the (tile_h, 128) Pallas block, at row
    ``jc * n_sub * pr + sb * pr``. For tile_w == 128 this is exactly the
    screen layout (identity)."""
    return (sub_rows * tile_w) // 128


def pack_block_layout(x, tile_h: int, tile_w: int, sub_rows: int):
    """Screen layout -> the kernel's packed block layout (XLA-side; a
    reshape/transpose pair, identity when tile_w == 128). Operates on
    the last two dims of ``x`` (multiples of tile_h / 128).

    Packed position of screen pixel (sb*sub_rows + r, jc*tile_w + c)
    within its (tile_h, 128) block: row ``jc*n_sub*pr + sb*pr + p//128``,
    lane ``p % 128`` with ``p = r*tile_w + c`` — every sub-block's
    pixels as native full-lane rows, so the kernel never reshapes
    narrow (sub_rows, tile_w) vectors (Mosaic cannot lower those)."""
    cols = 128 // tile_w
    if cols == 1:
        return x
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    n_sub = tile_h // sub_rows
    k = len(lead)
    y = x.reshape(lead + (h // tile_h, n_sub, sub_rows,
                          w // 128, cols, tile_w))
    # (ty, sb, r, txb, jc, c) -> (ty, txb, jc, sb, r, c)
    y = y.transpose(tuple(range(k))
                    + (k, k + 3, k + 4, k + 1, k + 2, k + 5))
    y = y.reshape(lead + (h // tile_h, w // 128, tile_h, 128))
    # (ty, txb, row_p, lane) -> (ty, row_p, txb, lane)
    y = y.transpose(tuple(range(k)) + (k, k + 2, k + 1, k + 3))
    return y.reshape(lead + (h, w))


def unpack_block_layout(x, tile_h: int, tile_w: int, sub_rows: int):
    """Packed block layout -> screen layout (inverse of
    pack_block_layout; identity when tile_w == 128)."""
    cols = 128 // tile_w
    if cols == 1:
        return x
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    n_sub = tile_h // sub_rows
    k = len(lead)
    y = x.reshape(lead + (h // tile_h, tile_h, w // 128, 128))
    y = y.transpose(tuple(range(k)) + (k, k + 2, k + 1, k + 3))
    y = y.reshape(lead + (h // tile_h, w // 128, cols, n_sub, sub_rows,
                          tile_w))
    # (ty, txb, jc, sb, r, c) -> (ty, sb, r, txb, jc, c)
    y = y.transpose(tuple(range(k))
                    + (k, k + 3, k + 4, k + 1, k + 2, k + 5))
    return y.reshape(lead + (h, w))


def _acc_shape(tile_h: int, tile_w: int, sub_rows: int, winner: str,
               cols: int = 1):
    """VMEM accumulator shape: per-sub-block lane-major vectors for the
    reducing walks; for accwide, GROUP planes of >= 1024 pixel rows
    (see _run_raster_walk_accwide — total bytes are tile_h*128*128*4
    regardless of the tile shape)."""
    if winner == "accwide":
        plane = max(1024, sub_rows * tile_w)
        return ((tile_h * 128) // plane, plane, 128)
    return (tile_h // sub_rows, sub_rows * tile_w)


def _make_walk(records_hbm, scratch_ref, sem_ref, n_slots, step: int = 1):
    """Build a double-buffered slice walker over pair-index ranges.

    ``step=2`` (the paired walk, round 5): each loop iteration DMAs TWO
    consecutive slices in one copy and issues the body for both — the
    per-visit scalar overhead (slice/range pick chains, DMA issue+wait,
    loop bookkeeping) halves while the vector work is unchanged; the
    round-3 bisections showed the walks are per-visit ISSUE bound, not
    math bound. Boundary handling leans on body idempotency: a pair's
    second slice may spill past its range (masked by [lo, hi)) and the
    last pair of a short stream clamps backward, re-processing a slice
    — exact for all three walk bodies (depth min, strict-< winner
    take, and the phase-2 overwrite-with-same fetch are idempotent).
    ``scratch_ref`` is (n_slots * step, rec_rows, 128), kept 3-D — the
    bodies receive a flat slice index (slot * step + k), so their VMEM
    addressing is identical to the unpaired walk (a 4-D scratch
    measurably degraded Mosaic's lowering)."""

    def walk(ranges, body, init_carry=0):
        """``ranges``: static-length list of (lo, hi) pair-index ranges
        (a tile's dense range — or several column sub-tiles' ranges —
        its supertile range, the global bucket) walked as ONE fori_loop
        so the DMA pipeline never drains between them. ``body(slot, k,
        c_base, lo, hi, ridx, carry) -> carry`` with the slice resident
        in ``scratch_ref[slot, k]``; ``ridx`` is the (traced) index of
        the range the slice belongs to; boundary slices are shared with
        neighbor ranges/tiles, so the body must mask lanes outside
        [lo, hi). Returns the final carry."""
        n_slices = records_hbm.shape[0]
        s0s, cnts = [], []
        for lo, hi in ranges:
            s0s.append(lo // 128)
            cnt = jnp.where(hi > lo, (hi + 127) // 128 - (lo // 128), 0)
            cnts.append((cnt + step - 1) // step)
        # Exclusive prefix of the per-range VISIT counts (step slices
        # per visit).
        pref = [jnp.int32(0)]
        for c in cnts:
            pref.append(pref[-1] + c)
        n = pref[-1]

        def pick(j, vals):
            out = vals[-1]
            for r in range(len(ranges) - 2, -1, -1):
                out = jnp.where(j < pref[r + 1], vals[r], out)
            return out

        def slice_of(j):
            first = pick(j, [s0s[r] + step * (j - pref[r])
                             for r in range(len(ranges))])
            # Clamp so the step-wide copy stays in bounds (idempotent
            # re-processing of an earlier slice).
            return jnp.maximum(jnp.minimum(first, n_slices - step), 0)

        def get_dma(slot, j):
            if step == 1:
                return pltpu.make_async_copy(
                    records_hbm.at[slice_of(j)],
                    scratch_ref.at[slot],
                    sem_ref.at[slot],
                )
            return pltpu.make_async_copy(
                records_hbm.at[pl.ds(slice_of(j), step)],
                scratch_ref.at[pl.ds(slot * step, step)],
                sem_ref.at[slot],
            )

        for k in range(n_slots - 1):
            @pl.when(k < n)
            def _warmup(k=k):
                get_dma(k, k).start()

        def slice_body(j, carry):
            slot = jax.lax.rem(j, n_slots)

            @pl.when(j + n_slots - 1 < n)
            def _prefetch():
                get_dma(
                    jax.lax.rem(j + n_slots - 1, n_slots), j + n_slots - 1
                ).start()

            get_dma(slot, j).wait()
            s0 = slice_of(j)
            lo = pick(j, [r[0] for r in ranges])
            hi = pick(j, [r[1] for r in ranges])
            ridx = pick(j, [jnp.int32(r) for r in range(len(ranges))])
            for k in range(step):
                carry = body(slot * step + k, (s0 + k) * 128, lo, hi,
                             ridx, carry)
            return carry

        return jax.lax.fori_loop(0, n, slice_body, init_carry)

    return walk


def _pair_kernel(
    y0_ref,
    starts_ref,
    ends_ref,
    sstarts_ref,
    sends_ref,
    gbounds_ref,
    records_hbm,
    init_ref,
    depth_ref,
    tid_ref,
    scratch_ref,
    sem_ref,
    acc_d_ref,
    acc_t_ref,
    stop_ref,
    *,
    tile_h: int,
    tile_w: int,
    n_tx: int,
    sub_rows: int,
    depth_only: bool,
    winner: str,
    cols: int = 1,
    early_out: bool = False,
    z_row: int = -1,
    eo_stride: int = 4,
    y_row: int = -1,
):
    t = pl.program_id(0)

    # Grid is over 128-px-wide BLOCKS; ``cols`` column sub-tiles of
    # tile_w px share one block (cols == 1 when tile_w == 128). Pair
    # binning (starts/ends, supertiles) is in narrow-tile units.
    n_txb = n_tx // cols
    ty = t // n_txb
    txb = t % n_txb
    base_x = (txb * cols * tile_w).astype(jnp.int32)
    base_y = ((ty + y0_ref[0]) * tile_h).astype(jnp.int32)
    super_w = _super_w(tile_w)
    n_sx = -(-n_tx // super_w)
    st = (ty // _super_h(tile_h)) * n_sx + (txb * cols // super_w)

    n_slots = N_SLOTS
    walk = _make_walk(records_hbm, scratch_ref, sem_ref, n_slots,
                      step=_walk_step(records_hbm.shape[0]))
    ranges = [
        (starts_ref[ty * n_tx + txb * cols + jc],
         ends_ref[ty * n_tx + txb * cols + jc])
        for jc in range(cols)
    ] + [
        (sstarts_ref[st], sends_ref[st]),
        (gbounds_ref[0], gbounds_ref[1]),
    ]
    _run_raster_walk(
        walk, scratch_ref, init_ref, depth_ref, tid_ref, base_x, base_y,
        ranges, acc_d_ref, acc_t_ref, tile_h=tile_h, tile_w=tile_w,
        sub_rows=sub_rows, depth_only=depth_only, winner=winner,
        cols=cols, stop_ref=stop_ref if early_out else None,
        z_row=z_row, eo_stride=eo_stride, y_row=y_row,
    )


def _run_raster_walk_accwide(walk, scratch_ref, init_ref, depth_ref,
                             tid_ref, base_x, base_y, ranges, acc_d_ref,
                             acc_t_ref, *, tile_h: int, tile_w: int,
                             sub_rows: int, depth_only: bool,
                             cols: int = 1, stop_ref=None,
                             z_row: int = -1, eo_stride: int = 4,
                             y_row: int = -1):
    """Full-width accumulator walk: per-visit state is the whole
    (p_sub, 128) candidate plane — ``acc_d = min(acc_d, cand)`` (+ a
    compare-select pid plane when tracking winners) — and the cross-LANE
    argmin happens ONCE per tile in the epilogue instead of once per
    visit. The per-visit cross-lane min reduction (log2(128) shuffle
    steps over 128 vregs) was the single largest cost of the old walk:
    the hardware decomposition measured winner tracking at ~18 ms over
    the depth-only floor (BASELINE.md round-3c), almost all of it the
    per-visit reduce + compare-select chain this layout deletes. Pixel
    iotas are computed once per tile (the old body re-derived px/py per
    sub-block per visit inside the fori_loop, where Mosaic does not
    hoist them).

    Winner semantics are identical to ``argmin2``: the winning pair is
    the LOWEST pair id among the minimum-depth candidates (per lane the
    strict ``<`` keeps the earliest visit; the epilogue takes the min
    pid across tied lanes), and init_depth wins ties (tid -1).

    ``cols > 1`` walks the 128-wide Pallas block as ``cols`` column
    sub-tiles of ``tile_w`` px: ranges[0..cols-1] are the sub-tiles'
    dense pair ranges and each of their slices is evaluated ONLY against
    its own (p_sub, 128) pixel block (a quarter of the dense product at
    tile_w=32 — demo grass is vertical slivers, so a pair's bbox rarely
    needs the full 128-px width); the trailing supertile/global ranges
    are evaluated against every column."""
    n_sub = tile_h // sub_rows
    p_sub = sub_rows * tile_w
    pr = p_sub // 128  # packed 128-lane rows per sub-block
    # Accumulator planes GROUP sub-blocks to >= 1024 pixel rows so every
    # epilogue reshape is (8k, 128) <-> (1024k,) — Mosaic cannot lower
    # narrower ones. A sub-block's slice within its plane is rows
    # [(rb % gr) * 128, + p_sub) with rb its packed row index.
    plane = max(1024, p_sub)
    gr = plane // 128  # packed rows per plane (>= 8)
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (1, 128), 1
    ).astype(jnp.float32)
    n_groups = (tile_h * 128) // plane
    # Per-visit work stays issued per (p_sub, 128) SUB-BLOCK: a whole-
    # plane (1024, 128) variant keeps ~7 live (plane, 128) temporaries =
    # ~900 vregs and spills the vector register file — measured +4.4 ms
    # on phase 1 at the demo scale (BASELINE.md round 4).
    lin = jax.lax.broadcasted_iota(jnp.int32, (p_sub, 1), 0)
    colx = jnp.mod(lin, tile_w)
    pxs = [
        (base_x + jc * tile_w + colx).astype(jnp.float32) + 0.5
        for jc in range(cols)
    ]
    py0 = (base_y + lin // tile_w).astype(jnp.float32) + 0.5
    pys = [py0 + float(sb * sub_rows) for sb in range(n_sub)]

    for g in range(n_groups):
        acc_d_ref[g] = jnp.full((plane, 128), NO_HIT, jnp.float32)
        if not depth_only:
            acc_t_ref[g] = jnp.full((plane, 128), -1.0, jnp.float32)

    def acc_slot(jc, sb):
        rb = (jc * n_sub + sb) * pr
        return rb // gr, (rb % gr) * 128

    # Occlusion early-out (front-to-back pairs only): every ``eo_stride``
    # visits, if ALL of the range's pixels already hold a depth strictly
    # below the slice's max z-bucket (record row z_row — a lower bound on
    # every remaining pair's depth in the sorted range), the rest of the
    # range cannot win anywhere and its visits reduce to one scalar
    # branch. Dense column ranges test only their own planes (a group
    # mixing columns is a conservative superset).
    do_eo = stop_ref is not None and z_row >= 0

    def col_groups(jc):
        lo_g = (jc * n_sub * pr) // gr
        hi_g = ((jc + 1) * n_sub * pr - 1) // gr
        return range(lo_g, hi_g + 1)

    def eff_max(groups):
        """Max over the groups' pixels of min(lane-min(acc), init)."""
        tm = None
        for g in groups:
            lane_min = jnp.min(acc_d_ref[g], axis=1)  # (plane,)
            init = init_ref[pl.ds(g * gr, gr), :].reshape(plane)
            m = jnp.max(jnp.minimum(lane_min, init))
            tm = m if tm is None else jnp.maximum(tm, m)
        return tm

    if do_eo:
        stop_ref[0] = -1

    base_sub_f = (base_y // sub_rows).astype(jnp.float32)

    def raster_body(slot, c_base, lo, hi, ridx, carry):
        lane_ok = (
            (lane_f >= (lo - c_base).astype(jnp.float32))
            & (lane_f < (hi - c_base).astype(jnp.float32))
        )
        if y_row >= 0:
            # Sub-block window skip (y-bucketed bins, build_pairs
            # ysort_sub_rows): reduce the slice's packed absolute
            # sub-block spans to one scalar [lo_sb, hi_sb] window and
            # skip every sub-block outside it. The reduce runs on ONE
            # (1, 128) row (cheap, unlike the rejected whole-plane
            # early-out reductions); dead/never lanes carry (4095, 0)
            # so they never widen the window.
            ysr = scratch_ref[slot, y_row : y_row + 1, :]
            y1s = jnp.floor(ysr * (1.0 / 4096.0))
            y0s = ysr - y1s * 4096.0
            lo_sb = jnp.min(jnp.where(lane_ok, y0s, 4095.0)) - base_sub_f
            hi_sb = jnp.max(jnp.where(lane_ok, y1s, 0.0)) - base_sub_f
        if not depth_only:
            pid_f = c_base.astype(jnp.float32) + lane_f

        def form(r, px, py):
            return (
                px * scratch_ref[slot, r : r + 1, :]
                + py * scratch_ref[slot, r + 1 : r + 2, :]
                + scratch_ref[slot, r + 2 : r + 3, :]
            )

        def eval_cand(px, py):
            e0 = form(0, px, py)
            e1 = form(3, px, py)
            e2 = form(6, px, py)
            d = (
                e0 * scratch_ref[slot, 9:10, :]
                + e1 * scratch_ref[slot, 10:11, :]
                + e2 * scratch_ref[slot, 11:12, :]
            )
            esum = e0 + e1 + e2
            emin = jnp.minimum(jnp.minimum(e0, e1), e2)
            inside = (
                (emin >= 0.0) & (esum > 0.0) & (d >= 0.0) & (d <= 1.0)
            ) & lane_ok
            return jnp.where(inside, d, NO_HIT)

        def sub_work(jc, sb):
            cand = eval_cand(pxs[jc], pys[sb])
            g, o = acc_slot(jc, sb)
            if depth_only:
                acc_d_ref[g, pl.ds(o, p_sub)] = jnp.minimum(
                    cand, acc_d_ref[g, pl.ds(o, p_sub)]
                )
            else:
                cur = acc_d_ref[g, pl.ds(o, p_sub)]
                take = cand < cur
                acc_d_ref[g, pl.ds(o, p_sub)] = jnp.where(
                    take, cand, cur
                )
                acc_t_ref[g, pl.ds(o, p_sub)] = jnp.where(
                    take, pid_f, acc_t_ref[g, pl.ds(o, p_sub)]
                )

        def col_work(jc):
            for sb in range(n_sub):
                if y_row >= 0:
                    @pl.when((lo_sb <= float(sb)) & (float(sb) <= hi_sb))
                    def _(jc=jc, sb=sb):
                        sub_work(jc, sb)
                else:
                    sub_work(jc, sb)

        def dispatch():
            if cols == 1:
                col_work(0)
            else:
                for jc in range(cols):
                    @pl.when((ridx == jc) | (ridx >= cols))
                    def _(jc=jc):
                        col_work(jc)

        if not do_eo:
            dispatch()
            return carry

        @pl.when(stop_ref[0] != ridx)
        def _work():
            dispatch()

            @pl.when(jax.lax.rem(carry, eo_stride) == eo_stride - 1)
            def _test():
                zrow_v = scratch_ref[slot, z_row : z_row + 1, :]
                zb = jnp.max(jnp.where(lane_ok, zrow_v, -NO_HIT))

                def mark(groups):
                    @pl.when(eff_max(groups) < zb)
                    def _():
                        stop_ref[0] = ridx

                if cols == 1:
                    mark(range(n_groups))
                else:
                    for jc in range(cols):
                        @pl.when(ridx == jc)
                        def _(jc=jc):
                            mark(col_groups(jc))
                    @pl.when(ridx >= cols)
                    def _():
                        mark(range(n_groups))
        return carry + 1

    walk(ranges, raster_body, init_carry=jnp.int32(0))

    # Epilogue per GROUP plane, in the PACKED block layout
    # (pack_block_layout; identity at tile_w == 128 — then gr ==
    # sub_rows and group == sub-block, exactly the pre-narrow code).
    for g in range(n_groups):
        a = acc_d_ref[g]
        lane_min = jnp.min(a, axis=1)  # (plane,)
        init = init_ref[pl.ds(g * gr, gr), :].reshape(plane)
        win = lane_min < init  # init_depth wins ties (tid stays -1)
        depth_ref[pl.ds(g * gr, gr), :] = jnp.where(
            win, lane_min, init
        ).reshape(gr, 128)
        if not depth_only:
            pid_min = jnp.min(
                jnp.where(a == lane_min[:, None], acc_t_ref[g], NO_HIT),
                axis=1,
            )
            tid_ref[pl.ds(g * gr, gr), :] = jnp.where(
                win, pid_min, -1.0
            ).astype(jnp.int32).reshape(gr, 128)


def _run_raster_walk(walk, scratch_ref, init_ref, depth_ref, tid_ref,
                     base_x, base_y, ranges, acc_d_ref, acc_t_ref, *,
                     tile_h: int, tile_w: int, sub_rows: int,
                     depth_only: bool, winner: str = "accwide",
                     cols: int = 1, stop_ref=None, z_row: int = -1,
                     eo_stride: int = 4, y_row: int = -1):
    """Phase-1 visibility walk (z-test + winner tracking), shared by the
    plain pair kernel and the fused kernel.

    Per-sub-block (depth, winner-key) state accumulates in
    ``acc_d_ref``/``acc_t_ref`` VMEM scratch shaped (n_sub, p_sub): a
    row slice is a lane-major 1-D vector in exactly the layout the
    (p_sub, 128) raster math produces, so per-visit load/store is a
    plain VMEM move. The (rows, lanes) output refs are written ONCE per
    tile — per-visit ``ref[(rows, lanes)] <-> (p_sub,)`` reshapes are
    sublane<->lane relayouts that cost more than the edge math. (A
    fori_loop-carry variant hit a Mosaic abort: ``min(axis=1) ->
    reshape -> carry`` fails to lower, probe 2026-08-17.)

    ``winner="accwide"`` dispatches to the full-width accumulator walk
    (no per-visit cross-lane reduction; see _run_raster_walk_accwide).
    """
    if winner == "accwide":
        return _run_raster_walk_accwide(
            walk, scratch_ref, init_ref, depth_ref, tid_ref, base_x,
            base_y, ranges, acc_d_ref, acc_t_ref, tile_h=tile_h,
            tile_w=tile_w, sub_rows=sub_rows, depth_only=depth_only,
            cols=cols, stop_ref=stop_ref, z_row=z_row,
            eo_stride=eo_stride, y_row=y_row,
        )
    assert y_row < 0, "sub-block window skip requires winner='accwide'"
    assert cols == 1, "column sub-tiles require winner='accwide'"
    n_sub = tile_h // sub_rows
    p_sub = sub_rows * tile_w
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (1, 128), 1
    ).astype(jnp.float32)
    depth_scale = 65536.0

    for sb in range(n_sub):
        acc_d_ref[sb, :] = init_ref[
            pl.ds(sb * sub_rows, sub_rows), :
        ].reshape(p_sub)
        if not depth_only:
            # Winner ids accumulate as f32 VALUES (exact integers up to
            # 2^24 >> any pair count) and cast to int32 once in the
            # epilogue: int32 selects/stores inside the hot visit body
            # hit the slow VPU path.
            acc_t_ref[sb, :] = jnp.full((p_sub,), -1.0, jnp.float32)

    def raster_body(slot, c_base, lo, hi, ridx, carry):
        # Boundary slices are shared with neighbor tiles: mask lanes
        # whose pair index falls outside the walked range.
        lane_ok = (
            (lane_f >= (lo - c_base).astype(jnp.float32))
            & (lane_f < (hi - c_base).astype(jnp.float32))
        )

        for sb in range(n_sub):
            lin = jax.lax.broadcasted_iota(jnp.int32, (p_sub, 1), 0)
            px = (base_x + jnp.mod(lin, tile_w)).astype(
                jnp.float32
            ) + 0.5
            py = (
                base_y + sb * sub_rows + lin // tile_w
            ).astype(jnp.float32) + 0.5

            def form(r):
                return (
                    px * scratch_ref[slot, r : r + 1, :]
                    + py * scratch_ref[slot, r + 1 : r + 2, :]
                    + scratch_ref[slot, r + 2 : r + 3, :]
                )  # (p_sub, 128)

            e0 = form(0)
            e1 = form(3)
            e2 = form(6)
            # Barycentric depth: rows 9-11 hold zc (see module doc).
            d = (
                e0 * scratch_ref[slot, 9:10, :]
                + e1 * scratch_ref[slot, 10:11, :]
                + e2 * scratch_ref[slot, 11:12, :]
            )
            esum = e0 + e1 + e2
            inside = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (esum > 0.0) & (d >= 0.0) & (d <= 1.0)
            ) & lane_ok
            if depth_only:
                cand = jnp.where(inside, d, NO_HIT)
                kb_best = jnp.min(cand, axis=1)
                acc_d_ref[sb, :] = jnp.minimum(kb_best, acc_d_ref[sb, :])
            elif winner == "probe_nokey":
                # PROBE ONLY (wrong tid): depth_only body + acc_t store
                # of kb_best — isolates key/decode cost from the
                # second accumulator's existence.
                cand = jnp.where(inside, d, NO_HIT)
                kb_best = jnp.min(cand, axis=1)
                acc_d_ref[sb, :] = jnp.minimum(kb_best, acc_d_ref[sb, :])
                acc_t_ref[sb, :] = jnp.minimum(kb_best, acc_t_ref[sb, :])
            elif winner == "probe_2red":
                # PROBE ONLY (wrong tid): two reductions, no compares.
                cand = jnp.where(inside, d, NO_HIT)
                kb_best = jnp.min(cand, axis=1)
                lane_best = jnp.min(cand * 0.5, axis=1)
                acc_d_ref[sb, :] = jnp.minimum(kb_best, acc_d_ref[sb, :])
                acc_t_ref[sb, :] = jnp.minimum(lane_best,
                                               acc_t_ref[sb, :])
            elif winner == "argmin2":
                # Two-reduction winner: plain depth min (the exact
                # depth_only semantics — no quantization), then the
                # winning lane by eq-compare + lane min (ties -> lowest
                # lane, as the packed key resolved them). Same speed as
                # the packed key on hardware (44.7 vs 43.5 ms demo-scale
                # phase-1) but keeps vis depth EXACT and consistent with
                # the depth_only output (ADVICE r2 #1) — the default.
                cand = jnp.where(inside, d, NO_HIT)
                kb_best = jnp.min(cand, axis=1)
                lane_best = jnp.min(
                    jnp.where(cand == kb_best[:, None], lane_f, 128.0),
                    axis=1,
                )
                cur = acc_d_ref[sb, :]
                take = kb_best < cur
                acc_d_ref[sb, :] = jnp.where(take, kb_best, cur)
                acc_t_ref[sb, :] = jnp.where(
                    take, c_base.astype(jnp.float32) + lane_best,
                    acc_t_ref[sb, :],
                )
            else:
                # Packed-key winner ("packed"): depth quantized to the
                # high bits, lane in the low bits, ONE min reduction.
                # Round-to-nearest halves the quantization bias vs floor.
                dq = jnp.floor(d * depth_scale + 0.5)
                key = jnp.where(
                    inside, dq * 128.0 + lane_f, NO_HIT
                )
                kmin = jnp.min(key, axis=1)
                kq = jnp.floor(kmin * (1.0 / 128.0))
                kb_best = jnp.where(
                    kmin < NO_HIT, kq * (1.0 / depth_scale), NO_HIT
                )
                kb_id = c_base.astype(jnp.float32) + (kmin - kq * 128.0)
                cur = acc_d_ref[sb, :]
                take = kb_best < cur
                acc_d_ref[sb, :] = jnp.where(take, kb_best, cur)
                acc_t_ref[sb, :] = jnp.where(take, kb_id,
                                             acc_t_ref[sb, :])
        return carry

    walk(ranges, raster_body)

    for sb in range(n_sub):
        depth_ref[pl.ds(sb * sub_rows, sub_rows), :] = (
            acc_d_ref[sb, :].reshape(sub_rows, tile_w)
        )
        if not depth_only:
            tid_ref[pl.ds(sb * sub_rows, sub_rows), :] = (
                acc_t_ref[sb, :].astype(jnp.int32).reshape(
                    sub_rows, tile_w)
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile_h", "tile_w", "sub_rows",
        "depth_only", "interpret", "map_tid", "winner",
        "early_out", "z_row", "eo_stride", "y_row",
    ),
)
def rasterize_pairs(
    pairs: PairedTriangles,
    height: int,
    width: int,
    init_depth: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    sub_rows: int = 8,
    depth_only: bool = False,
    y0_tiles=0,
    interpret: bool = False,
    map_tid: bool = True,
    winner: str = "accwide",
    early_out: bool = False,
    z_row: int = -1,
    eo_stride: int = 4,
    y_row: int = -1,
):
    """Rasterize an exact pair stream to (depth, triangle-id) buffers.

    Returns (depth, tid) with tid = ORIGINAL triangle ids (-1 uncovered),
    or just depth when ``depth_only``. ``map_tid=False`` returns raw
    winner PAIR indices instead (skips the (H*W)-index gather through
    ``pair_tri`` — for probes and callers that consume pair ids).
    """
    assert 128 % tile_w == 0, "tile_w must divide 128"
    cols = 128 // tile_w  # column sub-tiles per 128-px Pallas block
    n_tx = width // tile_w
    n_ty = height // tile_h
    n_tiles = n_ty * n_tx
    n_txb = n_tx // cols
    n_blocks = n_ty * n_txb
    assert pairs.starts.shape == (n_tiles,), (
        pairs.starts.shape, n_tiles)
    sub_rows = min(sub_rows, tile_h)
    if cols > 1:
        assert winner == "accwide", \
            "narrow tiles require winner='accwide'"

    if init_depth is None:
        init_depth = jnp.ones((height, width), jnp.float32)
    else:
        init_depth = pack_block_layout(init_depth, tile_h, tile_w,
                                       sub_rows)

    # Early-out is UNSOUND combined with y-bucketed bins: with ysort the
    # within-bin key is (y-bucket << zbits) | zq, so zq is NOT monotone
    # across a bin's slices — a later y-bucket's slice can hold pairs
    # nearer than the current slice's max z-bucket, and stopping on
    # (eff_max < zb) would skip them (wrong winners). Force it off when
    # the sub-block window skip is active (ADVICE r4 #2).
    do_eo = (early_out and z_row >= 0 and winner == "accwide"
             and y_row < 0)
    kernel = functools.partial(
        _pair_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        n_tx=n_tx,
        sub_rows=sub_rows,
        depth_only=depth_only,
        winner=winner,
        cols=cols,
        early_out=do_eo,
        z_row=z_row,
        eo_stride=eo_stride,
        y_row=y_row if winner == "accwide" else -1,
    )

    def tile_index(t, *prefetch):
        return (t // n_txb, t % n_txb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tile_h, 128), tile_index),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, 128), tile_index),
            pl.BlockSpec((tile_h, 128), tile_index),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS * _walk_step(pairs.records.shape[0]),
                        pairs.records.shape[1], 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
            pltpu.VMEM(_acc_shape(tile_h, tile_w, sub_rows, winner, cols),
                       jnp.float32),
            pltpu.VMEM(_acc_shape(tile_h, tile_w, sub_rows, winner, cols)
                       if not depth_only else (1, 8, 128),
                       jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.int32),
    )
    y0_arr = jnp.asarray(y0_tiles, jnp.int32).reshape(1)
    depth, tid_pair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(y0_arr, pairs.starts, pairs.ends, pairs.sstarts, pairs.sends,
      pairs.gbounds, pairs.records, init_depth)
    depth = unpack_block_layout(depth, tile_h, tile_w, sub_rows)
    if depth_only:
        return depth
    tid_pair = unpack_block_layout(tid_pair, tile_h, tile_w, sub_rows)
    if not map_tid:
        return depth, tid_pair
    tid = jnp.where(
        tid_pair >= 0, pairs.pair_tri[jnp.maximum(tid_pair, 0)], -1
    )
    return depth, tid


# ------------------------------------------------------ fused raster+interp

# Record rows for the fused kernel (build_pairs extra=34):
#   0-8 edge, 9-11 zc, 12 material-combo id (float VALUE — bitcast int ids
#   1..63 are f32 denormals the TPU flushes to zero), 13-45 corners
#   (corner k at 13+11k: uv(2) color(3) world-pos(3) world-normal(3)).
# Static scene facts shrink the layout (fused_extra_width): a scene with
# no varying texture channels AND the flat default normal map drops the
# uv columns (corner_w 11 -> 9; uv/lod/duv/dpos planes are never
# consumed — the TBN collapses to normalize(frag_normal)); a scene whose
# live triangles share ONE material combo drops the combo row (the
# constant rides a static kernel param).
FUSED_EXTRA = 34
_FETCH_ROWS = tuple(range(0, 9)) + tuple(range(12, 46))


def fused_extra_width(need_uv: bool = True, need_combo: bool = True) -> int:
    """Width of the fused extra payload under the static elision flags."""
    corner_w = 11 if need_uv else 9
    return (1 if need_combo else 0) + 3 * corner_w

# Output attribute planes of the fused kernel, channel-major (C, H, W):
#   0 covered, 1 combo, 2-3 uv, 4 lod, 5-7 vertex color, 8-10 world pos,
#   11-13 interpolated world normal, 14-15 duv/dx, 16-17 duv/dy,
#   18-20 dpos/dx, 21-23 dpos/dy.
ATTR_CH = 24


def _pair_fused_kernel(
    y0_ref,
    starts_ref,
    ends_ref,
    sstarts_ref,
    sends_ref,
    gbounds_ref,
    records_hbm,
    init_ref,
    depth_ref,
    tid_ref,
    attr_ref,
    scratch_ref,
    sem_ref,
    acc_ref,
    acc_d_ref,
    acc_t_ref,
    stop_ref,
    *,
    tile_h: int,
    tile_w: int,
    n_tx: int,
    sub_rows: int,
    texture_size: int,
    winner: str,
    cols: int = 1,
    early_out: bool = False,
    z_row: int = -1,
    eo_stride: int = 4,
    y_row: int = -1,
    need_uv: bool = True,
    has_combo: bool = True,
    combo_const: float = 0.0,
):
    """Phase 1: exact-pair visibility raster (identical to _pair_kernel).
    Phase 2: re-walk ONLY the slices containing winners (per-range
    min/max window over the tile's winner pair ids) and fetch each
    pixel's winning record rows with 128-lane dynamic gathers
    (tpu.dynamic_gather supports exactly one source vreg along the
    gather dimension, which a 128-wide record slice is). Then
    interpolate attributes + analytic screen derivatives per tile in
    native (tile_h, 128) plane layout — no (H, W, 64) record gather, no
    XLA-side interpolation pass, no extra HBM round trip.

    With ``cols > 1`` (narrow raster tiles) phase 1 walks the block's
    ``cols`` column sub-tiles' dense ranges; phase 2 is column-agnostic
    (a winner pair id identifies its slice regardless of which column it
    won) and only its shrink windows go per-range.

    ``need_uv=False`` (textureless scene with the flat default normal
    map): the record has no uv columns (corner_w 9) and the uv/lod/
    duv/dpos output planes — consumed only by the texture tap and TBN —
    are written as zeros; the whole derivative epilogue is skipped.
    ``has_combo=False`` (single material combo): no combo record row;
    plane 1 carries the static ``combo_const``.
    """
    t = pl.program_id(0)

    n_txb = n_tx // cols
    ty = t // n_txb
    txb = t % n_txb
    base_x = (txb * cols * tile_w).astype(jnp.int32)
    base_y = ((ty + y0_ref[0]) * tile_h).astype(jnp.int32)
    super_w = _super_w(tile_w)
    n_sx = -(-n_tx // super_w)
    st = (ty // _super_h(tile_h)) * n_sx + (txb * cols // super_w)

    n_slots = N_SLOTS
    walk = _make_walk(records_hbm, scratch_ref, sem_ref, n_slots,
                      step=_walk_step(records_hbm.shape[0]))

    dense = [
        (starts_ref[ty * n_tx + txb * cols + jc],
         ends_ref[ty * n_tx + txb * cols + jc])
        for jc in range(cols)
    ]

    # ---- phase 1: visibility
    _run_raster_walk(
        walk, scratch_ref, init_ref, depth_ref, tid_ref, base_x, base_y,
        dense + [(sstarts_ref[st], sends_ref[st]),
                 (gbounds_ref[0], gbounds_ref[1])],
        acc_d_ref, acc_t_ref,
        tile_h=tile_h, tile_w=tile_w, sub_rows=sub_rows, depth_only=False,
        winner=winner, cols=cols,
        stop_ref=stop_ref if early_out else None, z_row=z_row,
        eo_stride=eo_stride, y_row=y_row,
    )

    # ---- phase 2: winner-record fetch
    acc_ref[...] = jnp.zeros_like(acc_ref)
    w = tid_ref[:, :]  # stable after phase 1
    wf = w.astype(jnp.float32)
    wsl = jnp.floor(wf * (1.0 / 128.0))  # winner slice ids (exact f32 ints)

    def shrink(lo, hi):
        """Clamp a pair range to the slices that actually won pixels."""
        inr = (w >= lo) & (w < hi)
        smin = jnp.min(jnp.where(inr, wsl, 3.0e7))
        smax = jnp.max(jnp.where(inr, wsl, -1.0))
        lo2 = jnp.maximum(lo, (smin * 128.0).astype(jnp.int32))
        hi2 = jnp.minimum(hi, ((smax + 1.0) * 128.0).astype(jnp.int32))
        return lo2, hi2

    ranges2 = [shrink(lo, hi) for lo, hi in dense] + [
        shrink(sstarts_ref[st], sends_ref[st]),
        shrink(gbounds_ref[0], gbounds_ref[1]),
    ]

    corner_w = 11 if need_uv else 9
    base_r = 12 + (1 if has_combo else 0)
    fetch_rows = tuple(range(0, 9)) \
        + ((12,) if has_combo else ()) \
        + tuple(range(base_r, base_r + 3 * corner_w))

    def attr_body(slot, c_base, lo, hi, ridx, carry):
        rel = w - c_base
        hit = (w >= lo) & (w < hi) & (rel >= 0) & (rel < 128)
        relc = jnp.clip(rel, 0, 127)

        # Winner-existence guard: most walked slices contain no winner
        # (a tile's visible surfaces span few slices, but the shrink
        # window must cover them all — near grass AND the far terrain
        # seen between blades land at opposite ends of the range). The
        # gather block is the cost; skip it when this slice won nothing.
        # Winners of a slice also concentrate in few PIXEL ROWS (z/y
        # sorted bins bucket pairs by sub-block), so the fetch is gated
        # per 8-row group: each group's ~40 gathers run only when the
        # group holds a winner from this slice — the gather work tracks
        # hit groups instead of visits x tile_h (round-5).
        @pl.when(jnp.any(hit))
        def _fetch():
            gate_h = 8 if FETCH_GATE else tile_h
            for g0 in range(0, tile_h, gate_h):
                hit_g = hit[g0:g0 + gate_h]

                def _group(g0=g0, hit_g=hit_g):
                    relg = relc[g0:g0 + gate_h]
                    for c in fetch_rows:
                        # The 2-D broadcast is required: Mosaic's
                        # take_along_axis lowering rejects shape-(1,128)
                        # operands with taller indices ("Only 2D gather
                        # is supported" — probed round 4).
                        row = jnp.broadcast_to(
                            scratch_ref[slot, c : c + 1, :],
                            (gate_h, 128)
                        )
                        g = jnp.take_along_axis(row, relg, axis=1)
                        acc_ref[c, pl.ds(g0, gate_h)] = jnp.where(
                            hit_g, g, acc_ref[c, pl.ds(g0, gate_h)])

                if FETCH_GATE:
                    pl.when(jnp.any(hit_g))(_group)
                else:
                    _group()
        return carry

    walk(ranges2, attr_body)

    # ---- interpolation + analytic derivatives (plane layout, full
    # 128-px block width — winner-based, column-agnostic). Pixel coords
    # follow the PACKED block layout (pack_block_layout; identity when
    # tile_w == 128): row_p = jc*n_sub*pr + sb*pr + p//128, lane = p%128
    # with p the linear pixel of sub-block (jc, sb).
    n_sub = tile_h // sub_rows
    pr = (sub_rows * tile_w) // 128
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 128), 1)
    jc_i = rowi // (n_sub * pr)
    rem = rowi - jc_i * (n_sub * pr)
    sb_i = rem // pr
    p_lin = (rem - sb_i * pr) * 128 + lane
    xi = jc_i * tile_w + jnp.mod(p_lin, tile_w)
    yi = sb_i * sub_rows + p_lin // tile_w
    px = (base_x + xi).astype(jnp.float32) + 0.5
    py = (base_y + yi).astype(jnp.float32) + 0.5

    def A(c):
        return acc_ref[c]

    e0 = A(0) * px + A(1) * py + A(2)
    e1 = A(3) * px + A(4) * py + A(5)
    e2 = A(6) * px + A(7) * py + A(8)
    covered = w >= 0
    esum = e0 + e1 + e2
    inv = 1.0 / jnp.where(jnp.abs(esum) > 1e-20, esum, 1.0)
    inv = jnp.where(covered, inv, 0.0)
    b0 = e0 * inv
    b1 = e1 * inv
    b2 = e2 * inv

    # Corner offsets within the (possibly uv-elided) corner payload.
    off_uv = 0  # only valid when need_uv
    off_col = 2 if need_uv else 0
    off_pos = off_col + 3
    off_nrm = off_pos + 3

    def interp(off, w0, w1, w2):
        return (w0 * A(base_r + off) + w1 * A(base_r + corner_w + off)
                + w2 * A(base_r + 2 * corner_w + off))

    zero = jnp.zeros((tile_h, 128), jnp.float32)
    # Plane 0 packs coverage (+1.0) with the min barycentric weight
    # (edge distance for the wireframe debug mode); b's are zero for
    # uncovered pixels, so the covered test stays plane > 0.5.
    bmin = jnp.minimum(jnp.minimum(b0, b1), b2)
    attr_ref[0] = covered.astype(jnp.float32) * (1.0 + bmin)
    attr_ref[1] = A(12) if has_combo else (zero + combo_const)
    if need_uv:
        sax = A(0) + A(3) + A(6)
        say = A(1) + A(4) + A(7)
        d0x = (A(0) - b0 * sax) * inv
        d1x = (A(3) - b1 * sax) * inv
        d2x = (A(6) - b2 * sax) * inv
        d0y = (A(1) - b0 * say) * inv
        d1y = (A(4) - b1 * say) * inv
        d2y = (A(7) - b2 * say) * inv
        duvdx0 = interp(off_uv + 0, d0x, d1x, d2x)
        duvdx1 = interp(off_uv + 1, d0x, d1x, d2x)
        duvdy0 = interp(off_uv + 0, d0y, d1y, d2y)
        duvdy1 = interp(off_uv + 1, d0y, d1y, d2y)
        ts = float(texture_size)
        foot = jnp.maximum(
            duvdx0 * duvdx0 + duvdx1 * duvdx1,
            duvdy0 * duvdy0 + duvdy1 * duvdy1,
        )
        lod = jnp.maximum(
            0.5 * jnp.log2(jnp.maximum(foot * (ts * ts), 1e-12)), 0.0
        )
        attr_ref[2] = interp(off_uv + 0, b0, b1, b2)
        attr_ref[3] = interp(off_uv + 1, b0, b1, b2)
        attr_ref[4] = lod
        attr_ref[14] = duvdx0
        attr_ref[15] = duvdx1
        attr_ref[16] = duvdy0
        attr_ref[17] = duvdy1
        for c in range(3):  # dpos/dx, dpos/dy
            attr_ref[18 + c] = interp(off_pos + c, d0x, d1x, d2x)
            attr_ref[21 + c] = interp(off_pos + c, d0y, d1y, d2y)
    else:
        # No varying textures + flat default normal map: uv/lod/duv/
        # dpos are consumed by nothing downstream (the TBN collapses to
        # normalize(frag_normal) — gbuffer._finish_attributes takes the
        # flat_normal shortcut); write the planes as zeros.
        for c in (2, 3, 4, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23):
            attr_ref[c] = zero
    for c in range(3):  # vertex color
        attr_ref[5 + c] = interp(off_col + c, b0, b1, b2)
    for c in range(3):  # world pos
        attr_ref[8 + c] = interp(off_pos + c, b0, b1, b2)
    for c in range(3):  # world normal
        attr_ref[11 + c] = interp(off_nrm + c, b0, b1, b2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile_h", "tile_w", "sub_rows",
        "texture_size", "interpret", "winner",
        "early_out", "z_row", "eo_stride", "y_row",
        "need_uv", "has_combo", "combo_const",
    ),
)
def rasterize_pairs_fused(
    pairs: PairedTriangles,
    height: int,
    width: int,
    init_depth: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    sub_rows: int = 8,
    texture_size: int = 256,
    y0_tiles=0,
    interpret: bool = False,
    winner: str = "accwide",
    early_out: bool = False,
    z_row: int = -1,
    eo_stride: int = 4,
    y_row: int = -1,
    need_uv: bool = True,
    has_combo: bool = True,
    combo_const: float = 0.0,
):
    """Rasterize + interpolate in one kernel.

    ``pairs`` must be built with ``extra`` = (T, fused_extra_width(
    need_uv, has_combo)) fused payload. Returns (depth, tid, attrs)
    with tid = ORIGINAL triangle ids and attrs = (ATTR_CH, height,
    width) float32 planes (layout above; uv/lod/duv/dpos planes are
    zeros when ``need_uv`` is off — see _pair_fused_kernel).
    """
    assert 128 % tile_w == 0, \
        "fused kernel tile_w must divide 128 (lane-gather source vreg)"
    assert tile_h % 8 == 0, tile_h  # phase-2 fetch gating granularity
    cols = 128 // tile_w  # column sub-tiles per 128-px Pallas block
    n_tx = width // tile_w
    n_ty = height // tile_h
    n_tiles = n_ty * n_tx
    n_txb = n_tx // cols
    n_blocks = n_ty * n_txb
    assert pairs.starts.shape == (n_tiles,)
    rec_rows = pairs.records.shape[1]
    assert rec_rows >= 12 + fused_extra_width(need_uv, has_combo), (
        rec_rows, need_uv, has_combo)
    sub_rows = min(sub_rows, tile_h)
    if cols > 1:
        assert winner == "accwide", \
            "narrow tiles require winner='accwide'"

    if init_depth is None:
        init_depth = jnp.ones((height, width), jnp.float32)
    else:
        init_depth = pack_block_layout(init_depth, tile_h, tile_w,
                                       sub_rows)

    # Early-out is UNSOUND combined with y-bucketed bins: with ysort the
    # within-bin key is (y-bucket << zbits) | zq, so zq is NOT monotone
    # across a bin's slices — a later y-bucket's slice can hold pairs
    # nearer than the current slice's max z-bucket, and stopping on
    # (eff_max < zb) would skip them (wrong winners). Force it off when
    # the sub-block window skip is active (ADVICE r4 #2).
    do_eo = (early_out and z_row >= 0 and winner == "accwide"
             and y_row < 0)
    kernel = functools.partial(
        _pair_fused_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        n_tx=n_tx,
        sub_rows=sub_rows,
        texture_size=texture_size,
        winner=winner,
        cols=cols,
        early_out=do_eo,
        z_row=z_row,
        eo_stride=eo_stride,
        y_row=y_row if winner == "accwide" else -1,
        need_uv=need_uv,
        has_combo=has_combo,
        combo_const=combo_const,
    )

    def tile_index(t, *prefetch):
        return (t // n_txb, t % n_txb)

    def attr_index(t, *prefetch):
        return (0, t // n_txb, t % n_txb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tile_h, 128), tile_index),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, 128), tile_index),
            pl.BlockSpec((tile_h, 128), tile_index),
            pl.BlockSpec((ATTR_CH, tile_h, 128), attr_index),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS * _walk_step(pairs.records.shape[0]),
                        rec_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
            pltpu.VMEM((rec_rows, tile_h, 128), jnp.float32),
            pltpu.VMEM(_acc_shape(tile_h, tile_w, sub_rows, winner, cols),
                       jnp.float32),
            pltpu.VMEM(_acc_shape(tile_h, tile_w, sub_rows, winner, cols),
                       jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((ATTR_CH, height, width), jnp.float32),
    )
    y0_arr = jnp.asarray(y0_tiles, jnp.int32).reshape(1)
    depth, tid_pair, attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(y0_arr, pairs.starts, pairs.ends, pairs.sstarts, pairs.sends,
      pairs.gbounds, pairs.records, init_depth)
    depth = unpack_block_layout(depth, tile_h, tile_w, sub_rows)
    tid_pair = unpack_block_layout(tid_pair, tile_h, tile_w, sub_rows)
    attrs = unpack_block_layout(attrs, tile_h, tile_w, sub_rows)
    tid = jnp.where(
        tid_pair >= 0, pairs.pair_tri[jnp.maximum(tid_pair, 0)], -1
    )
    return depth, tid, attrs

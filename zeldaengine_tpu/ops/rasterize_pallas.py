"""Pallas TPU tiled rasterizer — the performance path.

Replaces the jnp chunked rasterizer (ops/rasterize.py) for the hot passes.
Same math (homogeneous edge functions from ``triangle_setup``), different
schedule — a **tile-walker**:

- The screen is cut into (tile_h, tile_w) tiles; triangles are grouped into
  lane-sized chunks (pre-sorted spatially at scene build so chunks are
  compact).
- **Binning** happens in XLA before the kernel: per-(tile, chunk) bbox
  overlap (a per-chunk OY^T @ OX matmul — no giant boolean tensors) is
  compacted into a per-tile list of active chunk ids plus a count. The
  list lives in HBM; each tile DMAs its own row into SMEM (so the list is
  never SMEM-budget-bound and chunks stay at the tight 128-lane size).
- The kernel grid is just ``(n_tiles,)``: each tile walks ONLY its own
  active chunks with a dynamic ``fori_loop``, double-buffering the chunk
  records HBM→VMEM with ``make_async_copy`` so DMA overlaps the edge
  math. Inactive (tile, chunk) pairs cost *nothing*, and the per-visit
  body is straight-line vector code: no lax.cond, no inner slice loop —
  scalar branches stall the VPU pipeline for longer than the work they
  skip at this chunk size (measured: 13 conds/visit made each visit
  ~24 us; straight-line is ~4 us).
- Inside a chunk, pixels ride the sublane axis and triangles the lane
  axis: ``e = px_col * c_row + ...`` — pure broadcast FMAs, no
  transposes. The depth winner per pixel uses a single min-reduction
  over a packed key (depth mantissa's low 7 bits replaced by the lane
  index), not separate min+argmin trees; the depth this quantizes away
  is < 128 ULP (~1e-5 relative), below the rasterizer's tolerance.

Depth is a single linear form per triangle (z/w is screen-linear):
``zrow = sum_i zc_i * edge_i`` folded at setup time.
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


class ChunkedTriangles(NamedTuple):
    records: jnp.ndarray  # (n_chunks, 16, K) float32 coefficient rows
    chunk_ids: jnp.ndarray  # (n_tiles, n_chunks) int32 active ids, compacted
    counts: jnp.ndarray  # (n_tiles,) int32 number of active chunks
    n_tris: int


def build_chunks(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    y0_tiles=0,
) -> ChunkedTriangles:
    """Pack a TriangleSetup into chunked records + compacted binning lists.

    ``y0_tiles`` (traced ok) offsets the tile rows for row-band rendering:
    the band covers global tile rows [y0_tiles, y0_tiles + height/tile_h).
    """
    edge = setup.edge
    t = edge.shape[0]
    pad = (-t) % chunk
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)

    # Depth as one linear form: zrow_j = sum_i zc_i * edge[i, j]
    zrow = jnp.einsum("ti,tij->tj", setup.zc, edge,
                      precision=jax.lax.Precision.HIGHEST)

    # Invalid triangles: replace with a never-hit record (e2 const = -1).
    never = jnp.zeros((16,), jnp.float32).at[2].set(-1.0).at[5].set(-1.0) \
        .at[8].set(-1.0)
    # Rows 12-15 carry the pixel-space bbox (x0, y0, x1, y1) — consumed by
    # the binning below and by downstream passes that reuse the records.
    rec = jnp.concatenate(
        [
            edge.reshape(t, 9),
            zrow,
            jnp.where(setup.valid[:, None], setup.bbox, 0.0),
        ],
        axis=1,
    )  # (T, 16)
    rec = jnp.where(setup.valid[:, None], rec, never[None, :])
    rec = jnp.pad(rec, ((0, pad), (0, 0)),
                  constant_values=0.0)
    if pad:
        rec = rec.at[t:, 2].set(-1.0)
    n_chunks = rec.shape[0] // chunk
    records = rec.reshape(n_chunks, chunk, 16).transpose(0, 2, 1)

    # Binning: bbox -> tile overlap bits.
    bbox = jnp.pad(setup.bbox, ((0, pad), (0, 0)))
    tx0 = jnp.floor(bbox[:, 0] / tile_w)
    ty0 = jnp.floor(bbox[:, 1] / tile_h)
    tx1 = jnp.ceil(bbox[:, 2] / tile_w) - 1.0
    ty1 = jnp.ceil(bbox[:, 3] / tile_h) - 1.0
    xs = jnp.arange(n_tx, dtype=jnp.float32)
    ys = jnp.arange(n_ty, dtype=jnp.float32) + jnp.asarray(
        y0_tiles, jnp.float32
    )
    ox = ((xs[None, :] >= tx0[:, None]) & (xs[None, :] <= tx1[:, None]))
    oy = ((ys[None, :] >= ty0[:, None]) & (ys[None, :] <= ty1[:, None]))
    ox = ox.astype(jnp.float32).reshape(n_chunks, chunk, n_tx)
    oy = oy.astype(jnp.float32).reshape(n_chunks, chunk, n_ty)
    # count[c, ty, tx] = sum_k oy * ox  -> active iff > 0
    counts3 = jnp.einsum("cky,ckx->cyx", oy, ox,
                         precision=jax.lax.Precision.DEFAULT)
    active = (counts3 > 0.5).transpose(1, 2, 0).reshape(n_ty * n_tx, n_chunks)

    # Compact each tile's active chunk ids to the front (ascending order,
    # O(n) cumsum + scatter — no sort). Unwritten slots keep 0 and are
    # never read (the kernel walks exactly ``counts`` entries).
    pos = jnp.cumsum(active.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(active, pos, n_chunks)  # out-of-bounds -> dropped
    rows = jnp.broadcast_to(
        jnp.arange(active.shape[0], dtype=jnp.int32)[:, None], pos.shape
    )
    ids = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None, :], pos.shape
    )
    # 3-D (n_tiles, 1, n_chunks_pad): the kernel dynamically indexes tiles
    # on the untiled leading dim (Mosaic cannot slice a tiled sublane dim)
    # and DMAs whole lane-aligned rows (128-multiple).
    chunk_ids = jnp.zeros(active.shape, jnp.int32).at[rows, pos].set(
        ids, mode="drop"
    )
    lane_pad = (-n_chunks) % 128
    chunk_ids = jnp.pad(chunk_ids, ((0, 0), (0, lane_pad)))[:, None, :]
    counts = jnp.sum(active, axis=1).astype(jnp.int32)

    return ChunkedTriangles(
        records=records,
        chunk_ids=chunk_ids,
        counts=counts,
        n_tris=t,
    )


def _vis_kernel(
    y0_ref,
    counts_ref,
    ids_hbm,
    records_hbm,
    init_ref,
    depth_ref,
    tid_ref,
    ids_ref,
    scratch_ref,
    sem_ref,
    row_sem_ref,
    *,
    chunk: int,
    tile_h: int,
    tile_w: int,
    n_tx: int,
    sub_rows: int,
    depth_only: bool,
):
    t = pl.program_id(0)

    depth_ref[:, :] = init_ref[:, :]
    if not depth_only:
        tid_ref[:, :] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    n = counts_ref[t]

    # This tile's compacted chunk-id row: HBM -> SMEM.
    row_dma = pltpu.make_async_copy(ids_hbm.at[t], ids_ref, row_sem_ref)
    row_dma.start()
    row_dma.wait()

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            records_hbm.at[ids_ref[0, j]],
            scratch_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(n > 0)
    def _warmup():
        get_dma(0, 0).start()

    ty = t // n_tx
    tx = t % n_tx
    base_x = (tx * tile_w).astype(jnp.int32)
    # Global pixel rows: the records' edge forms live in full-viewport
    # pixel space, so a row band at y0 evaluates them at offset rows.
    base_y = ((ty + y0_ref[0]) * tile_h).astype(jnp.int32)

    n_sub = tile_h // sub_rows
    p_sub = sub_rows * tile_w
    # Packed f32 winner key: depth quantized to 2^16 levels in the high
    # bits, lane index in the low bits — both exact integers < 2^24, so
    # f32 arithmetic and the f32 min-reduce (the VPU's fast path; int32
    # reduces are dramatically slower on TPU) are exact. Depth comes back
    # quantized by 2^-16 (~1.5e-5), below the rasterizer's tolerance.
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (1, chunk), 1
    ).astype(jnp.float32)
    lane_scale = float(1 << (chunk - 1).bit_length())
    depth_scale = 65536.0

    def chunk_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _prefetch():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        c_base = ids_ref[0, j] * chunk

        for sb in range(n_sub):
            # Pixel coords: sublane axis = flat (sub_rows, tile_w).
            lin = jax.lax.broadcasted_iota(jnp.int32, (p_sub, 1), 0)
            px = (base_x + jnp.mod(lin, tile_w)).astype(jnp.float32) + 0.5
            py = (
                base_y + sb * sub_rows + lin // tile_w
            ).astype(jnp.float32) + 0.5

            def form(r):
                return (
                    px * scratch_ref[slot, r : r + 1, :]
                    + py * scratch_ref[slot, r + 1 : r + 2, :]
                    + scratch_ref[slot, r + 2 : r + 3, :]
                )  # (p_sub, chunk)

            e0 = form(0)
            e1 = form(3)
            e2 = form(6)
            d = form(9)
            esum = e0 + e1 + e2
            inside = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (esum > 0.0) & (d >= 0.0) & (d <= 1.0)
            )
            if depth_only:
                cand = jnp.where(inside, d, NO_HIT)
                kb_best = jnp.min(cand, axis=1)  # (p_sub,)
                cur = depth_ref[
                    pl.ds(sb * sub_rows, sub_rows), :
                ].reshape(p_sub)
                depth_ref[pl.ds(sb * sub_rows, sub_rows), :] = (
                    jnp.minimum(kb_best, cur).reshape(sub_rows, tile_w)
                )
            else:
                # ONE f32 min over lanes yields both the quantized depth
                # and its lane.
                dq = jnp.floor(d * depth_scale)
                key = jnp.where(
                    inside, dq * lane_scale + lane_f, NO_HIT
                )
                kmin = jnp.min(key, axis=1)  # (p_sub,)
                kq = jnp.floor(kmin * (1.0 / lane_scale))
                kb_best = jnp.where(
                    kmin < NO_HIT, kq * (1.0 / depth_scale), NO_HIT
                )
                kb_id = c_base + (
                    kmin - kq * lane_scale
                ).astype(jnp.int32)
                cur = depth_ref[
                    pl.ds(sb * sub_rows, sub_rows), :
                ].reshape(p_sub)
                take = kb_best < cur
                depth_ref[pl.ds(sb * sub_rows, sub_rows), :] = jnp.where(
                    take, kb_best, cur
                ).reshape(sub_rows, tile_w)
                cur_t = tid_ref[
                    pl.ds(sb * sub_rows, sub_rows), :
                ].reshape(p_sub)
                tid_ref[pl.ds(sb * sub_rows, sub_rows), :] = jnp.where(
                    take, kb_id, cur_t
                ).reshape(sub_rows, tile_w)
        return 0

    jax.lax.fori_loop(0, n, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile_h", "tile_w", "chunk", "sub_rows",
        "depth_only", "interpret",
    ),
)
def rasterize_pallas(
    chunks: ChunkedTriangles,
    height: int,
    width: int,
    init_depth: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 128,
    sub_rows: int = 16,
    depth_only: bool = False,
    y0_tiles=0,
    interpret: bool = False,
):
    """Rasterize chunked triangles to (depth, tri_id) visibility buffers.
    ``interpret`` runs the kernel in Pallas interpret mode (CPU testing).

    height/width must be multiples of tile_h/tile_w (pad the target).
    Returns (depth (H, W) f32 with clear=1.0, tid (H, W) i32 with -1) or
    just depth when ``depth_only``. Callers pass the SAME ``y0_tiles`` to
    build_chunks (which offsets the binning) and here (which offsets the
    kernel's pixel rows into full-viewport space).
    """
    n_tx = width // tile_w
    n_ty = height // tile_h
    n_tiles = n_ty * n_tx
    n_chunks = chunks.records.shape[0]
    n_chunks_pad = n_chunks + (-n_chunks) % 128
    assert chunks.chunk_ids.shape == (n_tiles, 1, n_chunks_pad), (
        chunks.chunk_ids.shape, (n_tiles, 1, n_chunks_pad))
    sub_rows = min(sub_rows, tile_h)

    if init_depth is None:
        init_depth = jnp.ones((height, width), jnp.float32)

    kernel = functools.partial(
        _vis_kernel,
        chunk=chunk,
        tile_h=tile_h,
        tile_w=tile_w,
        n_tx=n_tx,
        sub_rows=sub_rows,
        depth_only=depth_only,
    )

    def tile_index(t, y0, counts):
        return (t // n_tx, t % n_tx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            # Explicit HBM: ANY lets Mosaic stage these in VMEM, where
            # dynamic row slicing of a tiled memref is unsupported (and
            # staging defeats the per-tile DMA scheme anyway).
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tile_h, tile_w), tile_index),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), tile_index),
            pl.BlockSpec((tile_h, tile_w), tile_index),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, n_chunks_pad), jnp.int32),
            pltpu.VMEM((2, 16, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.int32),
    )
    y0_arr = jnp.asarray(y0_tiles, jnp.int32).reshape(1)
    depth, tid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(y0_arr, chunks.counts, chunks.chunk_ids, chunks.records, init_depth)
    if depth_only:
        return depth
    return depth, tid

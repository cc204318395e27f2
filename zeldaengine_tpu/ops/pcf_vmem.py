"""VMEM-resident PCF: the 25-tap shadow filter as a Pallas TPU kernel.

Reference semantics: ComputePCF, Common.glsl:323-342 via the exact
row-table port in ``ops/shadow.py`` (compute_pcf / compute_pcf_packed).
This kernel produces BITWISE-identical totals on every in-range pixel
whose screen block fits a small shadow-map window (see fallback below).

Why a kernel: XLA lowers the per-pixel shadow gathers to an HLO gather
that costs ~4.3 ns per index on this chip regardless of locality — the
5 row-gathers of the packed path are ~44 ms of the 1080p frame
(BASELINE.md round-3 ledger; half-res and batched-index variants barely
move it). Mosaic, by contrast, exposes two *vectorized* dynamic-select
primitives at (8, 128) f32 tiles:

  * lane gather      take_along_axis(t, i, axis=1)  — 128-way/elem
  * sublane gather   take_along_axis(t, i, axis=0)  — 8-way/elem

measured at ~4-6 cycles per 1024-element op (tools/pallas_gather_probe
.py) — three orders of magnitude more index throughput than HLO gather.
With the whole 1024x1024 f32 shadowmap resident in VMEM (4 MB of ~16),
each (8, 128)-pixel screen block:

  1. computes its taps' shadow-space bounding window (tap rows/cols are
     floor(f +- radius*scale) of per-pixel row/col coordinates),
  2. reads 3x2 aligned (8, 128) slabs around the window straight from
     the VMEM-resident map and rotates them flush to the window origin
     (pltpu.roll with dynamic shift),
  3. walks the <=16 window rows once: one sublane broadcast + one lane
     gather per tap column per row, accumulating each tap's exact map
     value via one-hot masked FMA (exactly one row matches per tap),
  4. sums where(tap < z_cmp, 0.1, 1.0) in the reference tap order.

Blocks whose footprint exceeds the (16, 128) window — wrap-addressed
pixels, grazing angles, depth discontinuities — are flagged and
recomputed OUTSIDE the kernel by the reference ``compute_pcf`` on just
those blocks (a lax.cond so fit-everything frames pay nothing), keeping
the result exact everywhere at any geometry.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeldaengine_tpu.ops.shadow import SHADOW_IN_FACTOR, compute_pcf

_BLK_H = 8
_BLK_W = 128
_WIN_COLS = 128         # lane-gather width; 2 aligned tiles cover it


def _taps(radius: int, scale: float):
    return [(oy, ox) for oy in range(-radius, radius + 1)
            for ox in range(-radius, radius + 1)]


def _pcf_kernel(sm_ref, fy_ref, fx_ref, zc_ref, act_ref, tot_ref, fit_ref,
                xg_ref,
                *, radius: int, scale: float, dim: int, win_rows: int):
    # Aligned slabs covering any window start. Mosaic quirk (probed on
    # v5e): pltpu.roll with a DYNAMIC shift wraps modulo the next
    # power-of-2 tile count, so a 3- or 5-tile slab stack rolls wrong —
    # the slab count must be a power of two, and shifts kept positive.
    slab_rows = 16 if win_rows <= 8 else (32 if win_rows <= 24 else 64)
    assert win_rows <= slab_rows - 8, (win_rows, slab_rows)
    fy = fy_ref[...]
    fx = fx_ref[...]
    zc = zc_ref[...]
    act = act_ref[...] > 0.0

    # Tap bounding window over active pixels. Tap coords are
    # floor(f + scale*o), o in [-radius, radius], so the per-pixel
    # extremes are floor(f - radius*scale) / floor(f + radius*scale).
    off = radius * scale
    ylo = jnp.floor(fy - off)
    yhi = jnp.floor(fy + off)
    xlo = jnp.floor(fx - off)
    xhi = jnp.floor(fx + off)
    big = jnp.float32(2.0 * dim)
    ymin = jnp.min(jnp.where(act, ylo, big))
    ymax = jnp.max(jnp.where(act, yhi, -big))
    xmin = jnp.min(jnp.where(act, xlo, big))
    xmax = jnp.max(jnp.where(act, xhi, -big))

    fit = ((ymax - ymin < win_rows) & (xmax - xmin < _WIN_COLS)
           & (ymin >= 0) & (ymax < dim) & (xmin >= 0) & (xmax < dim))
    fit_ref[pl.program_id(0), pl.program_id(1)] = fit.astype(jnp.int32)

    row0 = jnp.clip(ymin.astype(jnp.int32), 0, dim - win_rows)
    col0 = jnp.clip(xmin.astype(jnp.int32), 0, dim - _WIN_COLS)
    row0a = pl.multiple_of(
        jnp.minimum((row0 // 8) * 8, dim - slab_rows), 8)
    col0a = pl.multiple_of(
        jnp.minimum((col0 // 128) * 128, dim - 2 * _WIN_COLS), 128)

    # (win_rows+8)x2 aligned slabs, rotated flush to (row0, col0).
    # After the rolls, window[r, c] == sm[row0 + r, col0 + c] for all
    # r < win_rows, c < 128 (the fit guarantee keeps every tap inside).
    slabs = [
        jnp.concatenate(
            [sm_ref[pl.ds(row0a + 8 * k, 8), pl.ds(col0a, 128)],
             sm_ref[pl.ds(row0a + 8 * k, 8),
                    pl.ds(col0a + 128, 128)]], axis=1)
        for k in range(slab_rows // 8)
    ]
    sl0 = jnp.concatenate(slabs, axis=0)                   # (slab_rows, 256)

    # Local tap coords (garbage on inactive pixels; masked to stay in
    # gather range — their outputs are never read).
    iyl = [jnp.floor(fy + scale * oy).astype(jnp.int32) - row0
           for oy in range(-radius, radius + 1)]
    ixl = [jnp.bitwise_and(
        jnp.floor(fx + scale * ox).astype(jnp.int32) - col0, _WIN_COLS - 1)
        for ox in range(-radius, radius + 1)]

    # Uniform-block fast path (round 5, exact): every tap compares a
    # window texel against the pixel's zc. If the SLAB's max depth is
    # below every active pixel's zc, all 25 taps of every pixel are
    # occluded (total = the same f32 accumulation of 0.1 the loop
    # produces); if the slab's min is >= every zc, all taps are lit
    # (total = 25.0). The slab is a superset of the tap window, so both
    # tests are conservative; most blocks of a real frame are uniformly
    # lit (no caster above) or deep in shadow — only penumbra/mixed
    # blocks walk the rows. Constants replicate the loop's f32
    # rounding: sum_{25} 0.1 accumulated in float32.
    n = 2 * radius + 1
    c_occ = np.float32(0.0)
    for _ in range(n * n):
        c_occ = np.float32(c_occ + np.float32(SHADOW_IN_FACTOR))
    big_z = jnp.float32(3.0e38)
    zc_min = jnp.min(jnp.where(act, zc, big_z))
    zc_max = jnp.max(jnp.where(act, zc, -big_z))
    # Roll-invariant: the rolls only rotate the slab, so min/max run on
    # the unrolled stack and the rolls ride the slow path only.
    sl_min = jnp.min(sl0)
    sl_max = jnp.max(sl0)
    all_occ = sl_max < zc_min
    all_lit = sl_min >= zc_max

    @pl.when(all_occ)
    def _fast_occ():
        tot_ref[...] = jnp.full((_BLK_H, _BLK_W), c_occ, jnp.float32)

    @pl.when(all_lit & ~all_occ)
    def _fast_lit():
        tot_ref[...] = jnp.full((_BLK_H, _BLK_W), float(n * n),
                                jnp.float32)

    @pl.when(~all_occ & ~all_lit)
    def _slow():
        # One-hot masked-FMA walk over the window rows (the exact
        # original): x-gathers must run at CONSTANT rows — a per-pixel
        # row gather composed with a per-pixel column gather evaluates
        # the row index at the wrong column, and Mosaic has no 2-D
        # per-pixel gather. Row batches above the block's top-most tap
        # row are skipped (active pixels never match them; the per-tap
        # accumulators live in VMEM scratch so they persist across the
        # gated batches).
        sl = pltpu.roll(sl0, 256 + col0a - col0, 1)[:, :_WIN_COLS]
        sl = pltpu.roll(sl, slab_rows + row0a - row0, 0)
        wins = [sl[8 * k:8 * (k + 1)] for k in range(win_rows // 8)]
        ymax_loc = ymax - row0.astype(jnp.float32)
        acc_ref = xg_ref  # (n*n, _BLK_H, _BLK_W) scratch
        for t in range(n * n):
            acc_ref[t] = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
        for k in range(win_rows // 8):
            @pl.when(jnp.float32(k * 8) <= ymax_loc)
            def _batch(k=k):
                for rr in range(8):
                    r = k * 8 + rr
                    src = wins[k]
                    rb = jnp.take_along_axis(
                        src, jnp.full((_BLK_H, _BLK_W), rr, jnp.int32),
                        axis=0)
                    gs = [jnp.take_along_axis(rb, ix, axis=1)
                          for ix in ixl]
                    for a in range(n):
                        m = (iyl[a] == r).astype(jnp.float32)
                        for b in range(n):
                            acc_ref[a * n + b] = (
                                acc_ref[a * n + b] + m * gs[b])

        total = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
        for t in range(n * n):  # reference tap order: oy-major, ox-minor
            total = total + jnp.where(acc_ref[t] < zc,
                                      SHADOW_IN_FACTOR, 1.0)
        tot_ref[...] = total


@functools.partial(
    jax.jit, static_argnames=("radius", "scale", "bias", "fallback_cap",
                              "win_rows", "interpret"))
def compute_pcf_vmem(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                     radius: int = 2, scale: float = 1.5, bias: float = 0.0,
                     active: Optional[jnp.ndarray] = None,
                     fallback_cap: int = 64, win_rows: int = 16,
                     interpret: bool = False):
    """ComputePCF with the tap loop in a VMEM-resident Pallas kernel.

    Bitwise-identical to ``compute_pcf`` everywhere (out-of-window
    blocks are recomputed by compute_pcf itself). ``active`` optionally
    restricts the window-fit test (NOT the output) to covered pixels;
    leave None for exactness on every in-range pixel.
    """
    dim_y, dim_x = shadowmap.shape
    assert dim_y == dim_x and dim_y % 128 == 0, (dim_y, dim_x)
    dim = dim_y
    h, w = shadow_coord.shape[:2]

    wc = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(wc) > 1e-20, wc, 1.0)
    z = sc[..., 2]
    in_range = (z > -1.0) & (z < 1.0) & (sc[..., 3] > 0.0)
    zc = z - bias
    fx = sc[..., 0] * dim
    fy = sc[..., 1] * dim
    act = in_range if active is None else (in_range & active)

    ph = -(-h // _BLK_H) * _BLK_H
    pw = -(-w // _BLK_W) * _BLK_W
    if (ph, pw) != (h, w):
        pad = ((0, ph - h), (0, pw - w))
        fy = jnp.pad(fy, pad)
        fx = jnp.pad(fx, pad)
        zc = jnp.pad(zc, pad)
        act = jnp.pad(act, pad)
    n_by, n_bx = ph // _BLK_H, pw // _BLK_W

    blk = pl.BlockSpec((_BLK_H, _BLK_W), lambda i, j: (i, j))
    total, fitmap = pl.pallas_call(
        functools.partial(_pcf_kernel, radius=radius, scale=scale, dim=dim,
                          win_rows=win_rows),
        grid=(n_by, n_bx),
        in_specs=[pl.BlockSpec((dim, dim), lambda i, j: (0, 0)),
                  blk, blk, blk, blk],
        out_specs=[blk, pl.BlockSpec((n_by, n_bx), lambda i, j: (0, 0),
                                     memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((n_by, n_bx), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM(((2 * radius + 1) ** 2, _BLK_H, _BLK_W),
                       jnp.float32),
        ],
        interpret=interpret,
    )(shadowmap, fy, fx, zc, act.astype(jnp.float32))

    count = float((2 * radius + 1) ** 2)
    n_unfit = jnp.sum(fitmap == 0)

    def make_fixup(cap):
        def fixup(total):
            # Recompute unfit blocks with the reference path. Bounded
            # at ``cap`` blocks; beyond that the worst blocks stay
            # kernel-computed (callers see the overflow count).
            sc_pad = shadow_coord
            if (ph, pw) != (h, w):
                sc_pad = jnp.pad(shadow_coord,
                                 ((0, ph - h), (0, pw - w), (0, 0)))
            nb = n_by * n_bx
            flat_unfit = (fitmap == 0).reshape(-1)
            idxs, = jnp.nonzero(flat_unfit, size=cap, fill_value=nb)
            ok = idxs < nb
            bi = jnp.where(ok, idxs // n_bx, 0)
            bj = jnp.where(ok, idxs % n_bx, 0)
            blocks = jax.vmap(lambda i, j: jax.lax.dynamic_slice(
                sc_pad, (i * _BLK_H, j * _BLK_W, 0),
                (_BLK_H, _BLK_W, 4)))(bi, bj)
            ref = compute_pcf(shadowmap, blocks, radius=radius,
                              scale=scale, bias=bias) * count
            # Apply all fixed blocks at once as a one-hot MXU matmul
            # (view the frame as (ph * n_bx, _BLK_W) rows; block (i, j)
            # row r lives at (i*_BLK_H + r)*n_bx + j). The previous
            # per-block fori_loop of dynamic_update_slice was ``cap``
            # serialized control-flow barriers — measured 12 ms of the
            # c4 frame with ~10 unfit blocks; a row scatter SIGABRTs
            # the TPU compiler at these shapes, so the update rides the
            # MXU instead: onehot (rows, cap*_BLK_H) @ ref — exact
            # selection (idxs are unique, so each output row has at
            # most ONE nonzero term; 1.0 is bf16-exact and HIGHEST
            # precision accumulates the f32 value exactly). Dead slots
            # point past the last row and match nothing.
            rr = ((bi[:, None] * _BLK_H
                   + jnp.arange(_BLK_H, dtype=jnp.int32)[None, :])
                  * n_bx + bj[:, None])
            rr = jnp.where(ok[:, None], rr, ph * n_bx).reshape(-1)
            n_rows = ph * n_bx
            rowid = jnp.arange(n_rows, dtype=jnp.int32)
            onehot = (rowid[:, None] == rr[None, :]).astype(jnp.float32)
            upd = jnp.dot(onehot, ref.reshape(cap * _BLK_H, _BLK_W),
                          precision=jax.lax.Precision.HIGHEST)
            hit = jnp.max(onehot, axis=1, keepdims=True) > 0.0
            rows = total.reshape(n_rows, _BLK_W)
            return jnp.where(hit, upd, rows).reshape(ph, pw)

        return fixup

    # Tiered by the actual unfit count: compute_pcf's HLO gathers cost
    # ~4.3 ns/index, so a flat cap-64 fixup would bill ~7 ms to a frame
    # with ONE grazing block. lax.switch executes only the needed tier
    # (tier 0 = no unfit blocks = free). fallback_cap=0 skips the
    # switch entirely (unfit blocks keep the kernel's clamped-window
    # value and are only COUNTED) — control-flow ops act as fusion
    # barriers on TPU even when the taken branch is empty (the cube
    # cond measured +13.6 ms, BASELINE.md round-3h).
    if fallback_cap > 0:
        tiers = [c for c in (4, 16, fallback_cap)
                 if c <= fallback_cap]
        if tiers[-1] != fallback_cap:
            tiers.append(fallback_cap)
        bounds = jnp.asarray([0] + tiers[:-1])
        tier = jnp.sum(n_unfit > bounds)
        total = jax.lax.switch(
            tier, [lambda t: t] + [make_fixup(c) for c in tiers], total)
    total = total[:h, :w]
    total = jnp.where(in_range[:h, :w], total, count)
    overflow = jnp.maximum(n_unfit - fallback_cap, 0)
    return total / count, overflow

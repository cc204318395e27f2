"""Pallas PCF kernel — shadow filtering without per-pixel gathers.

The XLA path (ops/shadow.py) costs 25 random gathers per pixel (~25 ns per
gather index on TPU = the single largest frame cost). This kernel removes
the gathers entirely:

- the whole shadow map lives VMEM-resident across the kernel grid,
- each screen tile dynamically slices a (WIN, WIN) shadow-space window
  around the tile's mean shadow coordinate (per-tile origins are scalar-
  prefetched),
- tap *rows* are fetched with one-hot row-selection matmuls on the MXU
  (5 row matmuls serve all 25 taps), tap *columns* with one-hot lane dots
  on the VPU.

Exactness: identical to ComputePCF for every tap that lands inside the
tile's window. Tiles whose shadow footprint exceeds WIN texels (extreme
depth discontinuities at grazing light angles) clamp those taps to the
window edge — a bounded approximation, disabled by setting
``EngineConfig.pcf_backend = "exact"``. When WIN >= shadowmap_dim the
kernel is exact everywhere (window = whole map).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeldaengine_tpu.ops.shadow import SHADOW_IN_FACTOR


def _pcf_kernel(
    origins_ref,  # scalar prefetch: (n_tiles, 2) int32 (wy, wx)
    fx_ref,  # (tile_h, tile_w) shadow-space x texel coord (float)
    fy_ref,
    zcmp_ref,  # z - bias, already divided by w
    inrange_ref,  # 1.0 where the GLSL z/w guards pass
    out_ref,  # (tile_h, tile_w) shadow factor
    *,
    radius: int,
    scale: float,
    tile_h: int,
    tile_w: int,
    win: int,
    sub_rows: int,
    sm_ref=None,
):
    t = pl.program_id(0)
    wy = pl.multiple_of(origins_ref[t, 0], 8)
    wx = pl.multiple_of(origins_ref[t, 1], 128)
    window = sm_ref[pl.ds(wy, win), pl.ds(wx, win)]  # (win, win)
    # hi/lo bf16 split: two DEFAULT-precision MXU passes reconstruct the
    # f32 depths to ~2^-16 relative (the one-hot operand is exact in
    # bf16). Mosaic supports only DEFAULT/HIGHEST, and HIGHEST costs 6
    # passes for precision the depth compare doesn't need.
    win_hi = window.astype(jnp.bfloat16)
    win_lo = (window - win_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    tile_p = tile_h * tile_w
    n_sub = tile_p // (sub_rows * tile_w)
    p_sub = sub_rows * tile_w
    count = (2 * radius + 1) ** 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)

    def s_body(sb, _):
        rows = pl.ds(sb * p_sub, p_sub)
        fx = fx_ref[rows, :]  # (p_sub, 1) — inputs are tile-major columns
        fy = fy_ref[rows, :]
        zc = zcmp_ref[rows, :]
        ok = inrange_ref[rows, :]

        def j_body(jk, total):
            j = jk - radius
            ry = jnp.floor(fy + scale * j).astype(jnp.int32) - wy
            ry = jnp.clip(ry, 0, win - 1)
            onehot_r = (lane == ry).astype(jnp.bfloat16)  # (p_sub, win)

            def dot(b):
                return jax.lax.dot_general(
                    onehot_r,
                    b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            row_vals = dot(win_hi) + dot(win_lo)  # (p_sub, win)
            for i in range(-radius, radius + 1):
                cx = jnp.floor(fx + scale * i).astype(jnp.int32) - wx
                cx = jnp.clip(cx, 0, win - 1)
                sel = (lane == cx).astype(jnp.float32)
                dist = jnp.sum(row_vals * sel, axis=1, keepdims=True)
                occluded = (ok > 0.5) & (dist < zc)
                total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            return total

        total = jax.lax.fori_loop(
            0, 2 * radius + 1, j_body, jnp.zeros((p_sub, 1), jnp.float32)
        )
        out_ref[rows, :] = total / count
        return 0

    jax.lax.fori_loop(0, n_sub, s_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "scale", "tile_h", "tile_w", "win",
                     "sub_rows"),
)
def compute_pcf_pallas(
    shadowmap: jnp.ndarray,
    shadow_coord: jnp.ndarray,  # (H, W, 4) homogeneous
    radius: int = 2,
    scale: float = 1.5,
    bias: float = 0.0,
    tile_h: int = 32,
    tile_w: int = 128,
    win: int = 256,
    sub_rows: int = 8,
    valid: jnp.ndarray | None = None,
):
    """Windowed-one-hot PCF. H/W must be multiples of tile_h/tile_w
    (callers pad); the shadow map must be square with dim >= win."""
    height, width = shadow_coord.shape[:2]
    dim = shadowmap.shape[-1]
    win = min(win, dim)
    n_ty = height // tile_h
    n_tx = width // tile_w
    n_tiles = n_ty * n_tx

    w = shadow_coord[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    u = shadow_coord[..., 0] / safe_w
    v = shadow_coord[..., 1] / safe_w
    z = shadow_coord[..., 2] / safe_w
    w_post = w / safe_w  # sign-preserving post-divide w (== 1.0 normally)

    fx = u * dim
    fy = v * dim
    zcmp = z - bias
    inrange = ((z > -1.0) & (z < 1.0) & (w_post > 0.0)).astype(jnp.float32)

    # The GLSL sampler wraps (REPEAT): fold coords into [0, dim) so window
    # origins are meaningful; taps then stay within +-ceil(scale*radius).
    fx = jnp.mod(fx, float(dim))
    fy = jnp.mod(fy, float(dim))

    # Per-tile window origins around the mean tap coordinate of the
    # pixels that MATTER: uncovered pixels (sky/background) carry garbage
    # shadow coords that would drag the mean (and therefore the window)
    # away from the geometry — the main source of window-clamp error.
    pad_t = int(math.ceil(scale * radius))
    weight = inrange
    if valid is not None:
        weight = weight * valid.astype(jnp.float32)

    def tile_mean(a):
        num = (a * weight).reshape(n_ty, tile_h, n_tx, tile_w).sum(
            axis=(1, 3)
        )
        den = weight.reshape(n_ty, tile_h, n_tx, tile_w).sum(axis=(1, 3))
        fallback = a.reshape(n_ty, tile_h, n_tx, tile_w).mean(axis=(1, 3))
        return jnp.where(den > 0.5, num / jnp.maximum(den, 1.0), fallback)

    my = tile_mean(fy)
    mx = tile_mean(fx)
    # Dynamic VMEM slices need aligned starts: rows to 8 sublanes, cols to
    # 128 lanes. Pad the map so aligned origins exist for every position.
    pad_y = ((pad_t + 7) // 8) * 8
    pad_x = ((pad_t + 127) // 128) * 128
    py_dim = ((dim + pad_y + pad_t + 2 + 7) // 8) * 8
    px_dim = ((dim + pad_x + pad_t + 2 + 127) // 128) * 128
    wy = jnp.clip(jnp.round(my - win / 2).astype(jnp.int32) + pad_y,
                  0, py_dim - win)
    wx = jnp.clip(jnp.round(mx - win / 2).astype(jnp.int32) + pad_x,
                  0, px_dim - win)
    wy = (wy // 8) * 8
    wx = (wx // 128) * 128
    origins = jnp.stack([wy, wx], -1).reshape(n_tiles, 2)

    sm_padded = jnp.pad(
        shadowmap,
        ((pad_y, py_dim - dim - pad_y), (pad_x, px_dim - dim - pad_x)),
        mode="wrap",
    )
    # fx/fy are in unpadded texel space; the kernel subtracts the padded
    # origin, so shift coords into the padded index space.
    fx = fx + pad_x
    fy = fy + pad_y

    kernel = functools.partial(
        _pcf_kernel,
        radius=radius,
        scale=scale,
        tile_h=tile_h,
        tile_w=tile_w,
        win=win,
        sub_rows=sub_rows,
    )

    # Tile-major pixel columns: Mosaic cannot reshape (sub_rows, tile_w)
    # blocks to (p_sub, 1) in-kernel, so permute in XLA instead.
    tile_p = tile_h * tile_w

    def to_cols(a):
        return (
            a.reshape(n_ty, tile_h, n_tx, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles * tile_p, 1)
        )

    def tile_index(t, origins):
        return (t, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_p, 1), tile_index),
            pl.BlockSpec((tile_p, 1), tile_index),
            pl.BlockSpec((tile_p, 1), tile_index),
            pl.BlockSpec((tile_p, 1), tile_index),
            # padded shadow map: whole array VMEM-resident across the grid
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, 1), tile_index),
    )

    def kernel_wrap(origins_ref, fx_ref, fy_ref, zc_ref, ok_ref, sm_ref,
                    out_ref):
        kernel(origins_ref, fx_ref, fy_ref, zc_ref, ok_ref, out_ref,
               sm_ref=sm_ref)

    sm_bytes = int(np.prod(sm_padded.shape)) * 4
    out_cols = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_p, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=sm_bytes + 48 * 1024 * 1024,
        ),
    )(origins, to_cols(fx), to_cols(fy), to_cols(zcmp), to_cols(inrange),
      sm_padded)
    out = (
        out_cols.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
    return out


# ------------------------------------------------- roll-built window table


def _window_table_kernel(sm_ref, out_ref, scratch_ref, *, shifts, d_x,
                         rows_per_step):
    """out[(y*d_x + x), c] = sm[y, (x + shifts[c]) mod D].

    Per y row: the window channels are built as ROWS of an (8, D)
    scratch (8 circular lane rolls — pltpu.roll needs non-negative
    shifts, so -s rolls as D-s), then ONE in-kernel transpose emits the
    (D, 8) row-major slab. Mosaic's tpu.transpose is vreg-level
    shuffles; expressing this table build in XLA (shifted slices +
    stack + narrow transpose) measured ~29 ms/frame at 1024^2."""
    for k in range(rows_per_step):
        row = sm_ref[k : k + 1, :]  # (1, d_x) — 1-D rolls are unsupported
        for c, sh in enumerate(shifts):
            scratch_ref[c : c + 1, :] = pltpu.roll(
                row, (-sh) % d_x, axis=1
            )
        out_ref[pl.ds(k * d_x, d_x), :] = jnp.swapaxes(
            scratch_ref[:, :], 0, 1
        )


@functools.partial(jax.jit, static_argnames=("lo", "hi", "rows_per_step",
                                             "interpret"))
def build_pcf_window_table(shadowmap, lo: int = -3, hi: int = 3,
                           rows_per_step: int = 8,
                           interpret: bool = False):
    """The PCF x-window table built IN KERNEL (see _window_table_kernel).

    Returns (D_y * D_x, 8) float32 with row (y*D_x + x) holding
    sm[y, (x+lo .. x+lo+7) mod D_x] — a superset of the (lo..hi) window,
    channel-padded to 8 so VMEM blocks stay tile-aligned. Exact same
    values as compute_pcf_packed's XLA-built table (wrap == mod).
    """
    d_y, d_x = shadowmap.shape
    assert hi - lo + 1 <= 8, "window wider than the padded 8 channels"
    shifts = [lo + c for c in range(8)]
    grid = (d_y // rows_per_step,)
    out = pl.pallas_call(
        functools.partial(_window_table_kernel, shifts=shifts, d_x=d_x,
                          rows_per_step=rows_per_step),
        grid=grid,
        in_specs=[pl.BlockSpec((rows_per_step, d_x), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows_per_step * d_x, 8),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((d_y * d_x, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, d_x), jnp.float32)],
        interpret=interpret,
    )(shadowmap)
    return out


def _window2d_table_kernel(sm_ref, out_ref, scratch_ref, *, lo_x, lo_y,
                           w_y, d_y, d_x, rows_per_step):
    """out[(y*d_x + x), dy*8 + dx] = sm[(y+lo_y+dy) % D, (x+lo_x+dx) % D]
    — the FULL 2-D PCF window per texel, built from dynamic row slices
    (y wrap by scalar mod) + circular lane rolls, one in-kernel
    transpose per texel row."""
    step = pl.program_id(0)
    for k in range(rows_per_step):
        y = step * rows_per_step + k
        for dy in range(w_y):
            ys = jax.lax.rem(y + lo_y + dy + d_y, d_y)
            row = sm_ref[pl.ds(ys, 1), :]  # (1, d_x)
            for dx in range(8):
                scratch_ref[dy * 8 + dx : dy * 8 + dx + 1, :] = (
                    pltpu.roll(row, (-(lo_x + dx)) % d_x, axis=1)
                )
        out_ref[pl.ds(k * d_x, d_x), :] = jnp.swapaxes(
            scratch_ref[:, :], 0, 1
        )


@functools.partial(jax.jit, static_argnames=("lo_x", "lo_y", "w_y",
                                             "rows_per_step", "interpret"))
def build_pcf_window2d_table(shadowmap, lo_x: int = -3, lo_y: int = -3,
                             w_y: int = 7, rows_per_step: int = 4,
                             interpret: bool = False):
    """One-gather PCF: the whole (w_y x 8) window of every shadow texel
    in one table row (w_y*8 channels; 224 B at the reference radius —
    row width is nearly free, and this turns PCF's 5 gathers into ONE,
    relieving the frame's gather super-additivity)."""
    d_y, d_x = shadowmap.shape
    n_ch = w_y * 8
    grid = (d_y // rows_per_step,)
    out = pl.pallas_call(
        functools.partial(_window2d_table_kernel, lo_x=lo_x, lo_y=lo_y,
                          w_y=w_y, d_y=d_y, d_x=d_x,
                          rows_per_step=rows_per_step),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_step * d_x, n_ch),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((d_y * d_x, n_ch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_ch, d_x), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(shadowmap)
    return out

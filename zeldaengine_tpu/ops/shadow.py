"""Shadow mapping: bias-matrix projection + PCF filtering.

Ports Common.glsl:294-342 (BiasMat, ComputeShadowCoord, ShadowDepthProject,
ComputePCF). The 25-tap (radius 2) PCF gather is expressed as a static
Python loop of shifted bilinear-free taps — XLA fuses it into one pass; a
Pallas shifted-window kernel can replace it later for the 1080p hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SHADOW_IN_FACTOR = 0.1  # ShadowDepthProject: factor when occluded (:315)


def compute_shadow_coord(shadowmap_space: jnp.ndarray, position: jnp.ndarray):
    """BiasMat * ShadowmapSpace * (P, 1) (Common.glsl:294-304).

    BiasMat maps ndc xy [-1,1] -> uv [0,1] (z untouched).
    Returns (..., 4) homogeneous shadow coords.
    """
    p = position
    clip = (
        p[..., 0, None] * shadowmap_space[..., :, 0]
        + p[..., 1, None] * shadowmap_space[..., :, 1]
        + p[..., 2, None] * shadowmap_space[..., :, 2]
        + shadowmap_space[..., :, 3]
    )
    x = clip[..., 0] * 0.5 + clip[..., 3] * 0.5
    y = clip[..., 1] * 0.5 + clip[..., 3] * 0.5
    return jnp.stack([x, y, clip[..., 2], clip[..., 3]], -1)


def _shadow_tap(shadowmap: jnp.ndarray, sc, offset_u, offset_v, bias=0.0):
    """ShadowDepthProject (Common.glsl:307-319): nearest-texel compare.

    sc: (..., 4) shadow coord ALREADY divided by w (as the callers do:
    ``ComputePCF(sp, ShadowCoord / ShadowCoord.w, 2)``).
    Returns shadow factor 1.0 (lit) or 0.1 (occluded).
    """
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]
    u = sc[..., 0] + offset_u
    v = sc[..., 1] + offset_v
    # texture() on the shadow sampler: repeat addressing, nearest-equivalent
    # (the reference samples a D32 texture; we take the nearest texel).
    ix = jnp.mod(jnp.floor(u * dim_x).astype(jnp.int32), dim_x)
    iy = jnp.mod(jnp.floor(v * dim_y).astype(jnp.int32), dim_y)
    dist = shadowmap.reshape(-1)[iy * dim_x + ix]
    z = sc[..., 2]
    w = sc[..., 3]
    occluded = (z > -1.0) & (z < 1.0) & (w > 0.0) & (dist < z - bias)
    return jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)


def compute_pcf_packed(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                       radius: int = 2, scale: float = 1.5,
                       bias: float = 0.0, _ablate_const_table: bool = False,
                       batch_rows: bool = False):
    """ComputePCF via a row-packed shadow table: EXACT (matches
    ``compute_pcf`` tap-for-tap everywhere, including grazing angles where
    the windowed Pallas kernel clamps) at (2r+1) gathers per pixel.

    Each tap row's W x-taps (W = span of ``scale * radius`` around the
    pixel's own base texel) come back in ONE narrow row gather from a
    (dim^2, W) table of x-shifted shadowmap copies built once per frame
    (pure bandwidth); the x taps then resolve with one-hot selections
    over the W channels — 5 cheap gathers + VPU math instead of 25 random
    gathers (15x slower) or a full 2-D-window table (3.5x slower: gather
    cost grows with table bytes).
    """
    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    w_win = hi - lo + 1
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]

    # Row-window table: row (y*wp + x) holds sm_wrapped[y, x+lo .. x+hi]
    # (w_win channels). Built without any per-slice 2D->1D reshape (XLA
    # materializes those as catastrophically padded copies): wrap-pad in
    # x, flatten ONCE, take w_win 1-D shifted slices, transpose once.
    # One tap ROW then costs one ~w_win*4-byte gather; the x taps resolve
    # with cheap one-hot selections over w_win channels. Keeping the
    # table narrow (w_win vs w_win^2 channels) is what keeps the gather
    # fast — measured 3.5x faster than a full 2-D-window table at 1080p.
    sm_p = jnp.pad(shadowmap, ((0, 0), (-lo, hi)), mode="wrap")
    wp = dim_x + w_win - 1
    if _ablate_const_table:
        # DIAGNOSTIC: skip the table build (gather from a broadcast) to
        # attribute PCF cost between build and gathers.
        span = (dim_y - 1) * wp + dim_x
        table = jnp.broadcast_to(shadowmap[:1, :w_win], (span, w_win))
    else:
        flat = sm_p.reshape(-1)
        span = (dim_y - 1) * wp + dim_x
        shifts = jnp.stack(
            [
                jax.lax.dynamic_slice(flat, (dx,), (span,))
                for dx in range(w_win)
            ],
            0,
        )  # (w_win, span)
        table = shifts.T  # (span, w_win)

    return _pcf_taps_from_rows(table, wp, dim_y, dim_x, shadow_coord,
                               radius, scale, bias, lo,
                               batch_rows=batch_rows)


def _pcf_taps_from_rows(table, wp: int, dim_y: int, dim_x: int,
                        shadow_coord, radius: int, scale: float,
                        bias: float, lo: int, batch_rows: bool = False):
    """Shared tap logic over an x-window row table: table[y*wp + x]
    holds sm[y, x+lo .. x+lo+w-1] (wrap addressing).

    ``batch_rows`` stacks the (2r+1) per-row index planes and issues ONE
    gather of shape (2r+1, ..., w_win) instead of one gather per tap row:
    TPU gather cost is dominated by a per-OP overhead, nearly flat in
    index count at frame scale (half-res PCF cut indices 4x and saved
    almost nothing on the gathers — BASELINE.md round-3 ledger), so 5
    gathers -> 1 is the win the per-index model said was impossible."""
    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    xb = jnp.floor(fx).astype(jnp.int32)
    xm = jnp.mod(xb, dim_x)

    oys = list(range(-radius, radius + 1))
    if batch_rows:
        idx = jnp.stack(
            [
                jnp.mod(jnp.floor(fy + scale * oy).astype(jnp.int32),
                        dim_y) * wp + xm
                for oy in oys
            ],
            0,
        )  # (2r+1, ...)
        rows_all = table[idx]  # ONE gather: (2r+1, ..., w_win)

    # X-tap channel: floor(fx + scale*ox) - xb = floor(frx + scale*ox)
    # with frx in [0, 1) takes at most TWO values — floor(scale*ox) and
    # floor(scale*ox)+1, split at frx >= ceil(scale*ox) - scale*ox. So
    # each tap is a static channel read or one 2-way select instead of a
    # one-hot reduction over the whole window.
    frx = fx - jnp.floor(fx)
    # The in_range gate is per-PIXEL, so it folds out of the tap loop
    # (saves one `and` per tap) — but the 0.1/1.0 map must stay per-tap
    # in tap order: folding it to `count - 0.9 * occ_n` is algebraically
    # equal yet differs in ULPs from compute_pcf's sequential sum, and
    # the golden tests require bitwise parity.
    total = 0.0
    count = 0
    for k, oy in enumerate(oys):
        if batch_rows:
            row = rows_all[k]
        else:
            iy = jnp.mod(jnp.floor(fy + scale * oy).astype(jnp.int32),
                         dim_y)
            row = table[iy * wp + xm]  # (..., w_win)
        for ox in range(-radius, radius + 1):
            so = scale * ox
            c0 = int(np.floor(so)) - lo
            if so == np.floor(so):
                dist = row[..., c0]
            else:
                thr = np.ceil(so) - so
                dist = jnp.where(frx >= thr, row[..., c0 + 1],
                                 row[..., c0])
            total = total + jnp.where(dist < z_cmp, SHADOW_IN_FACTOR, 1.0)
            count += 1
    total = jnp.where(in_range, total, float(count))
    return total / count


def compute_pcf_packed_y(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                         radius: int = 2, scale: float = 1.5,
                         bias: float = 0.0, ygroup: int = 4):
    """compute_pcf_packed with ``ygroup`` consecutive shadow ROWS packed
    per table row. Exact tap-for-tap vs ``compute_pcf``.

    Row q of the (nq*wp, ygroup*w_win) table holds the x windows of
    shadow rows ygroup*q .. ygroup*q+ygroup-1 at every x: channel
    (r*w_win + dx) of row (q*wp + x) = sm[ygroup*q + r, x + lo + dx].
    Two effects vs the plain row table: rows drop ygroup-x (1.05M ->
    264k at 1024^2, under the ~200k-row gather knee) and the (2r+1)
    per-tap-row gathers collapse to ceil((span+ygroup-1)/ygroup)+1 = 3
    window gathers; taps resolve with small static-channel selects.

    The build avoids every known relayout trap: per-channel 1-D
    dynamic_slice + reshape + block slice (contiguous 4 KB blocks, no
    lane interleave), one contiguous channel-major stack, ONE narrow
    transpose (the same class the plain build already pays, at the same
    element count).
    """
    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    w_win = hi - lo + 1
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]
    assert dim_y % ygroup == 0
    nq = dim_y // ygroup

    sm_p = jnp.pad(shadowmap, ((0, 0), (-lo, hi)), mode="wrap")
    wp = dim_x + w_win - 1
    flat = jnp.pad(sm_p.reshape(-1), ((0, ygroup * wp),), mode="wrap")
    chans = []
    for r in range(ygroup):
        for dx in range(w_win):
            sl = jax.lax.dynamic_slice(
                flat, (r * wp + dx,), (nq * ygroup * wp,)
            )
            chans.append(
                sl.reshape(nq, ygroup * wp)[:, :wp].reshape(-1)
            )
    table = jnp.stack(chans, 0).T  # (nq*wp, ygroup*w_win)

    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    xb = jnp.floor(fx)
    xm = jnp.mod(xb, dim_x)
    frx = fx - xb

    # Pack-row window: the (2*radius+1) tap rows iy = floor(fy+scale*oy)
    # span [floor(fy-scale*radius), ceil(fy+scale*radius)] — at most
    # span+1 rows, covered by n_q = ceil((span+ygroup)/ygroup) + ...
    # conservatively span//ygroup + 2 pack rows starting at
    # qmin = floor(iy_min / ygroup). All in f32 exact-int arithmetic;
    # wrap at pack granularity (dim_y % ygroup == 0 keeps mod exact).
    iy_min = jnp.floor(fy + scale * (-radius))
    qmin = jnp.floor(iy_min / ygroup)
    span_rows = int(np.ceil(scale * radius)) - int(np.floor(-scale * radius))
    n_q = span_rows // ygroup + 2
    rows = []
    for k in range(n_q):
        qk = jnp.mod(qmin + k, nq)
        rows.append(table[(qk * wp + xm).astype(jnp.int32)])

    total = 0.0
    count = 0
    for oy in range(-radius, radius + 1):
        iy = jnp.floor(fy + scale * oy)
        qt = jnp.floor(iy / ygroup)
        k_rel = qt - qmin  # 0 .. n_q-1
        r = iy - qt * ygroup  # 0 .. ygroup-1
        # Resolve this tap row's w_win window once: pack-row select over
        # k_rel, then y-sub-row select over r (static channel slices).
        rowsel = rows[0]
        for kk in range(1, n_q):
            rowsel = jnp.where((k_rel == kk)[..., None], rows[kk], rowsel)
        win = rowsel[..., 0:w_win]
        for rr in range(1, ygroup):
            win = jnp.where((r == rr)[..., None],
                            rowsel[..., rr * w_win:(rr + 1) * w_win], win)
        for ox in range(-radius, radius + 1):
            so = scale * ox
            c0 = int(np.floor(so)) - lo
            if so == np.floor(so):
                dist = win[..., c0]
            else:
                thr = np.ceil(so) - so
                dist = jnp.where(frx >= thr, win[..., c0 + 1],
                                 win[..., c0])
            occluded = in_range & (dist < z_cmp)
            total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            count += 1
    return total / count


def compute_pcf_packed_roll(shadowmap: jnp.ndarray,
                            shadow_coord: jnp.ndarray,
                            radius: int = 2, scale: float = 1.5,
                            bias: float = 0.0, interpret: bool = False):
    """compute_pcf_packed with the x-window table built IN KERNEL by
    circular lane rolls (ops/pcf_pallas.build_pcf_window_table) instead
    of XLA pad/flatten/shift/transpose — the narrow (w, span) transpose
    was the dominant in-context PCF cost (ablation 2026-08-17: PCF 54 ms
    of a 158 ms frame). Exact tap-for-tap vs ``compute_pcf``."""
    from zeldaengine_tpu.ops.pcf_pallas import build_pcf_window_table

    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    if hi - lo + 1 > 8:  # wider than the 8-channel kernel table
        return compute_pcf_packed(shadowmap, shadow_coord, radius=radius,
                                  scale=scale, bias=bias)
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]
    table = build_pcf_window_table(shadowmap, lo=lo, hi=hi,
                                   interpret=interpret)
    return _pcf_taps_from_rows(table, dim_x, dim_y, dim_x, shadow_coord,
                               radius, scale, bias, lo)


def compute_pcf_packed4(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                        radius: int = 2, scale: float = 1.5,
                        bias: float = 0.0, group: int = 4):
    """compute_pcf_packed with ``group`` x-adjacent bases fused per table
    row: group-x fewer gather-table rows (dim*wp/group — under the
    ~200k-row knee TPU gather cost drops from ~10-13 ms to ~5 ms per
    2M-pixel pass in-context), at the cost of log2(group) binary
    align-selects per tap ROW (the whole window shifts at once, not per
    tap). Exact tap-for-tap vs ``compute_pcf``.

    Table row q holds g[group*q .. group*q + group + W - 2] where g is
    the x-wrap-padded shadowmap flattened row-major and W the x-window
    span; the window of base texel (y, x) starts at g[y*wp + x] =
    channel (f0 % group) of row f0 // group.
    """
    assert group in (2, 4, 8, 16)
    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    w_win = hi - lo + 1
    n_ch = w_win + group - 1  # `group` bases share a row
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]

    sm_p = jnp.pad(shadowmap, ((0, 0), (-lo, hi)), mode="wrap")
    wp = dim_x + w_win - 1
    g = sm_p.reshape(-1)
    nq = (dim_y * wp + group - 1) // group
    # table[q, c] = g[group*q + c] built from CONTIGUOUS row-shifted
    # views of g reshaped (nq+k, group) — strided slices lower to
    # catastrophic relayouts on TPU (measured +98 ms/frame).
    n_rows = -(-n_ch // group) + 1
    g2 = jnp.pad(g, (0, (nq + n_rows) * group - g.shape[0])) \
        .reshape(nq + n_rows, group)
    parts = [g2[k : nq + k] for k in range(n_rows)]
    table = jnp.concatenate(parts, axis=1)[:, :n_ch]  # (nq, n_ch)

    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    xb = jnp.floor(fx).astype(jnp.int32)
    xm = jnp.mod(xb, dim_x)
    frx = fx - jnp.floor(fx)
    total = 0.0
    count = 0
    for oy in range(-radius, radius + 1):
        iy = jnp.mod(jnp.floor(fy + scale * oy).astype(jnp.int32), dim_y)
        f0 = iy * wp + xm
        q = f0 // group
        m = f0 % group
        raw = table[q]  # (..., n_ch) = g[group*q .. group*q+n_ch-1]
        # Align: row[c] = g[f0 + c] = raw[m + c]; log2(group) binary
        # selects shift the whole window at once.
        row = raw
        shift = group >> 1
        while shift:
            b = (m & shift)[..., None] != 0
            keep = row.shape[-1] - shift
            row = jnp.where(b, row[..., shift : shift + keep],
                            row[..., :keep])
            shift >>= 1
        row = row[..., :w_win]
        for ox in range(-radius, radius + 1):
            so = scale * ox
            c0 = int(np.floor(so)) - lo
            if so == np.floor(so):
                dist = row[..., c0]
            else:
                thr = np.ceil(so) - so
                dist = jnp.where(frx >= thr, row[..., c0 + 1],
                                 row[..., c0])
            occluded = in_range & (dist < z_cmp)
            total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            count += 1
    return total / count


def compute_pcf_window_roll(shadowmap: jnp.ndarray,
                            shadow_coord: jnp.ndarray,
                            radius: int = 2, scale: float = 1.5,
                            bias: float = 0.0, interpret: bool = False):
    """ComputePCF with ONE gather per pixel from a kernel-built 2-D
    window table (ops/pcf_pallas.build_pcf_window2d_table): row
    (y*D + x) holds the full (w_y x 8) neighborhood
    sm[(y+lo..y+hi) % D, (x+lo..x+lo+7) % D]. All 25 taps resolve from
    the fetched row with <=4-way static-channel selects. Turns PCF's 5
    row gathers into one — in-context, gathers in one XLA program
    compose super-additively — with the table built by lane rolls
    instead of XLA's catastrophic narrow relayouts. Exact tap-for-tap
    vs ``compute_pcf``."""
    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    w_win = hi - lo + 1
    if w_win > 8:
        return compute_pcf_packed(shadowmap, shadow_coord, radius=radius,
                                  scale=scale, bias=bias)
    from zeldaengine_tpu.ops.pcf_pallas import build_pcf_window2d_table

    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]
    table = build_pcf_window2d_table(shadowmap, lo_x=lo, lo_y=lo,
                                     w_y=w_win, interpret=interpret)

    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    xb = jnp.floor(fx)
    yb = jnp.floor(fy)
    xm = jnp.mod(xb.astype(jnp.int32), dim_x)
    ym = jnp.mod(yb.astype(jnp.int32), dim_y)
    row = table[ym * dim_x + xm]  # (..., w_win*8) — THE one gather

    frx = fx - xb
    fry = fy - yb
    total = 0.0
    count = 0
    for oy in range(-radius, radius + 1):
        so_y = scale * oy
        cy0 = int(np.floor(so_y)) - lo
        thr_y = None if so_y == np.floor(so_y) else np.ceil(so_y) - so_y
        for ox in range(-radius, radius + 1):
            so_x = scale * ox
            cx0 = int(np.floor(so_x)) - lo
            if so_x == np.floor(so_x):
                if thr_y is None:
                    dist = row[..., cy0 * 8 + cx0]
                else:
                    dist = jnp.where(fry >= thr_y,
                                     row[..., (cy0 + 1) * 8 + cx0],
                                     row[..., cy0 * 8 + cx0])
            else:
                thr_x = np.ceil(so_x) - so_x
                if thr_y is None:
                    dist = jnp.where(frx >= thr_x,
                                     row[..., cy0 * 8 + cx0 + 1],
                                     row[..., cy0 * 8 + cx0])
                else:
                    d00 = row[..., cy0 * 8 + cx0]
                    d01 = row[..., cy0 * 8 + cx0 + 1]
                    d10 = row[..., (cy0 + 1) * 8 + cx0]
                    d11 = row[..., (cy0 + 1) * 8 + cx0 + 1]
                    dx_lo = jnp.where(frx >= thr_x, d01, d00)
                    dx_hi = jnp.where(frx >= thr_x, d11, d10)
                    dist = jnp.where(fry >= thr_y, dx_hi, dx_lo)
            occluded = in_range & (dist < z_cmp)
            total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            count += 1
    return total / count


def compute_pcf_half(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                     radius: int = 2, scale: float = 1.5,
                     bias: float = 0.0, upsample: str = "linear",
                     inner: str = "packed"):
    """ComputePCF at HALF resolution + 2x upsample (VERDICT r2 #10).

    The shadow factor is a (2r+1)^2-tap average — a low-pass filter of
    the binary occlusion test — so it is smooth except at penumbra
    boundaries, which span several shadowmap texels (= several screen
    pixels at the demo scale). Evaluating the EXACT packed-table taps on
    a 2x2-mean-subsampled coordinate grid cuts the gather index count
    4x (gather cost on this chip tracks index count once the table
    exceeds the ~200k-row knee; see BASELINE.md) and upsamples the
    factor bilinearly. Max error vs the full-res exact factor is one
    tap-count quantum (0.036) along penumbra edges — the same tolerance
    the cross-backend goldens already allow for FP-ULP edge flips.

    ``upsample``: "linear" (separable tent, default) or "nearest".
    """
    h, w = shadow_coord.shape[:2]
    if h % 2 or w % 2 or shadow_coord.ndim != 3:
        return compute_pcf_packed(shadowmap, shadow_coord, radius=radius,
                                  scale=scale, bias=bias)
    # 2x2 box-mean of the homogeneous coords (a reduction, not a strided
    # slice — strided lane/sublane selections relayout catastrophically
    # on TPU).
    sc = shadow_coord.reshape(h // 2, 2, w // 2, 2, 4).mean(axis=(1, 3))
    if inner == "window_roll" and shadowmap.shape[-1] % 128 == 0:
        # ONE gather (kernel-built 2-D window table) at quarter indices.
        f = compute_pcf_window_roll(shadowmap, sc, radius=radius,
                                    scale=scale, bias=bias,
                                    interpret=jax.default_backend()
                                    == "cpu")
    elif inner == "packed_y" and shadowmap.shape[-2] % 4 == 0:
        f = compute_pcf_packed_y(shadowmap, sc, radius=radius,
                                 scale=scale, bias=bias, ygroup=4)
    else:
        f = compute_pcf_packed(shadowmap, sc, radius=radius, scale=scale,
                               bias=bias)  # (h/2, w/2)
    if upsample == "nearest":
        return jnp.broadcast_to(
            f[:, None, :, None], (h // 2, 2, w // 2, 2)
        ).reshape(h, w)
    # Separable 2x tent upsample: even output i=2q reads 0.75 f[q] +
    # 0.25 f[q-1], odd reads 0.75 f[q] + 0.25 f[q+1] (edge-clamped) —
    # built from full-row shifts + one broadcast-reshape per axis.
    def up_axis0(x):
        prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        pair = jnp.stack([0.75 * x + 0.25 * prev,
                          0.75 * x + 0.25 * nxt], axis=1)
        return pair.reshape(x.shape[0] * 2, *x.shape[1:])

    f = up_axis0(f)  # (h, w/2)
    f = up_axis0(f.T).T  # (h, w)
    return f


def compute_pcf_window1(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                        radius: int = 2, scale: float = 1.5,
                        bias: float = 0.0):
    """ComputePCF with ONE gather per pixel from a full 2-D window table.

    The table row for base texel (y, x) holds the whole
    (2*ceil(scale*r)+1)^2 window sm[y-3..y+3, x-3..x+3] (49 channels at
    the reference's radius-2/scale-1.5). Built with the flatten-once
    trick (wrap-pad BOTH axes, flatten, 49 shifted 1-D slices, one
    stack): every slice is a contiguous copy, so the build is pure
    bandwidth (~200 MB) instead of the catastrophically padded per-slice
    2D reshapes that sank the first windowed-table attempt. Each tap then
    resolves from the fetched row with at most a 4-way (2x2 binary)
    channel select — TPU gather cost is per gather OP (and row count),
    and a ~200-B row rides in the same fetch.

    Exact tap-for-tap vs ``compute_pcf``.
    """
    lo = int(np.floor(-scale * radius))
    hi = int(np.ceil(scale * radius))
    w_win = hi - lo + 1  # 7 at radius 2 / scale 1.5 (both axes)
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]

    # Wrap-pad both axes by the window reach; row (y*wp + x) of the
    # table = smp[y + dy, x + dx] for all (dy, dx) in the window.
    sm_p = jnp.pad(shadowmap, ((-lo, hi), (-lo, hi)), mode="wrap")
    wp = dim_x + w_win - 1
    flat = sm_p.reshape(-1)
    span = (dim_y - 1) * wp + dim_x
    shifts = [
        jax.lax.dynamic_slice(flat, (dy * wp + dx,), (span,))
        for dy in range(w_win)
        for dx in range(w_win)
    ]
    table = jnp.stack(shifts, -1)  # (span, w_win^2)

    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    xb = jnp.floor(fx)
    yb = jnp.floor(fy)
    xm = jnp.mod(xb.astype(jnp.int32), dim_x)
    ym = jnp.mod(yb.astype(jnp.int32), dim_y)
    row = table[ym * wp + xm]  # (..., w_win^2)

    # Tap (oy, ox) reads channel (floor(fy + s*oy) - yb + 3) * 7 +
    # (floor(fx + s*ox) - xb + 3); each floor offset takes at most two
    # values split at the fractional part (see compute_pcf_packed).
    frx = fx - xb
    fry = fy - yb
    total = 0.0
    count = 0
    for oy in range(-radius, radius + 1):
        so_y = scale * oy
        cy0 = int(np.floor(so_y)) - lo
        if so_y == np.floor(so_y):
            ylist = [(cy0, None)]
        else:
            thr_y = np.ceil(so_y) - so_y
            ylist = [(cy0, thr_y)]
        for ox in range(-radius, radius + 1):
            so_x = scale * ox
            cx0 = int(np.floor(so_x)) - lo
            cy, thr_y = ylist[0]
            if so_x == np.floor(so_x):
                if thr_y is None:
                    dist = row[..., cy * w_win + cx0]
                else:
                    dist = jnp.where(fry >= thr_y,
                                     row[..., (cy + 1) * w_win + cx0],
                                     row[..., cy * w_win + cx0])
            else:
                thr_x = np.ceil(so_x) - so_x
                if thr_y is None:
                    dist = jnp.where(frx >= thr_x,
                                     row[..., cy * w_win + cx0 + 1],
                                     row[..., cy * w_win + cx0])
                else:
                    d00 = row[..., cy * w_win + cx0]
                    d01 = row[..., cy * w_win + cx0 + 1]
                    d10 = row[..., (cy + 1) * w_win + cx0]
                    d11 = row[..., (cy + 1) * w_win + cx0 + 1]
                    dx_lo = jnp.where(frx >= thr_x, d01, d00)
                    dx_hi = jnp.where(frx >= thr_x, d11, d10)
                    dist = jnp.where(fry >= thr_y, dx_hi, dx_lo)
            occluded = in_range & (dist < z_cmp)
            total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            count += 1
    return total / count


def compute_pcf(shadowmap: jnp.ndarray, shadow_coord: jnp.ndarray,
                radius: int = 2, scale: float = 1.5, bias: float = 0.0):
    """ComputePCF (Common.glsl:323-342): (2r+1)^2 taps at ``scale`` texel
    spacing, averaged. ``shadow_coord`` is the homogeneous coord (divided by
    w here, matching the call sites Base.frag:67 / BaseLighting.frag:178).

    Taps use flattened 1D gathers (measurably faster on TPU than 2D)."""
    w = shadow_coord[..., 3, None]
    sc = shadow_coord / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)
    dim_y, dim_x = shadowmap.shape[-2], shadowmap.shape[-1]
    flat = shadowmap.reshape(-1)
    z = sc[..., 2]
    w_post = sc[..., 3]
    in_range = (z > -1.0) & (z < 1.0) & (w_post > 0.0)
    z_cmp = z - bias
    fx = sc[..., 0] * dim_x
    fy = sc[..., 1] * dim_y
    total = 0.0
    count = 0
    for oy in range(-radius, radius + 1):
        iy = jnp.mod(jnp.floor(fy + scale * oy).astype(jnp.int32), dim_y)
        base = iy * dim_x
        for ox in range(-radius, radius + 1):
            ix = jnp.mod(jnp.floor(fx + scale * ox).astype(jnp.int32), dim_x)
            dist = flat[base + ix]
            occluded = in_range & (dist < z_cmp)
            total = total + jnp.where(occluded, SHADOW_IN_FACTOR, 1.0)
            count += 1
    return total / count

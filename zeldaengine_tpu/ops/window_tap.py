"""Windowed VMEM bilinear tap: sample_base for smooth-uv fullscreen taps.

The skydome equirect and the background rect are sampled once per pixel
at mip 0 (``sample_base(quad=True)``, texture.py:148) — an XLA gather
that costs ~4-8 ns per index (~7 ms/frame at 1080p for the sky pass)
regardless of locality. Both taps have SMOOTH screen-space uv (a dome
ray direction / the screen rect itself), so the same windowed-kernel
treatment as the VMEM PCF (ops/pcf_vmem.py) applies: keep the C image
planes VMEM-resident, slice a per-block window, and resolve the 2x2
bilinear footprint with vectorized lane/sublane gathers.

Bitwise-identical to ``sample_base`` on the quad-packed atlas of the
same (bf16-stored) image at every ACTIVE pixel: same clamp/repeat
addressing (x1 = min(x0+1, S-1) edge-clamp exactly like
build_packed_mip_atlas's neighborhood), same lerp order. Blocks whose
footprint exceeds the window (the equirect wrap seam) are recomputed
in-graph by the same jnp math, cost-tiered like the PCF fallback.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_H = 8
_BLK_W = 128
_WIN_COLS = 128


def _coords(uv, size: int):
    """sample_bilinear_level_packed's mip-0 index math, verbatim."""
    size_f = jnp.float32(size)
    uw = uv[..., 0] - jnp.floor(uv[..., 0])
    vw = uv[..., 1] - jnp.floor(uv[..., 1])
    u = uw * size_f - 0.5
    v = vw * size_f - 0.5
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, size - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, size - 1)
    fu = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)
    fv = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)
    return x0, y0, fu, fv


def _tap_kernel(planes_ref, x0_ref, y0_ref, fu_ref, fv_ref, act_ref,
                out_ref, fit_ref, *, size: int, win_rows: int,
                channels: int):
    slab_rows = 16 if win_rows <= 8 else (32 if win_rows <= 24 else 64)
    x0 = x0_ref[...]
    y0 = y0_ref[...]
    fu = fu_ref[...]
    fv = fv_ref[...]
    act = act_ref[...] > 0.0

    x1 = jnp.minimum(x0 + 1, size - 1)
    y1 = jnp.minimum(y0 + 1, size - 1)
    big = jnp.int32(2 * size)
    xmin = jnp.min(jnp.where(act, x0, big))
    xmax = jnp.max(jnp.where(act, x1, -big))
    ymin = jnp.min(jnp.where(act, y0, big))
    ymax = jnp.max(jnp.where(act, y1, -big))
    any_act = jnp.any(act)
    fit = ((ymax - ymin < win_rows) & (xmax - xmin < _WIN_COLS))
    fit_ref[pl.program_id(0), pl.program_id(1)] = \
        (fit | ~any_act).astype(jnp.int32)

    row0 = jnp.clip(ymin, 0, size - win_rows)
    col0 = jnp.clip(xmin, 0, size - _WIN_COLS)
    row0a = pl.multiple_of(
        jnp.minimum((row0 // 8) * 8, size - slab_rows), 8)
    col0a = pl.multiple_of(
        jnp.minimum((col0 // 128) * 128, size - 2 * _WIN_COLS), 128)

    def window(c):
        slabs = [
            jnp.concatenate(
                [planes_ref[c, pl.ds(row0a + 8 * k, 8), pl.ds(col0a, 128)],
                 planes_ref[c, pl.ds(row0a + 8 * k, 8),
                            pl.ds(col0a + 128, 128)]], axis=1)
            for k in range(slab_rows // 8)
        ]
        sl = jnp.concatenate(slabs, axis=0)
        sl = pltpu.roll(sl, 256 + col0a - col0, 1)[:, :_WIN_COLS]
        return pltpu.roll(sl, slab_rows + row0a - row0, 0)

    x0l = jnp.bitwise_and(x0 - col0, _WIN_COLS - 1)
    x1l = jnp.bitwise_and(x1 - col0, _WIN_COLS - 1)
    y0l = y0 - row0
    y1l = y1 - row0

    def body():
        for c in range(channels):
            win = window(c)
            t00 = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
            t10 = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
            t01 = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
            t11 = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)
            for r in range(win_rows):
                src = win[8 * (r // 8):8 * (r // 8 + 1)]
                rb = jnp.take_along_axis(
                    src, jnp.full((_BLK_H, _BLK_W), r % 8, jnp.int32),
                    axis=0)
                g0 = jnp.take_along_axis(rb, x0l, axis=1)
                g1 = jnp.take_along_axis(rb, x1l, axis=1)
                m0 = (y0l == r).astype(jnp.float32)
                m1 = (y1l == r).astype(jnp.float32)
                t00 = t00 + m0 * g0
                t10 = t10 + m0 * g1
                t01 = t01 + m1 * g0
                t11 = t11 + m1 * g1
            top = t00 * (1 - fu) + t10 * fu
            bot = t01 * (1 - fu) + t11 * fu
            out_ref[c] = top * (1 - fv) + bot * fv

    def skip():
        for c in range(channels):
            out_ref[c] = jnp.zeros((_BLK_H, _BLK_W), jnp.float32)

    jax.lax.cond(any_act, body, skip)


def _jnp_tap(planes, x0, y0, fu, fv, size: int):
    """The same bilinear from the planes via XLA gathers (fallback)."""
    c = planes.shape[0]
    flat = planes.reshape(c, -1)
    x1 = jnp.minimum(x0 + 1, size - 1)
    y1 = jnp.minimum(y0 + 1, size - 1)

    def g(yy, xx):
        return flat[:, (yy * size + xx)]  # (C, ...)

    t00, t10, t01, t11 = g(y0, x0), g(y0, x1), g(y1, x0), g(y1, x1)
    top = t00 * (1 - fu) + t10 * fu
    bot = t01 * (1 - fu) + t11 * fu
    return top * (1 - fv) + bot * fv


@functools.partial(
    jax.jit,
    static_argnames=("size", "win_rows", "fallback_cap", "interpret"))
def sample_base_window(planes: jnp.ndarray, uv: jnp.ndarray,
                       active: Optional[jnp.ndarray], size: int,
                       win_rows: int = 48, fallback_cap: int = 64,
                       interpret: bool = False):
    """Bilinear mip-0 tap of (C, S, S) f32 planes at uv (H, W, 2).

    Returns ((H, W, C) f32, overflow). Exact vs sample_base on the
    quad atlas built from the same image at every active pixel; pixels
    outside ``active`` are 0 (callers mask them anyway).
    """
    c, s, s2 = planes.shape
    assert s == s2 == size and size % 256 == 0, (planes.shape, size)
    h, w = uv.shape[:2]
    x0, y0, fu, fv = _coords(uv, size)
    act = jnp.ones((h, w), bool) if active is None else active

    ph = -(-h // _BLK_H) * _BLK_H
    pw = -(-w // _BLK_W) * _BLK_W
    if (ph, pw) != (h, w):
        pad = ((0, ph - h), (0, pw - w))
        x0, y0 = jnp.pad(x0, pad), jnp.pad(y0, pad)
        fu, fv = jnp.pad(fu, pad), jnp.pad(fv, pad)
        act = jnp.pad(act, pad)
    n_by, n_bx = ph // _BLK_H, pw // _BLK_W

    blk = pl.BlockSpec((_BLK_H, _BLK_W), lambda i, j: (i, j))
    out, fitmap = pl.pallas_call(
        functools.partial(_tap_kernel, size=size, win_rows=win_rows,
                          channels=c),
        grid=(n_by, n_bx),
        in_specs=[pl.BlockSpec((c, size, size), lambda i, j: (0, 0, 0)),
                  blk, blk, blk, blk, blk],
        out_specs=[pl.BlockSpec((c, _BLK_H, _BLK_W),
                                lambda i, j: (0, i, j)),
                   pl.BlockSpec((n_by, n_bx), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((c, ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((n_by, n_bx), jnp.int32)],
        interpret=interpret,
    )(planes, x0, y0, fu, fv, act.astype(jnp.float32))

    n_unfit = jnp.sum(fitmap == 0)

    def make_fixup(cap):
        def fixup(out):
            nb = n_by * n_bx
            flat_unfit = (fitmap == 0).reshape(-1)
            idxs, = jnp.nonzero(flat_unfit, size=cap, fill_value=nb)
            ok = idxs < nb
            bi = jnp.where(ok, idxs // n_bx, 0)
            bj = jnp.where(ok, idxs % n_bx, 0)

            def one(i, j):
                args = [jax.lax.dynamic_slice(a, (i * _BLK_H, j * _BLK_W),
                                              (_BLK_H, _BLK_W))
                        for a in (x0, y0, fu, fv)]
                return _jnp_tap(planes, *args, size)

            blocks = jax.vmap(one)(bi, bj)  # (cap, C, 8, 128)

            def bodyf(k, o):
                upd = jax.lax.dynamic_update_slice(
                    o, blocks[k], (0, bi[k] * _BLK_H, bj[k] * _BLK_W))
                return jnp.where(ok[k], upd, o)

            return jax.lax.fori_loop(0, cap, bodyf, out)

        return fixup

    tiers = [t for t in (4, 16) if t < fallback_cap] + [fallback_cap]
    bounds = jnp.asarray([0] + tiers[:-1])
    tier = jnp.sum(n_unfit > bounds)
    out = jax.lax.switch(
        tier, [lambda o: o] + [make_fixup(t) for t in tiers], out)
    out = jnp.moveaxis(out[:, :h, :w], 0, -1)
    overflow = jnp.maximum(n_unfit - fallback_cap, 0)
    return out, overflow


def planes_from_image_bf16(image) -> jnp.ndarray:
    """(S, S, C) image -> (C, S, S) f32 planes holding the bf16-rounded
    values the quad atlas stores (so the kernel's taps are bitwise-equal
    to sample_base on that atlas)."""
    img = jnp.asarray(image).astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.moveaxis(img, -1, 0)

"""Tile-restricted point-light evaluation as a Pallas TPU kernel.

The reference brute-force loops its point lights per pixel
(BaseLighting.frag:182-207, capacity 512 — ZeldaEngine.cpp:85). The
engine's default unrolled XLA loop pays one full-screen BxDF evaluation
per light CAPACITY slot; at the demo scale that is ~7.8 ms of a ~52 ms
frame for 16 ring lights that each actually reach a handful of screen
tiles (round-5 ablation, BASELINE.md).

This kernel makes the per-tile culled light lists
(ops/lighting.cull_point_lights_tiled) *executable*: the grid walks
(block_h, 128)-pixel blocks, each runs a ``fori_loop`` over ITS OWN
light count (scalar-prefetched), so the VPU work tracks the number of
(light, block) pairs that can actually contribute instead of
capacity x pixels. The XLA tiled path tried the same idea and lost
(BASELINE.md round-3: a fori_loop over full-screen light slots forces
an HBM round trip of the (H, W, 3) accumulator per iteration); inside
the kernel the accumulator lives in vregs for the whole block.

Exactness: ``apply_point_light``'s falloff is ``1 - clamp(dist /
radius)`` — EXACTLY zero at dist >= radius — and the cull keeps every
light whose sphere reaches the tile's covered-pixel AABB, so skipped
lights contribute exactly +0.0. The kernel accumulates onto the
caller's directional-light partial sum in ascending light order,
matching the unrolled path's association ((dir + p0) + p1) + ... .
The arithmetic mirrors pbr.default_lit_bxdf / apply_point_light
op-for-op (pow(x, 5) as the repeated-squaring chain XLA's simplifier
produces); residual Mosaic-vs-XLA lowering differences are below the
cross-backend golden tolerance (tools/tpu_golden_check.py) and covered
by an interpret-mode equality test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeldaengine_tpu.ops.pbr import F0_DIELECTRIC, PI


def _pow5(x):
    # XLA's algebraic simplifier expands pow(x, 5) by repeated squaring:
    # ((x*x)*(x*x))*x — written out so Mosaic lowers the same chain.
    x2 = x * x
    return x2 * x2 * x


def _point_kernel(cnt_ref, idx_ref, lt_ref, acc_ref, dc_ref, n_ref, p_ref,
                  v_ref, r_ref, nv_ref, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    cnt = cnt_ref[ti, tj]

    n0, n1, n2 = n_ref[0], n_ref[1], n_ref[2]
    p0, p1, p2 = p_ref[0], p_ref[1], p_ref[2]
    v0, v1, v2 = v_ref[0], v_ref[1], v_ref[2]
    dc0, dc1, dc2 = dc_ref[0], dc_ref[1], dc_ref[2]
    rough = r_ref[...]
    ndotv = nv_ref[...]

    # Hoisted roughness-only BxDF terms (identical per light).
    a2 = rough * rough
    one_m_a2 = 1.0 - a2
    e_bias = 0.5 * rough
    e_factor = (1.0 - rough) + (1.0 / 1.51) * rough
    f90c = jnp.float32(min(50.0 * F0_DIELECTRIC, 1.0))

    def body(k, acc):
        a0, a1, a2acc = acc
        li = idx_ref[ti, tj, k]
        lp0 = lt_ref[li, 0]
        lp1 = lt_ref[li, 1]
        lp2 = lt_ref[li, 2]
        lc0 = lt_ref[li, 4]
        lc1 = lt_ref[li, 5]
        lc2 = lt_ref[li, 6]
        inten = lt_ref[li, 7]
        radius = lt_ref[li, 11]

        # apply_point_light geometry (pbr.py:162-173)
        t0 = lp0 - p0
        t1 = lp1 - p1
        t2 = lp2 - p2
        d2 = t0 * t0 + t1 * t1 + t2 * t2
        # Divisions (not reciprocal-multiplies): pbr.normalize divides,
        # and x / s vs x * (1 / s) differ in the last ulp.
        dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
        l0 = t0 / dist
        l1 = t1 / dist
        l2 = t2 / dist
        h0 = v0 + l0
        h1 = v1 + l1
        h2 = v2 + l2
        hn = jnp.sqrt(jnp.maximum(h0 * h0 + h1 * h1 + h2 * h2, 1e-20))
        h0 = h0 / hn
        h1 = h1 / hn
        h2 = h2 / hn
        sat = lambda x: jnp.clip(x, 0.0, 1.0)  # noqa: E731
        ldoth = sat(l0 * h0 + l1 * h1 + l2 * h2)
        ndoth = sat(n0 * h0 + n1 * h1 + n2 * h2)
        ndotl = sat(n0 * l0 + n1 * l1 + n2 * l2)

        # default_lit_bxdf (pbr.py:117-131)
        f = F0_DIELECTRIC + (f90c - F0_DIELECTRIC) * _pow5(1.0 - ldoth)
        ggxv = ndotl * jnp.sqrt(ndotv * ndotv * one_m_a2 + a2)
        ggxl = ndotv * jnp.sqrt(ndotl * ndotl * one_m_a2 + a2)
        ggx = ggxv + ggxl
        vis = jnp.where(ggx > 0.0,
                        0.5 / jnp.where(ggx > 0.0, ggx, 1.0), 0.0)
        fd_ggx = (ndoth * a2 - ndoth) * ndoth + 1.0
        d_ndf = a2 / (PI * fd_ggx * fd_ggx)
        fr = f * d_ndf * vis
        fd90 = e_bias + 2.0 * ldoth * ldoth * rough
        light_scatter = 1.0 + (fd90 - 1.0) * _pow5(1.0 - ndotl)
        view_scatter = 1.0 + (fd90 - 1.0) * _pow5(1.0 - ndotv)
        fd = light_scatter * view_scatter * e_factor
        kd = (1.0 - f) * fd

        att = 1.0 - jnp.clip(dist / jnp.maximum(radius, 1e-6), 0.0, 1.0)
        rad = ndotl * inten * att
        return (
            a0 + rad * lc0 * (dc0 * kd + fr),
            a1 + rad * lc1 * (dc1 * kd + fr),
            a2acc + rad * lc2 * (dc2 * kd + fr),
        )

    acc = jax.lax.fori_loop(
        0, cnt, body, (acc_ref[0], acc_ref[1], acc_ref[2]))
    out_ref[0] = acc[0]
    out_ref[1] = acc[1]
    out_ref[2] = acc[2]


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def point_lighting_pallas(acc, diffuse_color, roughness, n, p, v, ndotv,
                          point_lights, tile_idx, tile_cnt,
                          block_h: int = 24, interpret: bool = False):
    """Accumulate tile-culled point lights onto ``acc`` (H, W, 3).

    ``tile_idx``/``tile_cnt`` must come from cull_point_lights_tiled with
    tile_h == block_h and tile_w == 128 (one cull tile per kernel block).
    ``n`` must already be normalized (shade_pixels does). Returns the
    accumulated (H, W, 3).
    """
    h, w = roughness.shape
    n_by = -(-h // block_h)
    n_bx = w // 128
    assert w % 128 == 0, w
    assert tile_cnt.shape == (n_by, n_bx), (tile_cnt.shape, n_by, n_bx)
    ph = n_by * block_h

    def planes(x3):
        x = jnp.moveaxis(x3, -1, 0)
        if ph != h:
            x = jnp.pad(x, ((0, 0), (0, ph - h), (0, 0)))
        return x

    def plane(x2):
        return x2 if ph == h else jnp.pad(x2, ((0, ph - h), (0, 0)))

    lt = point_lights.reshape(point_lights.shape[0], 16).astype(jnp.float32)

    # index maps receive the scalar-prefetch refs after the grid ids
    blk3 = pl.BlockSpec((3, block_h, 128), lambda i, j, *_: (0, i, j))
    blk1 = pl.BlockSpec((block_h, 128), lambda i, j, *_: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tile_cnt, tile_idx, light table
        grid=(n_by, n_bx),
        in_specs=[blk3, blk3, blk3, blk3, blk3, blk1, blk1],
        out_specs=blk3,
    )
    out = pl.pallas_call(
        _point_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, ph, w), jnp.float32),
        interpret=interpret,
    )(tile_cnt, tile_idx, lt,
      planes(acc), planes(diffuse_color), planes(n), planes(p), planes(v),
      plane(roughness), plane(ndotv))
    return jnp.moveaxis(out[:, :h, :], 0, -1)

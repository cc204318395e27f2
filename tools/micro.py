"""Micro-benchmarks for the post-raster unit costs (TPU, steady-scan).

Isolates the pieces the frame-level ablations can't split: the wide
combined-atlas gather vs its select tree, the PCF table build vs its 5
row gathers vs the tap math, and a single full-screen light evaluation.
Same in-jit scan-differencing protocol as ab_frame (the only honest
timing on the tunneled backend).

Usage: python tools/micro.py --probes tex_full,tex_gather,pcf_full
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 1088, 1920  # tile-padded 1080p


def steady_ms(make_fn, frames=6, reps=4):
    def run(n):
        f = make_fn(n)
        t0 = time.time()
        float(f())
        comp = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f())
            ts.append(time.time() - t0)
        return float(np.median(ts)), comp

    (t1, c1), (t2, c2) = run(1), run(max(frames, 2))
    return (t2 - t1) / (max(frames, 2) - 1) * 1000.0, c1 + c2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", type=str, default="tex_full")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--texsize", type=int, default=256)
    ap.add_argument("--combos", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    S = args.texsize
    rng = np.random.default_rng(0)

    def scan(body):
        def make(n):
            @jax.jit
            def f():
                def sbody(c, i):
                    return c + body(c * 1e-30) * 1e-12, 0.0

                c, _ = jax.lax.scan(sbody, jnp.float32(0), jnp.arange(n))
                return c

            return lambda: f()

        return make

    probes = {}

    # ---- shared inputs
    uv = jnp.asarray(rng.uniform(0, 1, (H, W, 2)), jnp.float32)
    lod = jnp.asarray(rng.uniform(0, 6, (H, W)), jnp.float32)
    combo = jnp.asarray(rng.integers(0, args.combos, (H, W)), jnp.int32)

    if any(p.startswith("tex") for p in args.probes.split(",")):
        atlas = jnp.asarray(
            rng.uniform(0, 1, (args.combos, S, 2 * S, 208)), jnp.bfloat16
        )

    def p_tex_full(dt):
        from zeldaengine_tpu.ops.texture import sample_trilinear_packed

        out = sample_trilinear_packed(atlas, combo, uv + dt, lod, S)
        return jnp.sum(out[..., 0].astype(jnp.float32))

    def p_tex_gather(dt):
        from zeldaengine_tpu.ops.texture import (
            _gather_texel, _mip_offsets_table, mip_count)

        l0 = jnp.floor(jnp.clip(lod + dt, 0, mip_count(S) - 1.0))
        size_f = jnp.maximum(jnp.floor(S / jnp.exp2(l0) + 0.5), 1.0)
        offs = _mip_offsets_table(S)[l0.astype(jnp.int32)]
        x0 = jnp.clip((uv[..., 0] * size_f - 0.5).astype(jnp.int32), 0,
                      size_f.astype(jnp.int32) - 1)
        y0 = jnp.clip((uv[..., 1] * size_f - 0.5).astype(jnp.int32), 0,
                      size_f.astype(jnp.int32) - 1)
        row = _gather_texel(atlas, combo, x0 + offs.astype(jnp.int32), y0)
        return jnp.sum(row[..., 0].astype(jnp.float32))

    def p_tex_gather_u8(dt):
        from zeldaengine_tpu.ops.texture import (
            _gather_texel, _mip_offsets_table, mip_count)

        atlas8 = (atlas.astype(jnp.float32) * 255.0).astype(jnp.uint8)
        l0 = jnp.floor(jnp.clip(lod + dt, 0, mip_count(S) - 1.0))
        size_f = jnp.maximum(jnp.floor(S / jnp.exp2(l0) + 0.5), 1.0)
        offs = _mip_offsets_table(S)[l0.astype(jnp.int32)]
        x0 = jnp.clip((uv[..., 0] * size_f - 0.5).astype(jnp.int32), 0,
                      size_f.astype(jnp.int32) - 1)
        y0 = jnp.clip((uv[..., 1] * size_f - 0.5).astype(jnp.int32), 0,
                      size_f.astype(jnp.int32) - 1)
        row = _gather_texel(atlas8, combo, x0 + offs.astype(jnp.int32), y0)
        return jnp.sum(row[..., 0].astype(jnp.float32))

    # ---- PCF pieces (1024^2 f32 map, demo-like coords)
    sm = jnp.asarray(rng.uniform(0, 1, (1024, 1024)), jnp.float32)
    sc = jnp.concatenate(
        [
            jnp.asarray(rng.uniform(0.1, 0.9, (H, W, 2)), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 0.8, (H, W, 1)), jnp.float32),
            jnp.ones((H, W, 1), jnp.float32),
        ],
        -1,
    )

    def p_pcf_full(dt):
        from zeldaengine_tpu.ops.shadow import compute_pcf_packed

        return jnp.sum(compute_pcf_packed(sm + dt, sc))

    def p_pcf_build(dt):
        smd = sm + dt
        lo, hi = -3, 3
        w_win = hi - lo + 1
        sm_p = jnp.pad(smd, ((0, 0), (-lo, hi)), mode="wrap")
        flat = sm_p.reshape(-1)
        span = 1023 * (1024 + w_win - 1) + 1024
        shifts = jnp.stack(
            [jax.lax.dynamic_slice(flat, (dx,), (span,))
             for dx in range(w_win)], 0)
        return jnp.sum(shifts.T[::4096, 0])

    def p_pcf_gathers(dt):
        # 5 row gathers from a prebuilt (span, 8) table + minimal math.
        lo, hi = -3, 3
        w_win = hi - lo + 1
        sm_p = jnp.pad(sm, ((0, 0), (-lo, hi)), mode="wrap")
        flat = sm_p.reshape(-1)
        span = 1023 * (1024 + w_win - 1) + 1024
        table = jnp.stack(
            [jax.lax.dynamic_slice(flat, (dx,), (span,))
             for dx in range(w_win)], 0).T
        wp = 1024 + w_win - 1
        fy = sc[..., 1] * 1024 + dt
        xm = (sc[..., 0] * 1024).astype(jnp.int32)
        acc = 0.0
        for oy in range(-2, 3):
            iy = jnp.mod(jnp.floor(fy + 1.5 * oy).astype(jnp.int32), 1024)
            row = table[iy * wp + xm]
            acc = acc + jnp.sum(row[..., 0])
        return acc

    def p_pcf_batched(dt):
        # ONE gather with stacked (5, H, W) indices instead of 5 gathers.
        lo, hi = -3, 3
        w_win = hi - lo + 1
        sm_p = jnp.pad(sm, ((0, 0), (-lo, hi)), mode="wrap")
        flat = sm_p.reshape(-1)
        span = 1023 * (1024 + w_win - 1) + 1024
        table = jnp.stack(
            [jax.lax.dynamic_slice(flat, (dx,), (span,))
             for dx in range(w_win)], 0).T
        wp = 1024 + w_win - 1
        fy = sc[..., 1] * 1024 + dt
        xm = (sc[..., 0] * 1024).astype(jnp.int32)
        idx = jnp.stack(
            [jnp.mod(jnp.floor(fy + 1.5 * oy).astype(jnp.int32), 1024)
             * wp + xm for oy in range(-2, 3)], 0)
        rows = table[idx]  # (5, H, W, 8)
        return jnp.sum(rows[..., 0])

    def p_pcf_sorted(dt):
        # Locality probe: same 5 gathers but from SORTED indices.
        lo, hi = -3, 3
        w_win = hi - lo + 1
        sm_p = jnp.pad(sm, ((0, 0), (-lo, hi)), mode="wrap")
        flat = sm_p.reshape(-1)
        span = 1023 * (1024 + w_win - 1) + 1024
        table = jnp.stack(
            [jax.lax.dynamic_slice(flat, (dx,), (span,))
             for dx in range(w_win)], 0).T
        wp = 1024 + w_win - 1
        fy = sc[..., 1] * 1024 + dt
        xm = (sc[..., 0] * 1024).astype(jnp.int32)
        base = jnp.sort(
            (jnp.floor(fy).astype(jnp.int32) * wp + xm).reshape(-1)
        ).reshape(fy.shape)
        acc = 0.0
        for oy in range(-2, 3):
            rows = table[jnp.clip(base + oy * wp, 0, span - 1)]
            acc = acc + jnp.sum(rows[..., 0])
        return acc

    def p_pcf_half(dt):
        from zeldaengine_tpu.ops.shadow import compute_pcf_half

        return jnp.sum(compute_pcf_half(sm + dt, sc))

    def p_pcf_half_mean(dt):
        scd = sc + dt
        half = scd.reshape(H // 2, 2, W // 2, 2, 4).mean(axis=(1, 3))
        return jnp.sum(half)

    def p_pcf_half_pool(dt):
        import jax.lax as lax

        scd = sc + dt
        half = lax.reduce_window(
            scd, 0.0, lax.add, (2, 2, 1), (2, 2, 1), "VALID"
        ) * 0.25
        return jnp.sum(half)

    def p_pcf_half_up(dt):
        f0 = sc[..., 0] + dt
        f = f0[: H // 2, : W // 2]

        def up_axis0(x):
            prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
            nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
            pair = jnp.stack([0.75 * x + 0.25 * prev,
                              0.75 * x + 0.25 * nxt], axis=1)
            return pair.reshape(x.shape[0] * 2, *x.shape[1:])

        f = up_axis0(f)
        f = up_axis0(f.T).T
        return jnp.sum(f)

    def p_light1(dt):
        from zeldaengine_tpu.ops import pbr

        n = jnp.asarray(rng.uniform(-1, 1, (H, W, 3)), jnp.float32)
        p = jnp.asarray(rng.uniform(-10, 10, (H, W, 3)), jnp.float32)
        v = pbr.normalize(-p)
        nn = pbr.normalize(n)
        ndotv = pbr.saturate(jnp.sum(nn * v, -1))
        dc = jnp.abs(nn)
        rough = jnp.clip(jnp.abs(n[..., 0]), 0.01, 1.0)
        lpos = jnp.asarray([1.0, 2.0, 3.0], jnp.float32) + dt
        acc = jnp.zeros((H, W, 3), jnp.float32)
        for i in range(16):
            l_dir = pbr.normalize(lpos + i - p)
            h = pbr.normalize(v + l_dir)
            ldoth = pbr.saturate(jnp.sum(l_dir * h, -1))
            ndoth = pbr.saturate(jnp.sum(nn * h, -1))
            ndotl = pbr.saturate(jnp.sum(nn * l_dir, -1))
            dif, spec = pbr.default_lit_bxdf(
                dc, rough, ldoth, ndotv, ndotl, ndoth)
            radiance = pbr.apply_point_light(
                lpos + i, jnp.ones(3, jnp.float32),
                jnp.full(ndotl.shape, 3.0), jnp.full(ndotl.shape, 8.0),
                p, nn)
            acc = acc + radiance * (dif + spec[..., None])
        return jnp.sum(acc)

    table = {
        "tex_full": p_tex_full,
        "tex_gather": p_tex_gather,
        "tex_gather_u8": p_tex_gather_u8,
        "pcf_full": p_pcf_full,
        "pcf_build": p_pcf_build,
        "pcf_gathers": p_pcf_gathers,
        "pcf_batched": p_pcf_batched,
        "pcf_sorted": p_pcf_sorted,
        "pcf_half": p_pcf_half,
        "pcf_half_mean": p_pcf_half_mean,
        "pcf_half_pool": p_pcf_half_pool,
        "pcf_half_up": p_pcf_half_up,
        "light16": p_light1,
    }
    for name in args.probes.split(","):
        ms, comp = steady_ms(scan(table[name]), frames=args.frames)
        probes[name] = ms
        print(json.dumps({"probe": name, "ms": round(ms, 1),
                          "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()

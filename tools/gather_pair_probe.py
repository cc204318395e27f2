"""Micro-probe: where does the pair record gather's time go?

At c4 shapes the camera build_pairs costs ~46 ms more than the same
prep with the record gather DCE'd (stage_times prep vs prep_ng).
Candidates: the (P,)-needle gather over the (T+1, rec_rows) f32 table,
vs the (n_slices, 128, rec) -> (n_slices, rec, 128) minor-dim
transpose. This probe times each piece and layout variants in
isolation with the steady-scan protocol.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


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
    T = 1030400          # c4 triangle count
    P = 512 * 1024       # c4 max_pairs
    REC = 48             # fused rec_rows
    key = jax.random.PRNGKey(0)
    rec16 = jax.device_put(jax.random.normal(key, (T + 1, REC), jnp.float32))
    rec16_t = jax.device_put(rec16.T)  # (REC, T+1)
    stri = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (P,), 0, T + 1, jnp.int32))
    n_slices = P // 128

    def scan_probe(body):
        def make(n):
            @jax.jit
            def f():
                def step(c, _):
                    out = body(stri ^ c)  # perturb needles so no hoist
                    return c + 1, out
                _, outs = jax.lax.scan(step, jnp.int32(0), None, length=n)
                return jnp.sum(outs)
            return f
        return make

    def g_plain(s):
        s = jnp.clip(s, 0, T)
        return jnp.sum(rec16[s])

    def g_transpose(s):
        s = jnp.clip(s, 0, T)
        pr = rec16[s]
        recs = pr.reshape(n_slices, 128, REC).transpose(0, 2, 1)
        return jnp.sum(recs[:, :, ::7])

    def g_tabT(s):
        s = jnp.clip(s, 0, T)
        pr = rec16_t[:, s]                       # (REC, P) lane gather
        recs = pr.reshape(REC, n_slices, 128).transpose(1, 0, 2)
        return jnp.sum(recs[:, :, ::7])

    def g_16rows(s):
        s = jnp.clip(s, 0, T)
        pr = rec16[s, :16]
        recs = pr.reshape(n_slices, 128, 16).transpose(0, 2, 1)
        return jnp.sum(recs[:, :, ::7])

    def g_bf16(s):
        s = jnp.clip(s, 0, T)
        pr = rec16.astype(jnp.bfloat16)[s]
        recs = pr.reshape(n_slices, 128, REC).transpose(0, 2, 1)
        return jnp.sum(recs[:, :, ::7].astype(jnp.f32)
                       if hasattr(jnp, 'f32') else
                       recs[:, :, ::7].astype(jnp.float32))

    def make_chunked(n_chunks):
        # G contiguous row-slices of the table (free slices, no relayout),
        # one fast-tier gather each with clamped needles, mask-selected.
        # Row count per gather drops G-fold; needles/channels unchanged.
        nc = -(-(T + 1) // n_chunks)

        def g(s):
            s = jnp.clip(s, 0, T)
            out = None
            for c in range(n_chunks):
                lo = c * nc
                sub = jax.lax.dynamic_slice_in_dim(
                    rec16, lo, min(nc, T + 1 - lo), 0)
                part = sub[jnp.clip(s - lo, 0, sub.shape[0] - 1)]
                out = part if out is None else jnp.where(
                    (s >= lo)[:, None], part, out)
            recs = out.reshape(n_slices, 128, REC).transpose(0, 2, 1)
            return jnp.sum(recs[:, :, ::7])

        return g

    # Packed rows: (T+1, REC) relaid to (rows/G, G*REC) once (outside the
    # timed body via device_put below), then ONE wide gather + G-way
    # group select. Measures the gather+select; the relayout is a
    # scene-build-time cost.
    GP = 8
    rows_p = -(-(T + 1) // GP) * GP
    rec_pad = jnp.concatenate(
        [rec16, jnp.zeros((rows_p - (T + 1), REC), jnp.float32)], axis=0)
    rec_packed = jax.device_put(
        jnp.asarray(np.asarray(rec_pad).reshape(rows_p // GP, GP * REC)))

    def g_packed(s):
        s = jnp.clip(s, 0, T)
        wide = rec_packed[s // GP]            # (P, GP*REC)
        grp = s % GP
        out = wide[:, :REC]
        for g in range(1, GP):
            out = jnp.where((grp == g)[:, None],
                            wide[:, g * REC:(g + 1) * REC], out)
        recs = out.reshape(n_slices, 128, REC).transpose(0, 2, 1)
        return jnp.sum(recs[:, :, ::7])

    # Full-needle variants: consume EVERY gathered element (jnp.sum of
    # the raw gather output) so XLA cannot narrow the needle set the
    # way the ``[:, :, ::7]`` consumption above lets it (7x). These are
    # the numbers that transfer in-engine (BASELINE.md round 4).
    def g_rows_full(s):
        s = jnp.clip(s, 0, T)
        return jnp.sum(rec16[s])

    # 48 separate 1-D gathers (table column-major): each table column is
    # (T+1,) f32 = 4 MB — small enough that the lowering may vectorize
    # where the 2-D row gather serializes per needle.
    rec_cols = [jax.device_put(jnp.asarray(np.asarray(rec16[:, r])))
                for r in range(REC)]

    def g_cols_full(s):
        s = jnp.clip(s, 0, T)
        return sum(jnp.sum(col[s]) for col in rec_cols)

    def g_laneT_full(s):
        s = jnp.clip(s, 0, T)
        return jnp.sum(rec16_t[:, s])

    probes = {"gather_only": g_plain,
              "rows_full": g_rows_full,
              "cols_full": g_cols_full,
              "laneT_full": g_laneT_full,
              "gather+transpose": g_transpose,
              "tabT_lane_gather": g_tabT,
              "gather16rows+t": g_16rows,
              "bf16_gather+t": g_bf16,
              "chunk4": make_chunked(4),
              "chunk8": make_chunked(8),
              "packed8": g_packed}
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(probes)
    for name in names:
        ms, comp = steady_ms(scan_probe(probes[name]))
        print({"probe": name, "ms": round(ms, 2), "compile_s": round(comp, 1)},
              flush=True)


if __name__ == "__main__":
    main()

"""Throughput probe for Mosaic's in-kernel dynamic gathers on TPU.

Measures the cost of the two per-element dynamic-select primitives that
lower inside a Pallas TPU kernel (both only at (8, 128) f32 tiles):

  * lane gather    — jnp.take_along_axis(t, idx, axis=1): out[s, l] =
    t[s, idx[s, l]]; 128-way dynamic select per element.
  * sublane gather — jnp.take_along_axis(t, idx, axis=0): out[s, l] =
    t[idx[s, l], l]; 8-way dynamic select per element.

XLA's HLO gather costs ~4.3 ns/index on this chip (tools/micro.py) —
the question is how many ops/cycle Mosaic's vector gather sustains,
which bounds a VMEM-resident PCF kernel (VERDICT r2 #1 / #10).

Run on hardware:  python tools/pallas_gather_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def make_kernel(k_ops: int, axis: int):
    dim = 128 if axis == 1 else 8

    def kernel(t_ref, i_ref, o_ref):
        t = t_ref[...]
        idx = i_ref[...]
        acc = jnp.zeros_like(t)
        # k_ops independent gathers. Index sets are distinct NON-SHIFT
        # permutations of idx (odd-multiplier scramble): a plain `idx+k`
        # lets the compiler rewrite take(t, idx+k) as take(roll(t,-k),
        # idx) and factor the whole sum into ONE gather of a summed
        # table (first version of this probe "measured" 19 gathers per
        # cycle that way).
        for k in range(k_ops):
            if dim == 128:
                ik = jnp.bitwise_and(idx * (2 * k + 1) + k, dim - 1)
            else:
                ik = jnp.mod(idx * (2 * k + 1) + k, dim)
            acc = acc + jnp.take_along_axis(t, ik, axis=axis)
        o_ref[...] = acc

    return kernel


def bench(axis: int, k_ops: int, n_blocks: int = 4096, reps: int = 20):
    t = jnp.asarray(np.random.rand(n_blocks * 8, 128), jnp.float32)
    dim = 128 if axis == 1 else 8
    idx = jnp.asarray(
        np.random.randint(0, dim, (n_blocks * 8, 128)), jnp.int32)

    fn = pl.pallas_call(
        make_kernel(k_ops, axis),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
    )
    fn = jax.jit(fn)
    out = fn(t, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(t, idx)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    total_ops = n_blocks * k_ops
    total_elems = total_ops * 8 * 128
    print(f"axis={axis} k={k_ops:3d}: {dt*1e3:7.3f} ms "
          f"-> {dt/total_ops*1e9:7.2f} ns/gather-op, "
          f"{dt/total_elems*1e12:7.2f} ps/elem "
          f"({total_elems/dt/1e9:6.2f} Gelem/s)")
    return dt


if __name__ == "__main__":
    for axis in (1, 0):
        name = "lane(axis=1,128-way)" if axis == 1 else "sublane(axis=0,8-way)"
        print(f"== {name} ==")
        for k in (1, 8, 32, 128):
            bench(axis, k)

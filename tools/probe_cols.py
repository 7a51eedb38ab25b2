#!/usr/bin/env python
"""A/B the (N,32) gathered-row column-extraction strategies on TPU.

The hot iteration's biggest single cost (profile 2026-08-19) is turning
the gathered (N, 32) corner rows into 32 (N,) component vectors: XLA
lowers naive rows[:, m] to 32 slice+reduce lane extractions (~1 ms/iter
at N=65536).  Candidate fixes measured here, each chained in a fori loop
with a drifting gather index so nothing hoists:

  naive   : pr[m] from rows[:, m] columns (current engine behavior)
  tbar    : optimization_barrier(rows.T) then sublane slices
  blend2d : bilinear blend in 2-D -> (N, 8), barrier .T, 8 slices
  blenddot: bilinear blend in 2-D -> (N, 8), transpose via I8 matmul
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

N = int(os.environ.get("PROF_POOL", "65536"))
Z = 65536


def marginal(name, mk_loop, i1=64, i2=512):
    f1, f2 = jax.jit(mk_loop(i1)), jax.jit(mk_loop(i2))
    ts = {}
    for key, f in (("a", f1), ("b", f2)):
        jax.block_until_ready(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        ts[key] = best
    dt = (ts["b"] - ts["a"]) / (i2 - i1)
    print(f"{name:34s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    table = random.normal(key, (Z, 32), jnp.float32)
    z0 = random.randint(key, (N,), 0, Z)
    c = random.uniform(key, (4, N), jnp.float32)
    c00, c01, c10, c11 = c[0], c[1], c[2], c[3]

    def consume(pr):
        # mimic phase_b: combine the 8 blended prims nonlinearly
        s = pr[0]
        for m in range(1, 8):
            s = s + pr[m] * pr[m - 1]
        return s

    def mk(extract):
        def mk_loop(K):
            def body(i, carry):
                z, acc = carry
                rows = table[z]
                pr = extract(rows)
                s = consume(pr)
                z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
                return (z, acc + s)
            return lambda: lax.fori_loop(0, K, body,
                                         (z0, jnp.zeros((N,), jnp.float32)))
        return mk_loop

    def ex_naive(rows):
        return [rows[:, m] * c00 + rows[:, 8 + m] * c01
                + rows[:, 16 + m] * c10 + rows[:, 24 + m] * c11
                for m in range(8)]

    def ex_tbar(rows):
        rt = jax.lax.optimization_barrier(rows.T)
        return [rt[m] * c00 + rt[8 + m] * c01
                + rt[16 + m] * c10 + rt[24 + m] * c11
                for m in range(8)]

    def ex_blend2d(rows):
        bl = (rows[:, 0:8] * c00[:, None] + rows[:, 8:16] * c01[:, None]
              + rows[:, 16:24] * c10[:, None] + rows[:, 24:32] * c11[:, None])
        bt = jax.lax.optimization_barrier(bl.T)
        return [bt[m] for m in range(8)]

    def ex_blenddot(rows):
        bl = (rows[:, 0:8] * c00[:, None] + rows[:, 8:16] * c01[:, None]
              + rows[:, 16:24] * c10[:, None] + rows[:, 24:32] * c11[:, None])
        eye = jnp.eye(8, dtype=jnp.float32)
        bt = jax.lax.dot_general(eye, bl, (((1,), (1,)), ((), ())))  # (8, N)
        return [bt[m] for m in range(8)]

    marginal("gather + naive cols", mk(ex_naive))
    marginal("gather + barrier-T cols", mk(ex_tbar))
    marginal("gather + blend2d + barrier-T", mk(ex_blend2d))
    marginal("gather + blend2d + I8 dot", mk(ex_blenddot))

    # floor: gather alone
    def mk_g(K):
        def body(i, carry):
            z, acc = carry
            rows = table[z]
            s = jnp.sum(rows, axis=1)
            z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
            return (z, acc + s)
        return lambda: lax.fori_loop(0, K, body,
                                     (z0, jnp.zeros((N,), jnp.float32)))
    marginal("gather + row-sum (floor)", mk_g)


if __name__ == "__main__":
    main()

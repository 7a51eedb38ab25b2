#!/usr/bin/env python
"""Isolate the (N,32)-to-32x(N,) column extraction cost (no gather).

In production the extraction is SYNC VPU work on the hot path while the
gather DMA overlaps, so its cost matters even though gather-bound toys
hide it.  Strategies:

  naive    : rows[:, m] slices (what XLA lowers to slice+reduce relayouts)
  barrierT : optimization_barrier(rows.T) then sublane slices
  dotT     : (32,N) = I32 @ rows^T via dot_general on the MXU
  reshape  : rows.reshape into lane-major chunks (bitcast-like)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

N = int(os.environ.get("PROF_POOL", "65536"))


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
    print(f"{name:36s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    rows0 = random.normal(key, (N, 32), jnp.float32)
    c = random.uniform(key, (4, N), jnp.float32)
    c00, c01, c10, c11 = c[0], c[1], c[2], c[3]

    def consume(pr, rows_like):
        s = pr[0]
        for m in range(1, 8):
            s = s + pr[m] * pr[m - 1]
        # drift rows so the loop can't hoist: add s back into the array
        return s

    def mk(extract):
        def mk_loop(K):
            def body(i, carry):
                rows, acc = carry
                pr = extract(rows)
                s = consume(pr, rows)
                rows = rows + s[:, None] * 1e-12
                return (rows, acc + s)
            return lambda: lax.fori_loop(
                0, K, body, (rows0, jnp.zeros((N,), jnp.float32)))
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

    def ex_dott(rows):
        eye = jnp.eye(32, dtype=jnp.float32)
        rt = jax.lax.dot_general(eye, rows, (((1,), (1,)), ((), ())))
        return [rt[m] * c00 + rt[8 + m] * c01
                + rt[16 + m] * c10 + rt[24 + m] * c11
                for m in range(8)]

    def ex_blend_dott(rows):
        bl = (rows[:, 0:8] * c00[:, None] + rows[:, 8:16] * c01[:, None]
              + rows[:, 16:24] * c10[:, None] + rows[:, 24:32] * c11[:, None])
        eye = jnp.eye(8, dtype=jnp.float32)
        bt = jax.lax.dot_general(eye, bl, (((1,), (1,)), ((), ())))
        return [bt[m] for m in range(8)]

    marginal("naive col slices", mk(ex_naive))
    marginal("barrier transpose", mk(ex_tbar))
    marginal("I32 dot transpose", mk(ex_dott))
    marginal("blend2d + I8 dot transpose", mk(ex_blend_dott))


if __name__ == "__main__":
    main()

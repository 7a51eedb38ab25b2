#!/usr/bin/env python
"""Cost model for compaction primitives on TPU (marginal-timed).

Decides whether a compacted crossing-lanes corner-row refresh can beat
the pool-wide (N,32) gather (~0.57 ms at N=65536): the compacted path
pays cumsum + slot-scatter + K-row gather + K-row scatter-back.

  cumsum N               : prefix sum over the need mask
  slot scatter N->K      : compact_idx's .at[slot].set(lane)
  row gather K x32       : corner_rows[zg] at K indices
  row scatter K x32      : frow.at[sidx].set(rows) as ONE (N,32) row scatter
  33 field scatters K->N : the current per-component .at[].set form
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

N = int(os.environ.get("PROF_POOL", "65536"))
K = int(os.environ.get("PROF_K", "8192"))
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
    print(f"{name:36s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    table = random.normal(key, (Z, 32), jnp.float32)
    need0 = random.uniform(key, (N,)) < (K / N) * 0.8
    zs = random.randint(key, (N,), 0, Z)
    rows_g0 = random.normal(key, (K, 32), jnp.float32)
    frow0 = random.normal(key, (N, 32), jnp.float32)
    sidx0 = random.randint(key, (K,), 0, N)

    def mk_cumsum(Kn):
        def body(i, carry):
            m, acc = carry
            r = jnp.cumsum(m.astype(jnp.int32))
            m = m ^ (r[-1] % 2 == 0)
            return (m, acc + r[0])
        return lambda: lax.fori_loop(0, Kn, body, (need0, jnp.zeros((), jnp.int32)))
    marginal("cumsum N", mk_cumsum)

    lane = lax.broadcasted_iota(jnp.int32, (N,), 0)

    def mk_slot(Kn):
        def body(i, carry):
            m, acc = carry
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            slot = jnp.where(m & (rank < K), rank, K)
            idx = jnp.full((K,), N, jnp.int32).at[slot].set(lane, mode="drop")
            m = m ^ (idx[0] % 2 == 0)
            return (m, acc + idx[1])
        return lambda: lax.fori_loop(0, Kn, body, (need0, jnp.zeros((), jnp.int32)))
    marginal("compact_idx (cumsum+slot scatter)", mk_slot)

    def mk_gatherK(Kn):
        def body(i, carry):
            z, acc = carry
            rows = table[z[:K]]
            s = jnp.sum(rows[:, 0])
            z = jnp.clip(z + (s > 0), 0, Z - 1)
            return (z, acc + s)
        return lambda: lax.fori_loop(0, Kn, body, (zs, jnp.zeros((), jnp.float32)))
    marginal(f"row gather K={K} x32", mk_gatherK)

    def mk_rowscatter(Kn):
        def body(i, carry):
            fr, acc = carry
            fr = fr.at[sidx0].set(rows_g0 + acc, mode="drop")
            return (fr, acc + fr[0, 0])
        return lambda: lax.fori_loop(0, Kn, body, (frow0, jnp.zeros((), jnp.float32)))
    marginal(f"ONE (N,32) row scatter K={K}", mk_rowscatter)

    frow_t0 = tuple(frow0[:, m] for m in range(32))

    def mk_fieldscatters(Kn):
        def body(i, carry):
            frs, acc = carry
            frs = tuple(
                frs[m].at[sidx0].set(rows_g0[:, m] + acc, mode="drop")
                for m in range(32)
            )
            return (frs, acc + frs[0][0])
        return lambda: lax.fori_loop(0, Kn, body, (frow_t0, jnp.zeros((), jnp.float32)))
    marginal(f"32 field scatters K={K}", mk_fieldscatters)

    # one field gather K from N (the gi reads)
    w0 = random.normal(key, (N,), jnp.float32)

    def mk_fieldgather(Kn):
        def body(i, carry):
            s, acc = carry
            v = w0[sidx0] + s
            return (jnp.sum(v), acc + s)
        return lambda: lax.fori_loop(0, Kn, body,
                                     (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))
    marginal(f"1 field gather K={K}", mk_fieldgather)


if __name__ == "__main__":
    main()

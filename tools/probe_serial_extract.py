#!/usr/bin/env python
"""Gather + column extraction with the ENGINE's serial dependency chain.

probe_cols.py times gather+extraction with a drifting index that does NOT
depend on the extracted values, so consecutive iterations pipeline and the
extraction hides under the gather DMA.  The real hot loop is strictly
serial (z_{i+1} <- phase_a(phase_b(gather_i)) ), so nothing overlaps.
This probe chains the dependency: the next gather index is a function of
the extracted columns, as in the engine.

Strategies:
  naive    : pr[m] from rows[:, m] lane-strided columns (engine today)
  tbar     : rowsT = barrier(rows.T), then sublane slices rowsT[m]
  dotT     : rowsT = eye32 @ rows^T on the MXU, then sublane slices
  takeT    : gather from the TRANSPOSED table T[:, z] -> (32, N) directly
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
    print(f"{name:36s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    table = random.normal(key, (Z, 32), jnp.float32)
    tableT = jnp.asarray(table.T)  # (32, Z)
    c = random.uniform(random.fold_in(key, 1), (4, N), jnp.float32)
    c00, c01, c10, c11 = c[0], c[1], c[2], c[3]
    z0 = random.randint(random.fold_in(key, 2), (N,), 0, Z, jnp.int32)

    def consume(cols):
        """Blend like the engine, then a per-lane value that feeds z."""
        pr = [cols[m] * c00 + cols[8 + m] * c01
              + cols[16 + m] * c10 + cols[24 + m] * c11
              for m in range(8)]
        s = pr[0]
        for m in range(1, 8):
            s = s + pr[m] * jnp.float32(0.125)
        return s

    def mk(fetch_cols):
        def mk_loop(K):
            def body(i, zc):
                z, acc = zc
                cols = fetch_cols(z)
                s = consume(cols)
                # next index depends on s -> strictly serial like the engine
                z = (z + (s.astype(jnp.int32) & 0x3FF)) % Z
                return (z, acc + s)
            return lambda: lax.fori_loop(
                0, K, body, (z0, jnp.zeros((N,), jnp.float32)))
        return mk_loop

    def f_naive(z):
        rows = table[z]
        return [rows[:, m] for m in range(32)]

    def f_tbar(z):
        rows = table[z]
        rt = jax.lax.optimization_barrier(rows.T)
        return [rt[m] for m in range(32)]

    def f_dott(z):
        rows = table[z]
        eye = jnp.eye(32, dtype=jnp.float32)
        rt = jax.lax.dot_general(eye, rows, (((1,), (1,)), ((), ())))
        return [rt[m] for m in range(32)]

    def f_taket(z):
        rt = jnp.take(tableT, z, axis=1)  # (32, N)
        return [rt[m] for m in range(32)]

    marginal("serial gather + naive cols", mk(f_naive))
    marginal("serial gather + barrier-T", mk(f_tbar))
    marginal("serial gather + I32-dot-T", mk(f_dott))
    marginal("serial transposed-table take", mk(f_taket))


if __name__ == "__main__":
    main()

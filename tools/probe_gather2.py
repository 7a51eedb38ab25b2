#!/usr/bin/env python
"""Measure the production VMEM gather (ops/gather.vmem_row_gather) vs the
XLA HBM gather at the transport hot-loop shape — chained with drifting
indices so nothing hoists."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

from grmonty_tpu.ops import gather

N = int(os.environ.get("PROF_POOL", "65536"))
Z = int(os.environ.get("PROF_Z", "65536"))


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

    def mk(gf):
        def mk_loop(K):
            def body(i, carry):
                z, acc = carry
                rows = gf(table, z)
                s = jnp.sum(rows, axis=1)
                z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
                return (z, acc + s)
            return lambda: lax.fori_loop(0, K, body,
                                         (z0, jnp.zeros((N,), jnp.float32)))
        return mk_loop

    marginal("xla hbm gather", mk(lambda t, z: t[z]))
    marginal("pallas vmem gather", mk(gather.vmem_row_gather))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Is the hot-loop row gather latency-bound (overlappable) or
throughput-bound (a hard floor)?

Times, at the hot-loop shape (N indices into a (65536, 32) f32 table,
fori-marginal so dispatch cost cancels):

  1. one dependent N=65536 gather per iteration         (the engine today)
  2. two independent N=32768 gathers per iteration      (split pool halves)
  3. four independent N=16384 gathers per iteration
  4. one N=65536 gather + an independent VPU FMA chain sized like the
     hot step's phase-b compute (~0.2 ms)                (compute hiding)

If (2)/(3) beat (1), the gather is latency-bound and a pipelined
half-pool hot step buys the difference.  If (4) ~= (1), XLA already
overlaps independent compute with the gather and restructuring the hot
step to interleave two half-pools gets the compute for free.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

N = 65536
Z = 65536


def marginal(name, mk_loop, i1=64, i2=256):
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
    print(f"{name:44s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    table = random.normal(key, (Z, 32), jnp.float32)
    z_full = random.randint(key, (N,), 0, Z, jnp.int32)

    # 1. single dependent gather
    def mk_one(K):
        def body(i, carry):
            z, acc = carry
            rows = table[z]
            s = jnp.sum(rows, axis=1)
            z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
            return (z, acc + s)
        return lambda: lax.fori_loop(0, K, body,
                                     (z_full, jnp.zeros((N,), jnp.float32)))
    marginal("1x dependent gather N=65536", mk_one)

    # 2./3. k independent gathers of N/k
    for k in (2, 4):
        H = N // k
        zs = [z_full[c * H:(c + 1) * H] for c in range(k)]

        def mk_split(K, zs=zs, H=H, k=k):
            def body(i, carry):
                zt, acc = carry
                outs = []
                for c in range(k):
                    rows = table[zt[c]]
                    outs.append(jnp.sum(rows, axis=1))
                znew = tuple(
                    jnp.clip(zt[c] + (outs[c] > 0).astype(jnp.int32), 0, Z - 1)
                    for c in range(k))
                return (znew, acc + sum(o.sum() for o in outs))
            return lambda: lax.fori_loop(
                0, K, body, (tuple(zs), jnp.zeros((), jnp.float32)))
        marginal(f"{k}x independent gathers N={H}", mk_split)

    # 4. gather + independent compute chain
    v = random.normal(key, (N,), jnp.float32)

    def mk_mixed(K, depth=48):
        def body(i, carry):
            z, acc, u = carry
            rows = table[z]
            s = jnp.sum(rows, axis=1)
            z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
            # independent VPU chain (transcendental-ish, like phase_b)
            for _ in range(depth):
                u = u * 1.000001 + 0.5 / (jnp.abs(u) + 1.0)
            return (z, acc + s, u)
        return lambda: lax.fori_loop(
            0, K, body, (z_full, jnp.zeros((N,), jnp.float32), v))
    marginal("gather + independent FMA chain d=48", mk_mixed)

    # compute chain alone, for the d=48 cost
    def mk_chain(K, depth=48):
        def body(i, u):
            for _ in range(depth):
                u = u * 1.000001 + 0.5 / (jnp.abs(u) + 1.0)
            return u
        return lambda: lax.fori_loop(0, K, body, v)
    marginal("FMA chain alone d=48", mk_chain)


if __name__ == "__main__":
    main()

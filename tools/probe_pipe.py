#!/usr/bin/env python
"""Would a two-half-pool software-pipelined hot step hide the corner
gather behind compute?

The hot iteration is a strict serial chain per lane: phase_a (push) ->
corner gather at the new cell -> phase_b (interaction physics).  At
pool=65536 the gather costs ~0.26 ms (4 overlapped sub-gathers,
tools/probe_overlap.py) and the compute ~0.2 ms — a serial sum of
~0.46 ms.  But lanes are independent: splitting the pool into two halves
H0/H1 gives two independent a->g->b chains, and XLA's scheduler may
overlap H0's gather DMA with H1's VPU work, bounding the iteration by
max(gather_total, compute_total) instead of the sum.

Cases (marginal fori-loop timing, N total lanes, (Z, W) f32 table):
  A. serial:      a -> gather -> b at full width        (the engine today)
  B. two halves:  independent (a -> gather -> b) chains  (the candidate)
  C. four quarters, same idea
  D. compute-only at full width (a -> b), for the floor

Each stage is an FMA/transcendental chain sized to the measured phase
costs (a ~0.03 ms, b ~0.15 ms at N=65536 — README hot-iteration
attribution).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

N = int(os.environ.get("PIPE_N", "65536"))
Z = int(os.environ.get("PIPE_Z", "65536"))
W = int(os.environ.get("PIPE_W", "44"))
DEPTH_A = int(os.environ.get("PIPE_DEPTH_A", "8"))
DEPTH_B = int(os.environ.get("PIPE_DEPTH_B", "40"))
SPLIT_G = int(os.environ.get("PIPE_SPLIT_G", "4"))  # engine gather_split


def chain(u, depth):
    for _ in range(depth):
        u = u * 1.000001 + 0.5 / (jnp.abs(u) + 1.0)
    return u


def sub_gather(table, z):
    """The engine's split gather: SPLIT_G independent index slices."""
    n = z.shape[0]
    s = SPLIT_G if n % SPLIT_G == 0 else 1
    h = n // s
    return jnp.concatenate([table[z[c * h:(c + 1) * h]] for c in range(s)],
                           axis=0)


def one_chain(table, z, u):
    """a -> gather -> b for one lane set."""
    ua = chain(u, DEPTH_A)
    zn = jnp.clip(z + (ua > 0).astype(jnp.int32), 0, Z - 1)
    rows = sub_gather(table, zn)
    ub = chain(ua + jnp.sum(rows, axis=1), DEPTH_B)
    return zn, ub


def marginal(name, mk_loop, i1=32, i2=160):
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
    print(f"{name:48s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    key = random.PRNGKey(0)
    table = random.normal(key, (Z, W), jnp.float32)
    z0 = random.randint(key, (N,), 0, Z, jnp.int32)
    u0 = random.normal(key, (N,), jnp.float32)

    def mk_serial(K):
        def body(i, c):
            z, u = c
            return one_chain(table, z, u)
        return lambda: lax.fori_loop(0, K, body, (z0, u0))
    marginal(f"A serial full-width N={N}", mk_serial)

    for parts in (2, 4):
        H = N // parts
        zs = tuple(z0[c * H:(c + 1) * H] for c in range(parts))
        us = tuple(u0[c * H:(c + 1) * H] for c in range(parts))

        def mk_halves(K, zs=zs, us=us, parts=parts):
            def body(i, c):
                zt, ut = c
                outs = [one_chain(table, zt[p], ut[p]) for p in range(parts)]
                return (tuple(o[0] for o in outs), tuple(o[1] for o in outs))
            return lambda: lax.fori_loop(0, K, body, (zs, us))
        marginal(f"B {parts} independent half-chains H={H}", mk_halves)

    def mk_compute(K):
        def body(i, u):
            return chain(chain(u, DEPTH_A), DEPTH_B)
        return lambda: lax.fori_loop(0, K, body, u0)
    marginal("D compute only (a+b chains)", mk_compute)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe the TPU cost model for the transport engine's hot primitives.

Measures, on the current accelerator:
  * dynamic row gathers (the bilinear-stencil fetch) at several widths
  * the same gather via a Pallas kernel with the table resident in VMEM
  * (N, 8) -> (8, N) relayout (the corner-blend transpose)
  * a one-hot matmul gather for small tables

Prints one JSON line per experiment.  Diagnostic tool only — not part of
the production path.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import random


def timed(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3  # ms


def main():
    n = 65536
    z = 65536  # table rows (256x256 zones)
    key = random.PRNGKey(0)
    idx = random.randint(key, (n,), 0, z - 2, jnp.int32)
    idx_sorted = jnp.sort(idx)

    results = {}

    for width in (8, 16, 32, 64, 128, 216, 256):
        table = random.normal(key, (z, width), jnp.float32)
        f = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
        ms = timed(f, table, idx)
        results[f"xla_gather_w{width}_ms"] = round(ms, 4)

    # half the indices (does cost scale with index count?)
    table = random.normal(key, (z, 216), jnp.float32)
    f = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
    results["xla_gather_w216_n32k_ms"] = round(timed(f, table, idx[: n // 2]), 4)

    table32 = random.normal(key, (z, 32), jnp.float32)
    f = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
    results["xla_gather_w32_sorted_ms"] = round(timed(f, table32, idx_sorted), 4)

    # 4 separate narrow gathers (the pre-corner-table design)
    table8 = random.normal(key, (z, 8), jnp.float32)

    def four(t, i):
        return (t[i] + t[i + 1] + t[jnp.minimum(i + 256, z - 1)]
                + t[jnp.minimum(i + 257, z - 1)]).sum(axis=1)

    results["xla_gather_4x_w8_ms"] = round(timed(jax.jit(four), table8, idx), 4)

    # relayout (N, 8) -> (8, N)
    m = random.normal(key, (n, 8), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a.T * 2.0, axis=1))
    results["relayout_n8_T_ms"] = round(timed(f, m), 4)

    m32 = random.normal(key, (n, 32), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a.T * 2.0, axis=1))
    results["relayout_n32_T_ms"] = round(timed(f, m32), 4)

    # gather keeping everything in (N, w) layout, no transpose
    def gather_blend_rowmajor(t, i):
        rows = t[i]  # (N, 32)
        c = jnp.linspace(0.1, 0.9, 8, dtype=jnp.float32)
        p = rows[:, 0:8] * 0.3 + rows[:, 8:16] * 0.2 + rows[:, 16:24] * 0.4 + rows[:, 24:32] * 0.1
        return p @ c  # (N,)

    results["gather_blend_rowmajor_ms"] = round(
        timed(jax.jit(gather_blend_rowmajor), table32, idx), 4)

    def gather_blend_T(t, i):
        rows = t[i]
        p = (rows[:, 0:8] * 0.3 + rows[:, 8:16] * 0.2
             + rows[:, 16:24] * 0.4 + rows[:, 24:32] * 0.1).T  # (8, N)
        return p[0] + p[1] * p[2]

    results["gather_blend_T_ms"] = round(timed(jax.jit(gather_blend_T), table32, idx), 4)

    # Pallas: table resident in VMEM, per-block gather with jnp.take
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = 2048

        def kernel(idx_ref, table_ref, out_ref):
            ids = idx_ref[:]  # (BLK,)
            rows = jnp.take(table_ref[:], ids, axis=0)  # (BLK, 32)
            out_ref[:] = jnp.sum(rows, axis=1)

        @jax.jit
        def pallas_gather(table, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((z, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            )(idx, table)

        results["pallas_vmem_take_ms"] = round(timed(pallas_gather, table32, idx), 4)
    except Exception as e:  # noqa: BLE001
        results["pallas_vmem_take_err"] = f"{type(e).__name__}: {e}"[:200]

    # Pallas: gather via 8-bit one-hot... skip; instead try dynamic slice loop
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = 2048

        def kernel2(idx_ref, table_ref, out_ref):
            def body(i, acc):
                row = table_ref[idx_ref[i], :]  # (32,)
                return acc.at[i].set(jnp.sum(row))
            out = jax.lax.fori_loop(0, BLK, body, jnp.zeros((BLK,), jnp.float32))
            out_ref[:] = out

        @jax.jit
        def pallas_loop(table, idx):
            return pl.pallas_call(
                kernel2,
                out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((z, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            )(idx, table)

        results["pallas_vmem_looprow_ms"] = round(timed(pallas_loop, table32, idx), 4)
    except Exception as e:  # noqa: BLE001
        results["pallas_vmem_looprow_err"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(results))


if __name__ == "__main__":
    main()

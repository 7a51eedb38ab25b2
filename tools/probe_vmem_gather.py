#!/usr/bin/env python
"""Marginal-timing probe of gather strategies for the fluid corner fetch.

The transport hot step is gather-bound: one (N,)-index row gather from the
(Z, 32) corner table costs ~9 ns/index through XLA (probe_push.py), 75% of
the hot iteration.  This probe times alternatives with the fixed dispatch
cost cancelled (two fori_loop lengths):

  * xla      — baseline jnp row gather from HBM
  * xla_sort — same gather with pre-sorted indices (coalescing test)
  * pallas   — jnp.take inside a Pallas kernel, table resident in VMEM
  * pallas_ds— per-row dynamic-slice fori_loop inside Pallas, VMEM table

Prints one JSON line.  Diagnostic tool only.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    n = int(os.environ.get("PROBE_N", "65536"))
    z = int(os.environ.get("PROBE_Z", "65536"))
    w = int(os.environ.get("PROBE_W", "32"))
    dt = jnp.float32
    key = random.PRNGKey(0)
    table = random.normal(key, (z, w), dt)
    idx0 = random.randint(key, (n,), 0, z - 1, jnp.int32)

    def timed(make_body, reps=5):
        def chain(iters):
            @jax.jit
            def g(acc):
                def body(i, acc):
                    return make_body(acc)
                return lax.fori_loop(0, iters, body, acc)
            return g

        acc0 = jnp.zeros((n,), dt)

        def best(g):
            out = g(acc0)
            jax.block_until_ready(out)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = g(acc0)
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s = best(chain(16))
        t_l = best(chain(128))
        return (t_l - t_s) / (128 - 16) * 1e3

    results = {"n": n, "z": z, "w": w}

    # indices must depend on the carry so the gather can't be hoisted
    def vary_idx(acc):
        return jnp.minimum(idx0 + (acc.astype(jnp.int32) & 1), z - 1)

    def xla_body(acc):
        rows = table[vary_idx(acc)]
        return acc + jnp.sum(rows, axis=1) * 1e-20

    def emit(k, v):
        results[k] = v
        print(f"  {k}: {v}", file=sys.stderr, flush=True)

    emit("xla_ms", round(timed(xla_body), 4))

    idx_sorted = jnp.sort(idx0)

    def xla_sorted_body(acc):
        i = jnp.minimum(idx_sorted + (acc.astype(jnp.int32) & 1), z - 1)
        rows = table[i]
        return acc + jnp.sum(rows, axis=1) * 1e-20

    emit("xla_sorted_ms", round(timed(xla_sorted_body), 4))

    # Barrier the gather so it stays a standalone gather thunk instead of
    # being folded into the surrounding loop fusion (where XLA emulates it
    # element-at-a-time; the standalone op is ~8x faster per probe_gather).
    def xla_barrier_body(acc):
        i = lax.optimization_barrier(vary_idx(acc))
        rows = lax.optimization_barrier(table[i])
        return acc + jnp.sum(rows, axis=1) * 1e-20

    emit("xla_barrier_ms", round(timed(xla_barrier_body), 4))

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = int(os.environ.get("PROBE_BLK", "8192"))

        def take_kernel(idx_ref, table_ref, out_ref):
            rows = jnp.take(table_ref[:], idx_ref[:], axis=0)  # (BLK, w)
            out_ref[:] = jnp.sum(rows, axis=1)

        @jax.jit
        def pallas_take(idx):
            return pl.pallas_call(
                take_kernel,
                out_shape=jax.ShapeDtypeStruct((n,), dt),
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((z, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=z * w * 4 + 8 * BLK * 4 + (1 << 20),
                ),
            )(idx, table)

        def pallas_body(acc):
            s = pallas_take(vary_idx(acc))
            return acc + s * 1e-20

        emit("pallas_take_ms", round(timed(pallas_body), 4))
    except Exception as e:  # noqa: BLE001
        results["pallas_take_err"] = f"{type(e).__name__}: {e}"[:300]

    # take_along_axis form: rank-matched indices (the jnp.take form above
    # fails Mosaic's gather lowering with a rank mismatch).
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = int(os.environ.get("PROBE_BLK", "8192"))

        def taa_kernel(idx_ref, table_ref, out_ref):
            idx2 = jax.lax.broadcast_in_dim(
                idx_ref[:], (BLK, w), (0,))
            rows = jnp.take_along_axis(table_ref[:], idx2, axis=0)
            out_ref[:] = jnp.sum(rows, axis=1)

        @jax.jit
        def pallas_taa(idx):
            return pl.pallas_call(
                taa_kernel,
                out_shape=jax.ShapeDtypeStruct((n,), dt),
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((z, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=z * w * 4 + 8 * BLK * 4 + (1 << 20),
                ),
            )(idx, table)

        def taa_body(acc):
            s = pallas_taa(vary_idx(acc))
            return acc + s * 1e-20

        emit("pallas_taa_ms", round(timed(taa_body), 4))
    except Exception as e:  # noqa: BLE001
        results["pallas_taa_err"] = f"{type(e).__name__}: {e}"[:300]

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = int(os.environ.get("PROBE_BLK", "8192"))

        def ds_kernel(idx_ref, table_ref, out_ref):
            # Row-vector loop: dynamic (1, w) sublane loads + static stores
            # (a scalar store to VMEM is unsupported; row stores are fine).
            def body(i, _):
                r = pl.load(table_ref, (pl.ds(idx_ref[i], 1), slice(None)))
                pl.store(out_ref, (pl.ds(i, 1), slice(None)), r)
                return 0
            lax.fori_loop(0, BLK, body, 0, unroll=8)

        @jax.jit
        def pallas_ds(idx):
            return pl.pallas_call(
                ds_kernel,
                out_shape=jax.ShapeDtypeStruct((n, w), dt),
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((z, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=z * w * 4 + 2 * BLK * w * 4 + (1 << 20),
                ),
            )(idx, table)

        def ds_body(acc):
            rows = pallas_ds(vary_idx(acc))
            return acc + jnp.sum(rows, axis=1) * 1e-20

        emit("pallas_ds_ms", round(timed(ds_body), 4))
    except Exception as e:  # noqa: BLE001
        results["pallas_ds_err"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps(results))


if __name__ == "__main__":
    main()

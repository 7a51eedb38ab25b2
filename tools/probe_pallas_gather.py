#!/usr/bin/env python
"""Pallas VMEM-gather probe: can a VMEM-resident table beat the 0.55 ms
XLA HBM row gather that bounds the transport hot step?

Variants (all 2D-shaped for Mosaic):
  * take1   — one grid step, whole pool: jnp.take on the (Z, W) VMEM table
  * takeB   — grid over (N/BLK) blocks, jnp.take per block
  * dsB     — per-row dynamic-slice copy loop per block (idx via SMEM)

Each prints the marginal per-call cost with dispatch cancelled by chaining
inside fori_loop at two lengths.  Diagnostic tool only.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(os.environ.get("PROBE_N", "65536"))
    z = int(os.environ.get("PROBE_Z", "65536"))
    w = 32
    BLK = int(os.environ.get("PROBE_BLK", "8192"))
    dt = jnp.float32
    key = random.PRNGKey(0)
    table = random.normal(key, (z, w), dt)
    idx0 = random.randint(key, (n,), 0, z - 1, jnp.int32)

    results = {"n": n, "z": z, "w": w, "blk": BLK}

    def emit(k, v):
        results[k] = v
        print(f"  {k}: {v}", file=sys.stderr, flush=True)

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

        t_s = best(chain(8))
        t_l = best(chain(40))
        return (t_l - t_s) / (40 - 8) * 1e3

    def vary_idx(acc):
        return jnp.minimum(idx0 + (acc.astype(jnp.int32) & 1), z - 1)

    # ---- take1: single grid step, whole pool ---------------------------
    def take1_kernel(idx_ref, table_ref, out_ref):
        rows = jnp.take(table_ref[:], idx_ref[0, :], axis=0)  # (n, w)
        out_ref[0, :] = jnp.sum(rows, axis=1)

    @jax.jit
    def take1(idx):
        return pl.pallas_call(
            take1_kernel,
            out_shape=jax.ShapeDtypeStruct((1, n), dt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(z * w * 4 + n * w * 4 + (8 << 20)),
            ),
        )(idx.reshape(1, n), table)[0]

    try:
        emit("take1_ms", round(timed(lambda acc: acc + take1(vary_idx(acc)) * 1e-20), 4))
    except Exception as e:  # noqa: BLE001
        emit("take1_err", f"{type(e).__name__}: {e}"[:300])

    # ---- takeB: grid over blocks --------------------------------------
    def takeB_kernel(idx_ref, table_ref, out_ref):
        rows = jnp.take(table_ref[:], idx_ref[0, :], axis=0)  # (BLK, w)
        out_ref[0, :] = jnp.sum(rows, axis=1)

    @jax.jit
    def takeB(idx):
        return pl.pallas_call(
            takeB_kernel,
            out_shape=jax.ShapeDtypeStruct((n // BLK, BLK), dt),
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((z, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(z * w * 4 + 4 * BLK * w * 4 + (4 << 20)),
            ),
        )(idx.reshape(n // BLK, BLK), table).reshape(n)

    try:
        emit("takeB_ms", round(timed(lambda acc: acc + takeB(vary_idx(acc)) * 1e-20), 4))
    except Exception as e:  # noqa: BLE001
        emit("takeB_err", f"{type(e).__name__}: {e}"[:300])

    # ---- dsB: explicit row-copy loop, idx in SMEM ---------------------
    def dsB_kernel(idx_ref, table_ref, out_ref, rows_ref):
        def body(i, _):
            rows_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[0, i], 1), :]
            return 0
        lax.fori_loop(0, BLK, body, 0)
        out_ref[0, :] = jnp.sum(rows_ref[:], axis=1)

    @jax.jit
    def dsB(idx):
        return pl.pallas_call(
            dsB_kernel,
            out_shape=jax.ShapeDtypeStruct((n // BLK, BLK), dt),
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((z, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BLK, w), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(z * w * 4 + 4 * BLK * w * 4 + (4 << 20)),
            ),
        )(idx.reshape(n // BLK, BLK), table).reshape(n)

    try:
        emit("dsB_ms", round(timed(lambda acc: acc + dsB(vary_idx(acc)) * 1e-20), 4))
    except Exception as e:  # noqa: BLE001
        emit("dsB_err", f"{type(e).__name__}: {e}"[:300])

    print(json.dumps(results))


if __name__ == "__main__":
    main()

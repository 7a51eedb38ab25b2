#!/usr/bin/env python
"""Is the TPU row-gather cost per-index or per-byte?

Times (N,)-index row gathers from (Z, W) tables for W in {4, 8, 16, 32}
and dtypes f32/bf16, with the fixed dispatch cost cancelled via two
fori_loop lengths.  If the 8.6 ns/row cost is per-index, shrinking or
bf16-ing the corner rows buys nothing; if per-byte, the hot-loop corner
table (engine ROW layout, 32 x f32) can be halved.  Diagnostic only.
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

    n = int(os.environ.get("PROBE_N", "65536"))
    z = 65536
    key = random.PRNGKey(0)
    idx = random.randint(key, (n,), 0, z - 1, jnp.int32)

    def timed(f, reps=5):
        f(idx).block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(idx).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = {"n": n, "z": z}
    for w in (4, 8, 16, 32):
        for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            table = random.normal(key, (z, w), jnp.float32).astype(dt)

            def chain(iters):
                @jax.jit
                def f(i0):
                    def body(j, acc):
                        g = table[(i0 + j) % z]
                        return acc + g.astype(jnp.float32).sum()
                    return lax.fori_loop(0, iters, body, jnp.float32(0))
                return f

            t8 = timed(chain(8))
            t32 = timed(chain(32))
            out[f"w{w}_{name}_ms"] = round((t32 - t8) / 24 * 1e3, 4)

    # Does the cost depend on TABLE footprint (VMEM-resident vs HBM)?
    # A (zt, 32) f32 table is 128 B/row: zt=4096 -> 0.5 MB (VMEM-easy),
    # zt=65536 -> 8 MB.  If small tables gather much faster, a
    # low-footprint field representation beats row-width tricks.
    for zt in (1024, 4096, 16384, 65536):
        table = random.normal(key, (zt, 32), jnp.float32)
        idxt = random.randint(key, (n,), 0, zt - 1, jnp.int32)

        def chain(iters):
            @jax.jit
            def f(i0):
                def body(j, acc):
                    g = table[(i0 + j) % zt]
                    return acc + g.sum()
                return lax.fori_loop(0, iters, body, jnp.float32(0))
            return f

        t8 = timed(chain(8))
        t32 = timed(chain(32))
        out[f"z{zt}_w32_f32_ms"] = round((t32 - t8) / 24 * 1e3, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

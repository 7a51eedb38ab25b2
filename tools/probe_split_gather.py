#!/usr/bin/env python
"""Find the table-size cache threshold of the TPU row gather and time
split-table composites (k gathers from Z/k-row subtables + select) at the
hot-loop shape N=Z=65536, W=32 f32.
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

    for zz in (8192, 16384, 32768, 49152, 65536):
        z0 = random.randint(key, (N,), 0, zz)
        tz = table[:zz]

        def mk(K, tz=tz, z0=z0, zz=zz):
            def body(i, carry):
                z, acc = carry
                rows = tz[z]
                s = jnp.sum(rows, axis=1)
                z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, zz - 1)
                return (z, acc + s)
            return lambda: lax.fori_loop(0, K, body,
                                         (z0, jnp.zeros((N,), jnp.float32)))
        marginal(f"gather N={N} from Z={zz} ({zz*128//1024}KB)", mk)

    z0 = random.randint(key, (N,), 0, Z)
    for k in (2, 4):
        H = Z // k
        subs = [table[c * H:(c + 1) * H] for c in range(k)]

        def mk(K, subs=subs, H=H, k=k):
            def body(i, carry):
                z, acc = carry
                parts = [
                    subs[c][jnp.clip(z - c * H, 0, H - 1)] for c in range(k)
                ]
                sel = z // H
                rows = parts[0]
                for c in range(1, k):
                    rows = jnp.where((sel == c)[:, None], parts[c], rows)
                s = jnp.sum(rows, axis=1)
                z = jnp.clip(z + (s > 0).astype(jnp.int32), 0, Z - 1)
                return (z, acc + s)
            return lambda: lax.fori_loop(0, K, body,
                                         (z0, jnp.zeros((N,), jnp.float32)))
        marginal(f"{k}-way split gather Z={Z}", mk)


if __name__ == "__main__":
    main()

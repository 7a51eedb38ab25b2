#!/usr/bin/env python
"""Does the (4, N) component-stack layout cripple VPU sublane use?

The engine pool stores 4-vectors as (4, N) arrays; the TPU profile shows
them tiled T(4,128) and their row slices tiled T(1,128) — i.e. 4/8 and 1/8
of the VPU's 8 sublanes.  This probe times the same FMA/transcendental
chain three ways:

* tuple4:  four separate (N,) arrays (T(1024): all 8 sublanes)
* stack4:  one (4, N) array, rows sliced inside the jit
* row1:    (1, N) arrays (worst-case tiling)

If stack4/row1 are ~2-8x slower, the pool should carry 4-vectors as
separate (N,) component arrays.  Diagnostic only.
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
    key = random.PRNGKey(0)
    xs = [random.normal(random.fold_in(key, i), (n,), jnp.float32) + 3.0
          for i in range(4)]
    X = jnp.stack(xs)  # (4, N)
    R1 = [x[None, :] for x in xs]  # (1, N)

    def chain_math(a, b, c, d):
        # ~60 elementwise ops + 3 transcendentals, push_attempt-flavoured
        e = jnp.exp(a * 0.01)
        s = jnp.sin(b)
        t = a * b + c * d + e * s
        for _ in range(12):
            t = t * a + b
            t = t - c * d
        u = jnp.sqrt(jnp.abs(t) + 1.0)
        return t + u

    def run_tuple(a, b, c, d):
        def body(i, acc):
            return acc + chain_math(a + acc * 1e-9, b, c, d)
        return lax.fori_loop(0, 64, body, jnp.zeros_like(a))

    f_tuple = jax.jit(run_tuple)

    def run_stack(Xm):
        a, b, c, d = Xm[0], Xm[1], Xm[2], Xm[3]
        def body(i, acc):
            return acc + chain_math(a + acc * 1e-9, b, c, d)
        return lax.fori_loop(0, 64, body, jnp.zeros_like(a))

    f_stack = jax.jit(run_stack)

    def run_row1(a, b, c, d):
        def body(i, acc):
            return acc + chain_math(a + acc * 1e-9, b, c, d)
        return lax.fori_loop(0, 64, body, jnp.zeros_like(a))

    f_row1 = jax.jit(run_row1)

    def timed(f, *a, reps=5):
        out = f(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = {"n": n, "iters": 64}
    out["tuple4_ms"] = round(timed(f_tuple, *xs) * 1e3, 3)
    out["stack4_ms"] = round(timed(f_stack, X) * 1e3, 3)
    out["row1_ms"] = round(timed(f_row1, *R1) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Time the light phase vs the full periodic phase vs its pieces.

The round-2 micro bench showed slice_ms_per_iter 0.948 with hot_step only
0.436 — the pool-maintenance phases eat ~0.5 ms/iter amortized.  This
probe times light_phase / periodic_phase / spectrum_add-only / refill-only
in the mid-wave regime to locate the cost.  Knobs: MICRO_* as bench_micro.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine, profiles
    from grmonty_tpu.utils.logging import setup

    setup("warning")
    pool = int(os.environ.get("MICRO_POOL", "65536"))
    cfg = profiles.bench_config(pool=pool)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=256, n2=256)
    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=cfg, emit_chunk=pool * 8)
    plan = sim.plan()
    start = int(os.environ.get("MICRO_START", str(2 << 20)))
    if jax.default_backend() == "cpu":
        backlog = sim.emit_packed(plan, start, pool * 8)
    else:
        backlog, _ = sim.emit_packed_dev(plan, start, pool * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    state = sim._run_jit(state, backlog)
    state = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    jax.block_until_ready(state)

    def timed(f, *a, reps=5):
        out = f(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # fori-of-8 with folded keys so CSE can't collapse the calls; report per-call
    def loopify(phase_fn, needs_key=True):
        def body(i, s):
            if needs_key:
                s = s._replace(key=random.fold_in(s.key, i))
            return phase_fn(s, backlog)
        return jax.jit(lambda s: lax.fori_loop(0, 8, body, s))

    eng = sim.engine
    t_full = timed(loopify(eng["periodic_phase"]), state) / 8 * 1e3
    t_light = timed(loopify(eng["light_phase"], needs_key=False), state) / 8 * 1e3
    print({"full_phase_ms": round(t_full, 3),
           "light_phase_ms": round(t_light, 3)})


if __name__ == "__main__":
    main()

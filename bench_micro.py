#!/usr/bin/env python
"""Micro-benchmarks for the transport engine's hot pieces.

Prints ONE JSON line with the quantities the macro rate is built from
(reference analogue: ``benchmarks/ndarray_benchmark.cpp``):

* ``hot_step_ms``        — one full hot iteration (pool-wide) in the real
                           mid-wave regime
* ``lane_steps_per_sec`` — pool size / hot_step time
* ``periodic_ms``        — one periodic phase (scatter events, record,
                           refill) in the same regime
* ``push_rounds``        — batch-max halving rounds of one geodesic push
* ``slice_ms_per_iter``  — full engine run() amortized per iteration
                           (what the macro bench actually pays)

Env knobs: MICRO_POOL (65536), MICRO_DTYPE (float32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from jax import random

    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine
    from grmonty_tpu.utils.logging import setup

    setup("warning")
    pool = int(os.environ.get("MICRO_POOL", "65536"))
    dtype = (jnp.float32 if os.environ.get("MICRO_DTYPE", "float32") == "float32"
             else jnp.float64)

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=256, n2=256)

    cfg = engine.EngineConfig(
        n_pool=pool, m_period=int(os.environ.get("MICRO_PERIOD", "32")),
        sec_cap=pool, stall_steps=150000,
        dtype=dtype, fp_iters=int(os.environ.get("MICRO_FP_ITERS", "2")),
        interp_geom=os.environ.get("MICRO_INTERP", "0") == "1",
        dbg_skip=os.environ.get("MICRO_SKIP", ""),
        vmem_gather=os.environ.get("MICRO_VMEM_GATHER", "0") == "1",
        fluid_cache=os.environ.get("MICRO_FLUID_CACHE", "0") == "1",
        pallas_hot=os.environ.get("MICRO_PALLAS", "0") == "1",
        pallas_block=int(os.environ.get("MICRO_PALLAS_BLOCK", "8192")),
    )
    sim = driver.Simulation(dump, photon_n=500_000, mass_unit=4e19,
                            config=cfg, emit_chunk=pool * 8)
    plan = sim.plan()
    backlog = sim.emit_packed(plan, 0, pool * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    # advance into the real mid-wave regime
    state = sim._run_jit(state, backlog)
    state = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    jax.block_until_ready(state)

    def timed(f, *a, reps=3):
        out = f(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    # full slice (ground truth per-iteration cost); verify it actually ran
    # its full iteration budget with a loaded pool (a drained wave makes the
    # while_loop exit early and the number meaningless).
    t_slice, s_out = timed(
        lambda s: sim._run_jit(s._replace(it=jnp.zeros((), jnp.int32)), backlog),
        state,
    )
    slice_iters = int(s_out.it)
    occ_after = int(jax.device_get(s_out.pool.occupied.sum()))

    # hot_step marginal via two fori lengths
    from jax import lax
    hot = sim.engine["hot_step"]
    f64 = jax.jit(lambda s: lax.fori_loop(0, 64, lambda i, s_: hot(s_), s))
    f512 = jax.jit(lambda s: lax.fori_loop(0, 512, lambda i, s_: hot(s_), s))
    t64, _ = timed(f64, state)
    t512, _ = timed(f512, state)
    hot_ms = (t512 - t64) / (512 - 64) * 1e3

    per = jax.jit(sim.engine["periodic_phase"])
    f_p8 = jax.jit(lambda s: lax.fori_loop(0, 8, lambda i, s_: per(s_, backlog), s))
    f_p32 = jax.jit(lambda s: lax.fori_loop(0, 32, lambda i, s_: per(s_, backlog), s))
    tp8, _ = timed(f_p8, state)
    tp32, _ = timed(f_p32, state)
    per_ms = (tp32 - tp8) / 24 * 1e3

    rounds = int(jax.jit(sim.engine["push_rounds"])(state))

    print(json.dumps({
        "metric": "hot_step_ms",
        "value": round(hot_ms, 3),
        "unit": "ms/iter",
        "pool": pool,
        "lane_steps_per_sec": round(pool / (t_slice / max(slice_iters, 1))),
        "periodic_ms": round(per_ms, 3),
        "push_rounds": rounds,
        "slice_ms_per_iter": round(t_slice / max(slice_iters, 1) * 1e3, 3),
        "slice_iters": slice_iters,
        "occ_after": occ_after,
    }))


if __name__ == "__main__":
    main()

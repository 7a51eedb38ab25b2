#!/usr/bin/env python
"""Localize the slice-vs-components gap.

bench_micro (bench config, v5e) reports hot_step 0.726 ms/iter and
periodic 1.483 ms/phase, which predicts a slice cost of
hot + periodic/m_period ~= 0.82 ms/iter — but the measured full-run slice
is 1.265 ms/iter.  ~7 ms per superstep is unaccounted.  This probe times,
at the same mid-wave state and with the same fori-marginal method:

  A. fori(K) of hot_step alone                      (the micro's number)
  B. fori(K//m) of [periodic + fori(m) hot]          (the run() body)
  C. fori(K//m) of [fori(m) hot]                     (superstep glue, no periodic)
  D. one dispatch of run() with it reset              (ground truth)

B - C isolates the periodic phase cost IN CONTEXT; C - A isolates the
nested-fori / carry-structure glue.

Env: PROBE_POOL, PROBE_PERIOD, and the MICRO_* engine knobs of bench_micro.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

from grmonty_tpu.models import torus
from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup


def main():
    setup("warning")
    pool = int(os.environ.get("PROBE_POOL", "65536"))
    m = int(os.environ.get("PROBE_PERIOD", "16"))

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=256, n2=256)

    cfg = engine.EngineConfig(
        n_pool=pool, m_period=m, sec_cap=pool, stall_steps=150000,
        dtype=jnp.float32, ev_k=16384, refill_k=32768,
        grow_cap=8.0, grow_rate=1.1892, detached_events=True,
        mxu_extract=True,
    )
    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=cfg, emit_chunk=pool * 8)
    plan = sim.plan()
    backlog, _ = sim.emit_packed_dev(plan, 2 << 20, pool * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    state = sim._run_jit(state, backlog)
    state = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    jax.block_until_ready(state)

    hot = sim.engine["hot_step"]
    per = sim.engine["periodic_phase"]

    def timed(f, *a, reps=3):
        out = f(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    K = 512

    def report(name, t_long, t_short, iters):
        print(f"{name:40s} {(t_long - t_short) / iters * 1e3:8.3f} ms/iter",
              flush=True)

    # A: flat hot fori
    fA1 = jax.jit(lambda s: lax.fori_loop(0, 64, lambda i, x: hot(x), s))
    fA2 = jax.jit(lambda s: lax.fori_loop(0, K, lambda i, x: hot(x), s))
    report("A flat hot fori", timed(fA2, state), timed(fA1, state), K - 64)

    # C: nested fori, no periodic
    def nest(n_super):
        def body(i, s):
            return lax.fori_loop(0, m, lambda j, x: hot(x), s)
        return jax.jit(lambda s: lax.fori_loop(0, n_super, body, s))
    fC1, fC2 = nest(4), nest(K // m)
    report("C nested fori (no periodic)", timed(fC2, state), timed(fC1, state),
           K - 4 * m)

    # B: run() body = periodic + fori(m) hot
    def withper(n_super):
        def body(i, s):
            s = per(s, backlog)
            return lax.fori_loop(0, m, lambda j, x: hot(x), s)
        return jax.jit(lambda s: lax.fori_loop(0, n_super, body, s))
    fB1, fB2 = withper(4), withper(K // m)
    report("B periodic + nested fori", timed(fB2, state), timed(fB1, state),
           K - 4 * m)

    # D: ground truth full run() slice
    tD = timed(lambda s: sim._run_jit(
        s._replace(it=jnp.zeros((), jnp.int32)), backlog), state)
    out = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    iters = int(out.it)
    print(f"{'D run() slice':40s} {tD / max(iters,1) * 1e3:8.3f} ms/iter "
          f"({iters} iters)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute the periodic phase's cost (scatter events / record / refill).

The TPU trace (tools/profile_trace.py) shows the periodic phase costing
~20 ms per call at ev_k=16384 — comparable to the 16 hot iterations
between phases.  This probe times jitted periodic_phase variants built
with dbg_skip ablations, all from the SAME realistic mid-wave state
(functional purity makes replay free).

Usage: [PROF_POOL=65536] python tools/profile_periodic.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup

POOL = int(os.environ.get("PROF_POOL", "65536"))


def time_once(f, *args):
    jax.block_until_ready(f(*args))  # compile
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    setup("warning")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        from grmonty_tpu.models import torus

        torus.write_torus_dump(dump, n1=256, n2=256)
    base = engine.EngineConfig(
        n_pool=POOL, m_period=16, sec_cap=POOL, stall_steps=150000,
        dtype=jnp.float32, ev_k=16384, grow_cap=8.0, grow_rate=1.1892,
        detached_events=True, refill_k=32768,
    )
    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=base, emit_chunk=POOL * 8)
    plan = sim.plan()
    start = max(0, min(2 << 20, plan.total - POOL * 8))
    backlog, _ = sim.emit_packed_dev(plan, start, POOL * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.block_until_ready(
        jax.jit(sim.engine["periodic_phase"])(state, backlog))
    for _ in range(2):
        state = state._replace(it=jnp.zeros((), jnp.int32))
        state = jax.block_until_ready(sim._run_jit(state, backlog))
    p = state.pool
    n_ev = int(jnp.sum(p.at_event | p.ev_pending))
    print(f"pool={POOL} occ={int(jnp.sum(p.occupied))} events={n_ev} "
          f"sec={int(state.sec.count)}", flush=True)

    variants = [
        ("full", ""),
        ("no scatter", "scatter"),
        ("no record", "record"),
        ("no refill", "refill"),
        ("empty", "scatter,record,refill"),
    ]
    for name, dbg in variants:
        eng = engine.make_engine(sim.mc, sim.tables, sim.prims,
                                 base._replace(dbg_skip=dbg),
                                 geom_rows=sim.geom)
        f = jax.jit(eng["periodic_phase"])
        dt = time_once(f, state, backlog)
        print(f"periodic [{name:28s}] {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute the IN-CONTEXT periodic-phase cost (events/record/refill).

probe_superstep.py showed the periodic phase costs ~6.4 ms in the real
run (vs 1.5 ms on a freshly-drained state): its event samplers' batch-max
rejection rounds are data-dependent, so it must be timed on a state with
a full phase's worth of pending events — i.e. a state advanced exactly
m_period hot iterations past its last periodic phase.  This probe builds
that state, then times dbg_skip ablation variants of periodic_phase on
it (stationary replay with folded keys, fori-marginal).

Env: PROBE_POOL (65536) and the bench-config knobs are fixed inline.
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
    m = 16

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=32, n2=16)

    def mk_cfg(skip):
        return engine.EngineConfig(
            n_pool=pool, m_period=m, sec_cap=pool, stall_steps=150000,
            dtype=jnp.float32, ev_k=16384, refill_k=32768,
            grow_cap=8.0, grow_rate=1.1892, detached_events=True,
            mxu_extract=True, dbg_skip=skip,
        )

    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=mk_cfg(""), emit_chunk=pool * 8)
    plan = sim.plan()
    backlog, _ = sim.emit_packed_dev(plan, 2 << 20, pool * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    state = sim._run_jit(state, backlog)
    state = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    # advance exactly one phase + m hot iterations: pending events/records
    # now reflect the real inter-phase accumulation
    hot = sim.engine["hot_step"]
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    state = jax.jit(
        lambda s: lax.fori_loop(0, m, lambda i, x: hot(x), s))(state)
    jax.block_until_ready(state)
    n_ev = int(jax.device_get(
        (state.pool.ev_pending | state.pool.at_event).sum()))
    n_rp = int(jax.device_get(state.pool.record_pending.sum()))
    n_free = pool - int(jax.device_get(state.pool.occupied.sum()))
    print(f"pending events={n_ev} records={n_rp} free={n_free}", flush=True)

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

    variants = [
        ("full", ""),
        ("no scatter", "scatter"),
        ("no record", "record"),
        ("no refill", "refill"),
        ("scatter only", "record,refill"),
        ("none", "scatter,record,refill"),
    ]
    engines = {}
    for name, skip in variants:
        if skip == "":
            eng = sim.engine
        else:
            eng = engine.make_engine(sim.mc, sim.tables, sim.prims,
                                     mk_cfg(skip))
        per = eng["periodic_phase"]

        def probe(n, per=per):
            def body(i, acc):
                s2 = per(state._replace(key=random.fold_in(state.key, i)),
                         backlog)
                return acc + s2.backlog_pos.astype(jnp.int64) + s2.it.astype(jnp.int64)
            return jax.jit(lambda _: lax.fori_loop(0, n, body, jnp.int64(0)))

        t8 = timed(probe(8), 0)
        t32 = timed(probe(32), 0)
        print(f"{name:16s} {(t32 - t8) / 24 * 1e3:8.3f} ms/phase", flush=True)


if __name__ == "__main__":
    main()

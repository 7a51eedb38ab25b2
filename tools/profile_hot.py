#!/usr/bin/env python
"""Ablation profiler for the transport hot loop on the current accelerator.

Times jitted sub-pieces of engine.hot_step separately on a realistically
loaded pool so we can see where per-iteration wall time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from grmonty_tpu import consts
from grmonty_tpu.ops import geometry, fluid, radiation, hotcross, scattering
from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup

POOL = int(os.environ.get("PROF_POOL", "65536"))
DTYPE = jnp.float32 if os.environ.get("PROF_DTYPE", "float32") == "float32" else jnp.float64


def timeit(name, fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    setup("warning")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(path):
        from grmonty_tpu.models import torus
        torus.write_torus_dump(path, n1=256, n2=256)

    cfg = engine.EngineConfig(
        n_pool=POOL, m_period=16, sec_cap=4 * POOL, stall_steps=150000,
        dtype=DTYPE, fp_iters=4,
    )
    sim = driver.Simulation(path, photon_n=200_000, mass_unit=4e19, config=cfg,
                            emit_chunk=POOL * 2)
    plan = sim.plan()
    backlog = sim.emit(plan, 0, POOL * 2)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    # advance a bit so the pool is in a "typical" regime
    step = jax.jit(sim.engine["hot_step"])
    per = jax.jit(sim.engine["periodic_phase"])
    for i in range(64):
        state = step(state)
        if (i + 1) % 16 == 0:
            state = per(state, backlog)
    jax.block_until_ready(state)
    occ = int(jnp.sum(state.pool.occupied))
    print(f"pool={POOL} dtype={DTYPE.__name__} occupied={occ}")

    mc, tables = sim.mc, sim.tables
    a, hs, r0 = mc.a, mc.h_slope, mc.r_0
    p = state.pool
    prims_rows = jnp.asarray(jnp.asarray(sim.prims, DTYPE).reshape(8, -1).T)
    tabs = engine.Tables(*(jnp.asarray(t, DTYPE) for t in tables))

    # ---- full hot step + periodic phase --------------------------------
    t_hot = timeit("hot_step (full)", step, state)
    t_per = timeit("periodic_phase (full)", per, state, backlog)

    # ---- components ----------------------------------------------------
    dl = jax.jit(lambda x, k: geometry.step_size(x, k, mc.x_stop[2]))(p.x, p.k)

    def f_conn(x):
        return geometry.connection(x, a, hs)
    timeit("connection (1x)", jax.jit(f_conn), p.x)

    def f_push(x, k, dk, e0s, dl, act):
        eng = engine.make_engine(mc, tables, sim.prims, cfg)
        return eng["push_batch"](x, k, dk, e0s, dl, act)
    push = jax.jit(sim.engine["push_batch"])
    timeit("push_batch (while halving)", push, p.x, p.k, p.dkdlam, p.e_0_s, dl, p.alive)

    def f_gcov(x):
        return geometry.gcov(x, a, hs, r0)
    timeit("gcov (1x)", jax.jit(f_gcov), p.x)

    def f_fluid(x):
        g_cov = geometry.gcov(x, a, hs, r0)
        return fluid.get_fluid_params(x, g_cov, jnp.asarray(sim.prims, DTYPE), mc,
                                      prims_rows=prims_rows)
    ffj = jax.jit(f_fluid)
    timeit("eval_fluid (gcov+bilinear+4vec)", ffj, p.x)
    fs = ffj(p.x)

    def f_alphas(k, fs):
        theta = radiation.bk_angle(k, fs.u_cov, fs.b_cov, fs.b, mc.b_unit)
        nu = radiation.fluid_nu(k, fs.u_cov)
        nu_safe = jnp.abs(nu) + consts.EPS
        a_sc = radiation.alpha_inv_scatt(nu_safe, fs.theta_e, fs.n_e, tabs.hotcross)
        a_ab = radiation.alpha_inv_abs(nu_safe, fs.theta_e, fs.n_e, fs.b, theta, tabs.k2_table)
        return theta, nu, a_sc, a_ab
    timeit("eval_alphas (hotcross+jnu)", jax.jit(f_alphas), p.k, fs)

    def f_uniform(key):
        return random.uniform(key, (POOL,), DTYPE)
    timeit("random.uniform (1x pool)", jax.jit(f_uniform), state.key)

    def f_sc(key, k, fs):
        g_cov = geometry.gcov(p.x, a, hs, r0)
        return scattering.scatter_event(key, k, fs, g_cov, mc.b_unit)
    timeit("scatter_event (periodic)", jax.jit(f_sc), state.key, p.k, fs)

    # spectrum scatter-add
    def f_spec(spec, idx, vals):
        return spec.at[idx].add(vals)
    idx = jnp.asarray(np.random.randint(0, engine.N_BINS, POOL), jnp.int32)
    vals = jnp.ones((POOL, 13), jnp.float64)
    spec = state.spec
    timeit("spectrum scatter-add (13ch f64)", jax.jit(f_spec), spec, idx, vals)

    # sec-buffer style scatter
    def f_secput(buf, slot, vals):
        return buf.at[slot].set(vals, mode="drop")
    buf = jnp.zeros((cfg.sec_cap, 4), DTYPE)
    slot = jnp.asarray(np.random.permutation(cfg.sec_cap)[:POOL], jnp.int32)
    timeit("secbuf scatter-set (4ch)", jax.jit(f_secput), buf, slot, p.x)

    # refill-style gather
    def f_gather(bl_x, idx):
        return bl_x[idx]
    timeit("backlog gather (4ch)", jax.jit(f_gather), backlog.x, slot)

    # full-state select overhead proxy: where() over the whole pool pytree
    def f_merge(p, m):
        return jax.tree.map(
            lambda arr: jnp.where(m[:, None] if arr.ndim == 2 else m,
                                   arr, arr * 0), p)
    timeit("pool-wide where-merge (all fields)", jax.jit(f_merge), p, p.alive)

    print(f"\nhot_step total {t_hot*1e3:.2f} ms; periodic {t_per*1e3:.2f} ms; "
          f"amortized/iter @m={cfg.m_period}: {(t_hot + t_per/cfg.m_period)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute hot_phase_b's ~1.1 ms/iter to its components.

Each probe runs chained in a fori loop with evolving inputs (a tiny
data-dependent drift) so XLA cannot hoist the body.  Marginal timing as
in profile_phases.py.
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
from grmonty_tpu.ops import cheb, fluid, geometry, radiation
from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup

POOL = int(os.environ.get("PROF_POOL", "65536"))


def run_sync(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    return out


def marginal(name, mk_loop, i1=64, i2=512):
    f1, f2 = jax.jit(mk_loop(i1)), jax.jit(mk_loop(i2))
    ts = {}
    for key, f in (("a", f1), ("b", f2)):
        run_sync(f)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run_sync(f)
            best = min(best, time.perf_counter() - t0)
        ts[key] = best
    dt = (ts["b"] - ts["a"]) / (i2 - i1)
    print(f"{name:40s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    setup("warning")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        from grmonty_tpu.models import torus

        torus.write_torus_dump(dump, n1=256, n2=256)
    cfg = engine.EngineConfig(
        n_pool=POOL, m_period=16, sec_cap=POOL, stall_steps=150000,
        dtype=jnp.float32, ev_k=16384, grow_cap=4.0, grow_rate=1.1892,
    )
    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=cfg, emit_chunk=POOL * 8)
    plan = sim.plan()
    start = max(0, min(2 << 20, plan.total - POOL * 8))
    if jax.default_backend() == "cpu":
        backlog = sim.emit_packed(plan, start, POOL * 8)
    else:
        backlog, _ = sim.emit_packed_dev(plan, start, POOL * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = run_sync(jax.jit(sim.engine["periodic_phase"]), state, backlog)
    state = run_sync(sim._run_jit, state, backlog)
    p = state.pool
    mc = sim.mc
    print(f"pool={POOL} occ={int(jnp.sum(p.occupied))}")

    corner_rows = jnp.asarray(
        fluid.make_corner_table(np.asarray(sim.prims), mc.n1, mc.n2),
        jnp.float32)
    hc_coeffs = np.asarray(
        cheb.fit_hotcross(np.asarray(sim.tables.hotcross)), np.float32)
    k2_coeffs = np.asarray(cheb.fit_k2())
    ii, jj, _, _ = geometry.x_to_ij_c(p.x[1], p.x[2], mc.x_start, mc.dx,
                                      (mc.n1, mc.n2))
    rows0 = corner_rows[(ii * mc.n2 + jj).astype(jnp.int32)]
    ks = tuple(p.k[i] for i in range(4))

    def drift(x, v):
        # tiny data-dependent drift: prevents hoisting, preserves regime
        return x + 1e-12 * v

    # metric pair
    def mk_metric(K):
        def body(i, carry):
            x1, x2, acc = carry
            g7 = geometry.gcov_c(x1, x2, mc.a, mc.h_slope, mc.r_0)
            gc6 = geometry.gcon_c(x1, x2, mc.a, mc.h_slope, mc.r_0)
            s = sum(g7) + sum(gc6)
            return (drift(x1, s), x2, acc + s)
        return lambda: lax.fori_loop(0, K, body,
                                     (p.x[1], p.x[2], jnp.zeros_like(p.w)))
    marginal("gcov_c + gcon_c", mk_metric)

    # four-vectors from rows
    g7 = geometry.gcov_c(p.x[1], p.x[2], mc.a, mc.h_slope, mc.r_0)
    gc6 = geometry.gcon_c(p.x[1], p.x[2], mc.a, mc.h_slope, mc.r_0)
    pr0 = [rows0[..., m] for m in range(8)]

    def mk_fourv(K):
        def body(i, carry):
            v, acc = carry
            _, u_cov, _, b_cov, b_mag = fluid._four_vectors_c(
                drift(pr0[2], v), pr0[3], pr0[4], pr0[5], pr0[6], pr0[7],
                g7, gc6, mc)
            s = u_cov[0] + b_cov[0] + b_mag
            return (s, acc + s)
        return lambda: lax.fori_loop(0, K, body,
                                     (jnp.zeros_like(p.w), jnp.zeros_like(p.w)))
    marginal("_four_vectors_c", mk_fourv)

    # kinematics + hotcross (scatt opacity)
    u_cov0 = fluid._four_vectors_c(*pr0[2:8], g7, gc6, mc)[1]
    b_cov0 = fluid._four_vectors_c(*pr0[2:8], g7, gc6, mc)[3]
    bmag0 = fluid._four_vectors_c(*pr0[2:8], g7, gc6, mc)[4]
    th0 = jnp.maximum(pr0[1] / jnp.maximum(pr0[0], 1e-30) * mc.theta_e_unit,
                      1e-4)
    ne0 = pr0[0] * mc.n_e_unit

    def mk_scatt(K):
        def body(i, carry):
            nu, acc = carry
            a_sc = radiation.alpha_inv_scatt_c(nu, th0, ne0, hc_coeffs)
            return (drift(nu, a_sc), acc + a_sc)
        sin_th, nu0 = radiation.kinematics_sin_c(ks, u_cov0, b_cov0, bmag0,
                                                 mc.b_unit)
        return lambda: lax.fori_loop(
            0, K, body, (jnp.abs(nu0) + consts.EPS, jnp.zeros_like(p.w)))
    marginal("alpha_inv_scatt_c (hotcross cheb)", mk_scatt)

    sin_th0, nu0 = radiation.kinematics_sin_c(ks, u_cov0, b_cov0, bmag0,
                                              mc.b_unit)
    nu_safe0 = jnp.abs(nu0) + consts.EPS

    def mk_abs(K):
        def body(i, carry):
            nu, acc = carry
            a_ab = radiation.alpha_inv_abs_sin_c(nu, th0, ne0, bmag0,
                                                 sin_th0, k2_coeffs)
            return (drift(nu, a_ab), acc + a_ab)
        return lambda: lax.fori_loop(
            0, K, body, (nu_safe0, jnp.zeros_like(p.w)))
    marginal("alpha_inv_abs_sin_c (synch)", mk_abs)

    def mk_kin(K):
        def body(i, carry):
            k1c, acc = carry
            sin_th, nu = radiation.kinematics_sin_c(
                (ks[0], k1c, ks[2], ks[3]), u_cov0, b_cov0, bmag0, mc.b_unit)
            return (drift(k1c, nu), acc + sin_th + nu)
        return lambda: lax.fori_loop(0, K, body, (ks[1], jnp.zeros_like(p.w)))
    marginal("kinematics_sin_c", mk_kin)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Split the hot iteration's cost into phase_a / corner-gather / phase_b.

The full hot step is ~1.7 ms at pool=65536 on a v5e and is insensitive to
compute knobs (fp_iters, RNG impl, detach) — this probe attributes the
time to the three structural pieces so optimization effort lands where
the milliseconds are.  Each piece runs in its own fori loop on realistic
mid-wave state, marginally timed (long minus short loop), keeping its
outputs live via a reduction so nothing is DCE'd.

Usage: [PROF_POOL=65536] python tools/profile_phases.py
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
from grmonty_tpu.ops import cheb, fluid
from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup

POOL = int(os.environ.get("PROF_POOL", "65536"))
SHRINK_FLOOR = float(2.0 ** (-consts.MAX_HALVING_DEPTH))


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
    print(f"{name:34s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    setup("warning")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        from grmonty_tpu.models import torus

        torus.write_torus_dump(dump, n1=256, n2=256)
    cfg = engine.EngineConfig(
        n_pool=POOL, m_period=16, sec_cap=POOL, stall_steps=150000,
        dtype=jnp.float32, ev_k=16384, grow_cap=4.0, grow_rate=1.1892,
        detached_events=False,
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
    state = run_sync(sim._run_jit,
                     state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    p = state.pool
    mc = sim.mc
    print(f"pool={POOL} occ={int(jnp.sum(p.occupied))}")

    hot = sim.engine["hot_step"]
    marginal("full hot_step", lambda K: (
        lambda: lax.fori_loop(0, K, lambda i, s: hot(s), state)))

    corner_rows = jnp.asarray(
        fluid.make_corner_table(np.asarray(sim.prims), mc.n1, mc.n2),
        jnp.float32)
    # Chebyshev coefficients stay HOST numpy: cheb.eval1d bakes them into
    # the program as literals (float(c[k])), exactly as make_engine does.
    hc_coeffs = np.asarray(cheb.fit_hotcross(np.asarray(sim.tables.hotcross)),
                           np.float32)
    k2_coeffs = np.asarray(cheb.fit_k2())
    weight_min = jnp.asarray(1.0e31 * cfg.weight_scale, jnp.float32)

    xs = tuple(p.x[i] for i in range(4))
    ks = tuple(p.k[i] for i in range(4))
    dks = tuple(p.dkdlam[i] for i in range(4))
    u = random.uniform(state.key, p.w.shape, jnp.float32)

    def mk_phase_a(K):
        def body(i, carry):
            x, k, dk, e0s, shr = carry
            A = engine.hot_phase_a(
                x, k, dk, e0s, shr, p.pend_dl, p.pend_push, p.at_event,
                p.alive, p.w, p.record_pending, u,
                mc, cfg.fp_iters, weight_min, SHRINK_FLOOR,
                cfg.ref_err_metric, cfg.grow_cap, cfg.grow_rate)
            return (A["x"], A["k"], A["dkdlam"], A["e_0_s"], A["dl_shrink"])
        return lambda: lax.fori_loop(
            0, K, body, (xs, ks, dks, p.e_0_s, p.dl_shrink))

    marginal("hot_phase_a (pre-gather)", mk_phase_a)

    # gather alone: realistic z distribution from the current pool
    from grmonty_tpu.ops import geometry
    ii, jj, _, _ = geometry.x_to_ij_c(p.x[1], p.x[2], mc.x_start, mc.dx,
                                      (mc.n1, mc.n2))
    z0 = (ii * mc.n2 + jj).astype(jnp.int32)

    def mk_gather(K):
        def body(i, carry):
            z, acc = carry
            rows = corner_rows[z]
            acc = acc + rows[:, 0]
            z = (z + jnp.asarray(i, jnp.int32) % 2).astype(jnp.int32)
            return (z, acc)
        return lambda: lax.fori_loop(
            0, K, body, (z0, jnp.zeros_like(p.w)))

    marginal("corner gather (N,32)", mk_gather)

    rows0 = corner_rows[z0]

    def mk_phase_b(K):
        def body(i, carry):
            a_sc, a_ab, bi, w, tau_a, tau_s = carry
            B = engine.hot_phase_b(
                rows0, xs, ks, dks, p.e_0_s, w, a_sc, a_ab, bi,
                tau_a, tau_s, p.interacting, p.pend_dl, p.pend_push,
                p.sec_w, p.n_step, p.alive,
                xs, ks, dks, p.e_0_s,
                p.pend_dl, p.alive, p.alive, p.pend_push, ~p.alive, u,
                jnp.asarray(1.0, jnp.float32),
                mc, hc_coeffs, k2_coeffs, weight_min, cfg.stall_steps)
            return (B["alpha_scatti"], B["alpha_absi"], B["bi"], B["w"],
                    B["tau_abs"], B["tau_scatt"])
        return lambda: lax.fori_loop(
            0, K, body,
            (p.alpha_scatti, p.alpha_absi, p.bi, p.w, p.tau_abs, p.tau_scatt))

    marginal("hot_phase_b (post-gather)", mk_phase_b)

    def mk_rng(K):
        def body(i, carry):
            key, acc = carry
            key, k1, k2 = random.split(key, 3)
            u1 = random.uniform(k1, p.w.shape, jnp.float32)
            u2 = random.uniform(k2, p.w.shape, jnp.float32)
            return (key, acc + u1 + u2)
        return lambda: lax.fori_loop(
            0, K, body, (state.key, jnp.zeros_like(p.w)))

    marginal("rng (2 pool uniforms)", mk_rng)

    def mk_chain(K):
        def body(i, carry):
            x, k, dk, e0s, shr, a_sc, a_ab, bi, w, tau_a, tau_s = carry
            A = engine.hot_phase_a(
                x, k, dk, e0s, shr, p.pend_dl, p.pend_push, p.at_event,
                p.alive, w, p.record_pending, u,
                mc, cfg.fp_iters, weight_min, SHRINK_FLOOR,
                cfg.ref_err_metric, cfg.grow_cap, cfg.grow_rate)
            rows = corner_rows[A["z"]]
            B = engine.hot_phase_b(
                rows, A["x"], A["k"], A["dkdlam"], A["e_0_s"], A["w"],
                a_sc, a_ab, bi, tau_a, tau_s, p.interacting,
                A["pend_dl"], A["pend_push"], p.sec_w, p.n_step, A["alive"],
                x, k, dk, e0s,
                A["seg"], A["commit"], A["moving"], A["was_pend"],
                A["stopped"], u, jnp.asarray(1.0, jnp.float32),
                mc, hc_coeffs, k2_coeffs, weight_min, cfg.stall_steps)
            return (B["x"], B["k"], B["dkdlam"], B["e_0_s"], A["dl_shrink"],
                    B["alpha_scatti"], B["alpha_absi"], B["bi"], B["w"],
                    B["tau_abs"], B["tau_scatt"])
        return lambda: lax.fori_loop(
            0, K, body,
            (xs, ks, dks, p.e_0_s, p.dl_shrink, p.alpha_scatti,
             p.alpha_absi, p.bi, p.w, p.tau_abs, p.tau_scatt))

    marginal("a+gather+b chained", mk_chain)

    def mk_chain_ab(K):
        def body(i, carry):
            x, k, dk, e0s, shr, acc = carry
            A = engine.hot_phase_a(
                x, k, dk, e0s, shr, p.pend_dl, p.pend_push, p.at_event,
                p.alive, p.w, p.record_pending, u,
                mc, cfg.fp_iters, weight_min, SHRINK_FLOOR,
                cfg.ref_err_metric, cfg.grow_cap, cfg.grow_rate)
            rows = corner_rows[A["z"]]
            return (A["x"], A["k"], A["dkdlam"], A["e_0_s"], A["dl_shrink"],
                    acc + jnp.sum(rows, axis=-1))
        return lambda: lax.fori_loop(
            0, K, body, (xs, ks, dks, p.e_0_s, p.dl_shrink,
                         jnp.zeros_like(p.w)))

    marginal("a+gather chained (no b)", mk_chain_ab)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""In-loop marginal-cost profiler for the rewritten engine."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from grmonty_tpu import consts
from grmonty_tpu.ops import cheb, geometry, fluid, radiation
from grmonty_tpu.transport import driver, engine
from grmonty_tpu.utils.logging import setup

POOL = int(os.environ.get("PROF_POOL", "65536"))
DTYPE = jnp.float32 if os.environ.get("PROF_DTYPE", "float32") == "float32" else jnp.float64


def run_sync(f, *args):
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return out


def marginal(name, mk_loop, i1=16, i2=128):
    f1, f2 = mk_loop(i1), mk_loop(i2)
    ts = {}
    for key, f in (("a", f1), ("b", f2)):
        run_sync(f)  # compile + warm
        t0 = time.perf_counter()
        run_sync(f)
        ts[key] = time.perf_counter() - t0
    dt = (ts["b"] - ts["a"]) / (i2 - i1)
    print(f"{name:52s} {dt*1e3:9.3f} ms/iter (totals {ts['a']*1e3:.0f}/{ts['b']*1e3:.0f} ms)",
          flush=True)
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
        n_pool=POOL, m_period=16, sec_cap=POOL, stall_steps=150000,
        dtype=DTYPE, fp_iters=4,
    )
    sim = driver.Simulation(path, photon_n=200_000, mass_unit=4e19, config=cfg,
                            emit_chunk=POOL * 2)
    plan = sim.plan()
    backlog = sim.emit_packed(plan, 0, POOL * 2)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = run_sync(jax.jit(sim.engine["periodic_phase"]), state, backlog)
    hot = sim.engine["hot_step"]
    per = sim.engine["periodic_phase"]
    if os.environ.get("PROF_REAL", "1") == "1":
        # advance deep into the realistic regime with the actual run loop
        import time as _t
        t0 = _t.time()
        state = run_sync(sim._run_jit, state, backlog)  # 512 iters
        print(f"real slice (512 it): {_t.time()-t0:.1f}s (incl compile)")
        t0 = _t.time()
        state = run_sync(sim._run_jit, state._replace(it=jnp.zeros((), jnp.int32)), backlog)
        print(f"real slice (512 it): {_t.time()-t0:.1f}s warm "
              f"-> {( _t.time()-t0)/512*1e3:.2f} ms/iter")
    else:
        adv = jax.jit(lambda s: lax.fori_loop(0, 64, lambda i, s_: hot(s_), s))
        state = run_sync(adv, state)
        state = run_sync(jax.jit(per), state, backlog)
    occ = int(jnp.sum(state.pool.occupied))
    nstep = np.asarray(state.pool.n_step)
    print(f"pool={POOL} dtype={DTYPE.__name__} occ={occ} nstep_mean={nstep.mean():.0f}")

    # push halving-round count in this regime
    rounds = int(run_sync(jax.jit(sim.engine["push_rounds"]), state))
    print(f"push halving rounds (batch-max, this state): {rounds}")

    # A) full hot_step marginal
    marginal("hot_step", lambda K: jax.jit(
        lambda: lax.fori_loop(0, K, lambda i, s: hot(s), state)))

    # B) periodic_phase marginal
    marginal("periodic_phase", lambda K: jax.jit(
        lambda: lax.fori_loop(0, K, lambda i, s: per(s, backlog), state)), i1=4, i2=32)

    # C) push-only loop (keeps its own inner while)
    p = state.pool
    mc = sim.mc
    push = sim.engine["push_batch"]
    xT = jnp.stack(p.x, axis=-1)
    kT = jnp.stack(p.k, axis=-1)
    dkT = jnp.stack(p.dkdlam, axis=-1)

    def mk_push(K):
        def body(i, s):
            x, k, dk, e0s = s
            dl = geometry.step_size(x, k, mc.x_stop[2])
            x, k, dk, e0s, _ = push(x, k, dk, e0s, dl, p.alive)
            return (x, k, dk, e0s)
        return jax.jit(lambda: lax.fori_loop(0, K, body, (xT, kT, dkT, p.e_0_s)))
    marginal("push_batch loop", mk_push)

    # D) fluid gather + alphas loop
    corner_rows = jnp.asarray(
        fluid.make_corner_table(np.asarray(sim.prims), mc.n1, mc.n2), DTYPE)
    hc_coeffs = jnp.asarray(cheb.fit_hotcross(np.asarray(sim.tables.hotcross)), DTYPE)
    k2_coeffs = np.asarray(cheb.fit_k2())
    kc = tuple(p.k[i] for i in range(4))

    def mk_fluid(K):
        def body(i, s):
            x1, x2, acc = s
            g7 = geometry.gcov_c(x1, x2, mc.a, mc.h_slope, mc.r_0)
            fl = fluid.get_fluid_params_c(x1, x2, corner_rows, mc, g7=g7)
            theta, nu = radiation.kinematics_c(kc, fl.u_cov, fl.b_cov, fl.b, mc.b_unit)
            nu_safe = jnp.abs(nu) + consts.EPS
            a_sc = radiation.alpha_inv_scatt_c(nu_safe, fl.theta_e, fl.n_e, hc_coeffs)
            a_ab = radiation.alpha_inv_abs_c(nu_safe, fl.theta_e, fl.n_e, fl.b, theta, k2_coeffs)
            return (x1 + 1e-12 * a_sc, x2, acc + a_ab)
        return jax.jit(lambda: lax.fori_loop(
            0, K, body, (p.x[1], p.x[2], jnp.zeros_like(p.e))))
    marginal("fluid gather + alphas", mk_fluid)

    # D2) periodic-phase components on the real state
    from grmonty_tpu.ops import scattering
    p = state.pool
    g7 = geometry.gcov_c(p.x[1], p.x[2], mc.a, mc.h_slope, mc.r_0)
    fl = fluid.get_fluid_params_c(p.x[1], p.x[2], corner_rows, mc, g7=g7)
    kc = tuple(p.k[i] for i in range(4))

    def mk_scatter(K):
        def body(i, s):
            key, acc = s
            key, k1 = random.split(key)
            res = scattering.scatter_event_c(k1, kc, fl, g7, mc.b_unit)
            return (key, acc + res.e_sec)
        return jax.jit(lambda: lax.fori_loop(0, K, body, (state.key, jnp.zeros_like(p.e))))
    marginal("scatter_event_c (real state)", mk_scatter, i1=2, i2=10)

    from grmonty_tpu.ops import proba
    th_safe = jnp.maximum(fl.theta_e, 1e-4)
    kt_safe = (jnp.maximum(kc[0], 1e-6), jnp.maximum(kc[1], 1e-6), kc[2], kc[3])

    def mk_electron(K):
        def body(i, s):
            key, acc = s
            key, k1 = random.split(key)
            pe = proba.sample_electron_distr_p_c(k1, kt_safe, th_safe)
            return (key, acc + pe[0])
        return jax.jit(lambda: lax.fori_loop(0, K, body, (state.key, jnp.zeros_like(p.e))))
    marginal("sample_electron (real state)", mk_electron, i1=2, i2=10)

    def mk_ydist(K):
        def body(i, s):
            key, acc = s
            key, k1 = random.split(key)
            y = proba.sample_y_distr(k1, th_safe)
            return (key, acc + y)
        return jax.jit(lambda: lax.fori_loop(0, K, body, (state.key, jnp.zeros_like(p.e))))
    marginal("sample_y_distr (real state)", mk_ydist, i1=2, i2=10)

    def mk_kn(K):
        k0s = jnp.maximum(kc[0] * 20.0, 1e-4)
        def body(i, s):
            key, acc = s
            key, k1 = random.split(key)
            kp = proba.sample_klein_nishina(k1, k0s)
            return (key, acc + kp)
        return jax.jit(lambda: lax.fori_loop(0, K, body, (state.key, jnp.zeros_like(p.e))))
    marginal("sample_klein_nishina (real state)", mk_kn, i1=2, i2=10)

    def mk_cumsum(K):
        def body(i, s):
            m, acc = s
            r = jnp.cumsum((m > 0.5).astype(jnp.int32)) - 1
            return (m, acc + r)
        m0 = random.uniform(state.key, (POOL,), DTYPE)
        return jax.jit(lambda: lax.fori_loop(0, K, body, (m0, jnp.zeros((POOL,), jnp.int32))))
    marginal("cumsum (refill prefix)", mk_cumsum)

    def mk_spectrum(K):
        spec0 = state.spec
        idx = jnp.asarray(np.random.randint(0, engine.N_BINS, POOL), jnp.int32)
        vals = jnp.ones((POOL, 13), DTYPE)
        def body(i, s):
            return s.at[idx + (i % 2)].add(vals)
        return jax.jit(lambda: lax.fori_loop(0, K, body, spec0)), None
    def mk_spectrum2(K):
        spec0 = state.spec
        idx = jnp.asarray(np.random.randint(0, engine.N_BINS, POOL), jnp.int32)
        vals = jnp.ones((POOL, 13), DTYPE)
        def body(i, s):
            return s.at[jnp.minimum(idx + i % 3, engine.N_BINS)].add(vals)
        return jax.jit(lambda: lax.fori_loop(0, K, body, spec0))
    marginal("spectrum scatter-add", mk_spectrum2, i1=4, i2=32)

    def mk_secput(K):
        rows0 = state.sec.rows
        slot = jnp.asarray(np.random.permutation(rows0.shape[0])[:POOL], jnp.int32)
        newr = jnp.ones((POOL, 16), DTYPE)
        def body(i, s):
            return s.at[jnp.minimum(slot + i % 3, rows0.shape[0] - 1)].set(newr)
        return jax.jit(lambda: lax.fori_loop(0, K, body, rows0))
    marginal("sec row scatter-set", mk_secput, i1=4, i2=32)

    # E) RNG draws (3x per hot step)
    def mk_rng(K):
        def body(i, s):
            key, acc = s
            key, k1, k2, k3 = random.split(key, 4)
            u = random.uniform(k1, (POOL,), DTYPE) + random.uniform(k2, (POOL,), DTYPE) \
                + random.uniform(k3, (POOL,), DTYPE)
            return (key, acc + u)
        return jax.jit(lambda: lax.fori_loop(
            0, K, body, (state.key, jnp.zeros((POOL,), DTYPE))))
    marginal("3x split+uniform", mk_rng)

    # F) inner-while round count distribution (how many halving rounds?)
    def count_rounds(x, k, dk, e0s, dl, active):
        # replicate push_c but return the round counter
        n = e0s.shape[0]
        cols = jnp.arange(8, dtype=jnp.int32)[:, None]
        stack = jnp.zeros((8, n), jnp.int32)
        sp = jnp.where(active & (x[:, 1] >= mc.x_start[1]), 1, 0).astype(jnp.int32)
        def body(s):
            it = s[-1]
            out = sim.engine["push_batch"]  # placeholder
            return s[:-1] + (it + 1,)
        return None
    # simpler: measure hot_step at different fp_iters via config variants later

    print("done")


if __name__ == "__main__":
    main()

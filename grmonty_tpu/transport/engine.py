"""The batched geodesic transport engine — the hot loop.

TPU-native re-design of the reference's transport backends (CPU recursive
tracker ``harm_model.cpp:894-1069`` and the CUDA persistent photon-pool
pipeline ``super_photon.cu:505-1037``):

* Photons are an SoA pool of (N,) arrays stepped in lockstep inside one
  ``lax.while_loop``; boolean masks replace the CUDA ``PhotonState`` enum.
* Every iteration does one geodesic step (implicit midpoint with a bounded
  per-lane halving stack — the iterative shape of ``super_photon.cu:1826``)
  plus the trapezoid opacity/scatter-decision update for all live lanes.
* Scattering is deferred: a lane that draws a scatter event rolls back to
  its pre-step state, re-pushes by ``frac*dl`` on the next iteration, then
  idles until the periodic phase (every ``m_period`` iterations) runs the
  expensive event kinematics (tetrad + electron sampling + KN) for all
  pending lanes at once, amortizing the full-width masked computation.
  This mirrors the reference GPU driver's every-7th-iteration cadence for
  refill + record (``super_photon.cu:656,923``).
* Secondaries are packed into an on-device ring buffer via prefix sums
  (replacing the GPU->host->queue feedback loop, ``super_photon.cu:858-958``)
  and drained into free pool slots, with priority over the primary backlog.
* Escaped photons are recorded into the (6 x 200 x 13) spectrum with a
  masked scatter-add (replacing spectrum atomics, ``super_photon.cu:1586``).
* The bias-feedback scalars (max_tau_scatt, n_recorded, n_scatt) ride in
  the loop carry and refresh each periodic phase — the reference reads them
  racily mid-flight (``super_photon.cu:36-46,1649``), so the staleness is
  equivalent by design.

RNG: one threefry key in the carry; each draw site consumes a split and
draws the whole batch (photons are exchangeable, so per-lane streams are
unnecessary; statistical parity is the acceptance criterion).
"""

import math
import typing

import jax
import jax.numpy as jnp
from jax import lax, random

from grmonty_tpu import consts
from grmonty_tpu.ops import emission, fluid, geometry, hotcross, radiation, scattering

PI = math.pi

N_SPEC_CHAN = 13  # Spectrum struct channels (harm_data.hpp:129-143)
# channel order: dn_dle, de_dle, nph, nscatt, x1i_av, x2i_sq, x3f_sq,
#                tau_abs, tau_scatt, ne_0, theta_e_0, b_0, e_0
N_BINS = consts.N_TH_BINS * consts.N_E_BINS
DUMP_BIN = N_BINS  # overflow row for masked-out scatter-adds


class EngineConfig(typing.NamedTuple):
    n_pool: int = 16384  # concurrently tracked photons
    m_period: int = 8  # iterations between periodic (refill/record/scatter) phases
    sec_cap: int = 65536  # secondary ring-buffer capacity
    max_inner: int = 256  # cap on push sub-segment rounds
    max_outer: int = 50_000_000  # hard safety cap on hot iterations per wave
    tail_exit: int = 0  # exit the wave once backlog is drained and at most
    #   this many lanes remain occupied (they carry over to the next wave)
    stall_steps: int = consts.MAX_N_STEP  # per-photon step cap (reference value)
    fp_iters: int = consts.MAX_ITER  # implicit-midpoint fixed-point iterations.
    #   The reference uses 2 and repairs failures by recursive step halving;
    #   in lockstep batches every halving costs a full-width round, so a
    #   higher iteration count (cheaper convergence, fewer halvings) wins.
    dtype: typing.Any = jnp.float64
    # Global factor applied to photon weights on emission.  Raw grmonty
    # weights reach ~1e50; TPU float64 is float32-pair emulation whose
    # exponent RANGE is f32's (~3.4e38), so unscaled weights overflow to inf
    # on device.  All weight comparisons scale with this factor and the
    # spectrum is unscaled at report time, so it is physically inert.
    weight_scale: float = 1.0e-25


class Tables(typing.NamedTuple):
    f_table: jnp.ndarray  # (201,) ln F(k)
    k2_table: jnp.ndarray  # (201,) ln K2
    hotcross: jnp.ndarray  # (221, 81) log10 sigma
    weights: jnp.ndarray  # (201,) ln photon weight vs frequency


class Pool(typing.NamedTuple):
    x: jnp.ndarray  # (N, 4)
    k: jnp.ndarray  # (N, 4)
    dkdlam: jnp.ndarray  # (N, 4)
    w: jnp.ndarray
    e: jnp.ndarray
    l: jnp.ndarray
    x1i: jnp.ndarray
    x2i: jnp.ndarray
    tau_abs: jnp.ndarray
    tau_scatt: jnp.ndarray
    n_e_0: jnp.ndarray
    theta_e_0: jnp.ndarray
    b_0: jnp.ndarray
    e_0: jnp.ndarray
    e_0_s: jnp.ndarray
    alpha_scatti: jnp.ndarray
    alpha_absi: jnp.ndarray
    bi: jnp.ndarray
    pend_dl: jnp.ndarray  # partial re-push length for a decided scatter
    sec_w: jnp.ndarray  # secondary weight frozen at decision time
    dl_shrink: jnp.ndarray  # adaptive per-lane step-size factor (<= 1):
    #   lanes that halve shrink their next steps so batch-max halving
    #   rounds stay near 1 (pure lockstep-efficiency control)
    n_scatt: jnp.ndarray  # int32
    n_step: jnp.ndarray  # int32
    occupied: jnp.ndarray  # slot holds a photon (possibly awaiting record)
    alive: jnp.ndarray  # still being tracked
    interacting: jnp.ndarray  # opacity coupling still possible
    pend_push: jnp.ndarray  # next hot iteration is the partial re-push
    at_event: jnp.ndarray  # waiting for the periodic scatter phase
    record_pending: jnp.ndarray  # escaped; record at the periodic phase


class SecBuf(typing.NamedTuple):
    """On-device secondary-photon buffer (InitPhoton SoA + count)."""

    x: jnp.ndarray  # (S, 4)
    k: jnp.ndarray  # (S, 4)
    w: jnp.ndarray
    e: jnp.ndarray
    l: jnp.ndarray
    n_e_0: jnp.ndarray
    theta_e_0: jnp.ndarray
    b_0: jnp.ndarray
    e_0: jnp.ndarray
    n_scatt: jnp.ndarray  # int32
    count: jnp.ndarray  # scalar int32


class Counters(typing.NamedTuple):
    n_recorded: jnp.ndarray  # int64
    n_scatt_rec: jnp.ndarray  # int64: sum of n_scatt over recorded photons
    max_tau_scatt: jnp.ndarray  # float: running max over recorded photons
    n_created: jnp.ndarray  # int64: primaries consumed from the backlog
    n_sec_drop: jnp.ndarray  # int64: secondaries lost to buffer overflow


class State(typing.NamedTuple):
    pool: Pool
    spec: jnp.ndarray  # (N_BINS + 1, 13) accumulators (+1 dump row)
    counters: Counters
    sec: SecBuf
    backlog_pos: jnp.ndarray  # int32: next unconsumed primary
    key: jnp.ndarray
    it: jnp.ndarray  # int32 iteration counter


def empty_pool(n, dtype):
    z = lambda: jnp.zeros((n,), dtype)
    zi = lambda: jnp.zeros((n,), jnp.int32)
    zb = lambda: jnp.zeros((n,), bool)
    z4 = lambda: jnp.zeros((n, 4), dtype)
    return Pool(
        x=z4(), k=z4(), dkdlam=z4(), w=z(), e=z(), l=z(), x1i=z(), x2i=z(),
        tau_abs=z(), tau_scatt=z(), n_e_0=z(), theta_e_0=z(), b_0=z(), e_0=z(),
        e_0_s=z(), alpha_scatti=z(), alpha_absi=z(), bi=z(), pend_dl=z(),
        sec_w=z(), dl_shrink=jnp.ones((n,), dtype), n_scatt=zi(), n_step=zi(),
        occupied=zb(), alive=zb(), interacting=zb(), pend_push=zb(),
        at_event=zb(), record_pending=zb(),
    )


def empty_secbuf(s, dtype):
    z = lambda: jnp.zeros((s,), dtype)
    return SecBuf(
        x=jnp.zeros((s, 4), dtype), k=jnp.zeros((s, 4), dtype), w=z(), e=z(),
        l=z(), n_e_0=z(), theta_e_0=z(), b_0=z(), e_0=z(),
        n_scatt=jnp.zeros((s,), jnp.int32), count=jnp.zeros((), jnp.int32),
    )


def init_counters(max_tau_scatt_init, dtype):
    zi = lambda: jnp.zeros((), jnp.int64)
    return Counters(
        n_recorded=zi(), n_scatt_rec=zi(),
        max_tau_scatt=jnp.asarray(max_tau_scatt_init, dtype),
        n_created=zi(), n_sec_drop=zi(),
    )


def make_engine(mc: fluid.ModelConsts, tables: Tables, prims, cfg: EngineConfig):
    """Build the jitted transport step functions for one dump.

    ``prims``: (8, n1, n2) primitives on device.  Returns a dict of
    functions; ``run(state, backlog)`` drives the while_loop to completion.
    """
    dt = cfg.dtype
    a, hs, r0 = mc.a, mc.h_slope, mc.r_0
    x2_stop = mc.x_stop[2]
    d_tau_k = mc.d_tau_k
    weight_min = consts.WEIGHT_MIN * cfg.weight_scale
    # Cast lookup tables and primitives to the engine dtype so a float32
    # engine doesn't silently promote every op to f64.
    tables = Tables(*(jnp.asarray(t, dt) for t in tables))
    prims = jnp.asarray(prims, dt)
    # Row-major (n1*n2, 8) layout: each bilinear corner is one row gather.
    prims_rows = jnp.asarray(prims.reshape(8, -1).T)

    # ------------------------------------------------------------------
    # physics helpers
    # ------------------------------------------------------------------
    def eval_fluid(x):
        g_cov = geometry.gcov(x, a, hs, r0)
        fs = fluid.get_fluid_params(x, g_cov, prims, mc, prims_rows=prims_rows)
        return g_cov, fs

    def eval_alphas(k, fs):
        """(theta, nu, alpha_scatt, alpha_abs) at a position (nu<0 handled by caller)."""
        theta = radiation.bk_angle(k, fs.u_cov, fs.b_cov, fs.b, mc.b_unit)
        nu = radiation.fluid_nu(k, fs.u_cov)
        nu_safe = jnp.abs(nu) + consts.EPS
        a_sc = radiation.alpha_inv_scatt(nu_safe, fs.theta_e, fs.n_e, tables.hotcross)
        a_ab = radiation.alpha_inv_abs(nu_safe, fs.theta_e, fs.n_e, fs.b, theta, tables.k2_table)
        return theta, nu, a_sc, a_ab

    def bias_func(theta_e, w, counters):
        """Scattering bias (harm_model.cpp:1391-1404) from loop-carried counters."""
        cap = 0.5 * w / weight_min
        avg_scatt = counters.n_scatt_rec.astype(dt) / (
            counters.n_recorded.astype(dt) + 1.0
        )
        bias = (
            100.0
            * theta_e
            * theta_e
            / (mc.bias_norm * counters.max_tau_scatt * (avg_scatt + 2.0))
        )
        bias = jnp.maximum(bias, consts.TP_OVER_TE)
        bias = jnp.minimum(bias, cap)
        return bias / consts.TP_OVER_TE

    # ------------------------------------------------------------------
    # geodesic push: one full step with a bounded halving stack per lane
    # (harm_model.cpp:1217-1289; iterative form super_photon.cu:1826-1929)
    # ------------------------------------------------------------------
    def push_batch(x, k, dkdlam, e_0_s, dl, active):
        n = x.shape[0]
        cols = jnp.arange(8, dtype=jnp.int32)[None, :]  # stack column ids
        stack = jnp.zeros((n, 8), jnp.int32)
        sp = jnp.where(active, 1, 0).astype(jnp.int32)

        # The reference freezes photons with x1 < x_start1 (horizon plunge).
        frozen = x[:, 1] < mc.x_start[1]
        sp = jnp.where(frozen, 0, sp)

        def seg_body(s):
            x, k, dk, e0s, stack, sp, failed, it = s
            act = sp > 0
            # One-hot stack ops (no gathers/scatters: 8-wide masked math).
            top = (cols == (sp - 1)[:, None])
            depth = jnp.sum(jnp.where(top, stack, 0), axis=1, dtype=jnp.int32)
            seg_dl = dl * jnp.exp2(-depth.astype(dt))

            dl_2 = 0.5 * seg_dl
            # half-step predictor (harm_model.cpp:1233-1238)
            dkh = dk * dl_2[:, None]
            k_half = k + dkh
            k_pred = k_half + dkh
            x_new = x + k_half * seg_dl[:, None]

            conn = geometry.connection(x_new, a, hs)

            # Fixed-point iterations, unrolled.
            err = jnp.zeros_like(e0s)
            dk_new = dk
            for _ in range(cfg.fp_iters):
                dk_new = geometry.geodesic_rhs(conn, k_pred)
                k_next = k_half + dl_2[:, None] * dk_new
                err = jnp.sum(
                    jnp.abs((k_pred - k_next) / (k_next + consts.EPS)), axis=-1
                )
                k_pred = k_next
            k_new = k_pred

            g00, g01, g03 = geometry.gcov_row0(x_new, a, hs, r0)
            e_1 = -(k_new[:, 0] * g00 + k_new[:, 1] * g01 + k_new[:, 3] * g03)
            err_e = jnp.abs((e_1 - e0s) / (e0s + consts.EPS))

            bad = (err_e > consts.E_DRIFT_TOL) | (err > consts.E_TOL) | ~jnp.isfinite(err)
            can_split = depth < consts.MAX_HALVING_DEPTH
            fail = act & bad & can_split
            commit = act & ~fail

            # commit: advance state, pop the segment
            x = jnp.where(commit[:, None], x_new, x)
            k = jnp.where(commit[:, None], k_new, k)
            dk = jnp.where(commit[:, None], dk_new, dk)
            e0s = jnp.where(commit, e_1, e0s)
            sp_new = jnp.where(commit, sp - 1, sp)

            # fail: replace the top with two half segments (depth + 1):
            # write depth+1 at columns sp-1 and sp via one-hot select.
            nxt = (cols == sp[:, None])
            write = fail[:, None] & (top | nxt)
            stack = jnp.where(write, (depth + 1)[:, None], stack)
            sp_new = jnp.where(fail, jnp.minimum(sp + 1, 8), sp_new)

            return x, k, dk, e0s, stack, sp_new, failed | fail, it + 1

        def seg_cond2(s):
            return jnp.any(s[5] > 0) & (s[7] < cfg.max_inner)

        x, k, dkdlam, e_0_s, _, _, failed, _ = lax.while_loop(
            seg_cond2,
            seg_body,
            (x, k, dkdlam, e_0_s, stack, sp, jnp.zeros_like(active), jnp.int32(0)),
        )
        return x, k, dkdlam, e_0_s, failed

    # ------------------------------------------------------------------
    # stop / record criteria (harm_model.cpp:1589-1618)
    # ------------------------------------------------------------------
    def stop_and_roulette(key, p: Pool, mask):
        """Apply the stop criterion with Russian roulette to masked lanes.

        Returns (new w, stopped, record) — stopped lanes leave the hot loop;
        record lanes escaped through r_max (recorded even at w == 0).
        """
        u = random.uniform(key, p.w.shape, dt)
        horizon = p.x[:, 1] < mc.x1_min
        escaped = p.x[:, 1] > consts.X1_MAX
        small = p.w < weight_min

        win = u <= (1.0 / consts.ROULETTE)
        w_roul = jnp.where(win, p.w * consts.ROULETTE, 0.0)
        w = jnp.where(mask & small & ~horizon, w_roul, p.w)

        killed_inside = mask & small & ~horizon & ~escaped & ~win
        stopped = mask & (horizon | escaped | killed_inside)
        record = mask & escaped & ~horizon
        return w, stopped, record

    # ------------------------------------------------------------------
    # the hot iteration
    # ------------------------------------------------------------------
    def hot_step(state: State) -> State:
        p = state.pool
        key, k_roul, k_roul2, k_x1 = random.split(state.key, 4)

        moving = p.alive & ~p.at_event

        # Top-of-loop stop check (pend_push lanes are mid-event: exempt).
        checkable = moving & ~p.pend_push
        w, stopped, record = stop_and_roulette(k_roul, p, checkable)
        p = p._replace(
            w=w,
            alive=p.alive & ~stopped,
            record_pending=p.record_pending | record,
        )
        moving = moving & ~stopped

        # Save pre-step state for scatter rollback.
        x2_, k2_, dk2_, e0s2_ = p.x, p.k, p.dkdlam, p.e_0_s

        dl = jnp.where(
            p.pend_push,
            p.pend_dl,
            geometry.step_size(p.x, p.k, x2_stop) * p.dl_shrink,
        )
        xn, kn, dkn, e0sn, had_fail = push_batch(
            p.x, p.k, p.dkdlam, p.e_0_s, dl, moving
        )
        # Adaptive step control (lockstep efficiency): lanes that needed
        # halving take smaller steps next time; clean lanes relax back.
        shrink = jnp.where(
            moving & ~p.pend_push,
            jnp.where(
                had_fail,
                jnp.maximum(p.dl_shrink * 0.25, 2.0 ** -7),
                jnp.minimum(p.dl_shrink * 1.1892, 1.0),
            ),
            p.dl_shrink,
        )
        p = p._replace(
            x=jnp.where(moving[:, None], xn, p.x),
            k=jnp.where(moving[:, None], kn, p.k),
            dkdlam=jnp.where(moving[:, None], dkn, p.dkdlam),
            e_0_s=jnp.where(moving, e0sn, p.e_0_s),
            dl_shrink=shrink,
        )

        # Lanes completing their partial re-push are now at the event point.
        arrived = moving & p.pend_push
        p = p._replace(pend_push=p.pend_push & ~arrived, at_event=p.at_event | arrived)

        # Post-push stop check (break before interacting, harm_model.cpp:932-934).
        checkable = moving & ~arrived
        w, stopped, record = stop_and_roulette(k_roul2, p, checkable)
        p = p._replace(
            w=w,
            alive=p.alive & ~stopped,
            record_pending=p.record_pending | record,
        )

        # ------------------------------------------------------------------
        # interaction (harm_model.cpp:937-1056)
        # ------------------------------------------------------------------
        inter = moving & ~arrived & ~stopped & p.interacting

        g_cov, fs = eval_fluid(p.x)
        bound = fs.n_e == 0.0
        theta, nu, a_scf, a_abf = eval_alphas(p.k, fs)
        bf = bias_func(fs.theta_e, p.w, state.counters)

        dead_branch = bound | (nu < 0.0)
        half = 0.5 * d_tau_k * dl
        d_tau_scatt = jnp.where(
            dead_branch,
            p.alpha_scatti * half,
            (p.alpha_scatti + a_scf) * half,
        )
        d_tau_abs = jnp.where(
            dead_branch, p.alpha_absi * half, (p.alpha_absi + a_abf) * half
        )
        bias = jnp.where(dead_branch, 0.0, 0.5 * (p.bi + bf))

        alpha_scatti = jnp.where(inter, jnp.where(dead_branch, 0.0, a_scf), p.alpha_scatti)
        alpha_absi = jnp.where(inter, jnp.where(dead_branch, 0.0, a_abf), p.alpha_absi)
        bi = jnp.where(inter, jnp.where(dead_branch, 0.0, bf), p.bi)

        x1r = -jnp.log(random.uniform(k_x1, p.w.shape, dt) + 1e-30)
        sec_w = p.w / jnp.maximum(bias, consts.EPS)
        scatter = inter & (bias * d_tau_scatt > x1r) & (sec_w > weight_min)

        frac = jnp.where(scatter, x1r / (bias * d_tau_scatt + consts.EPS), 1.0)
        d_tau_abs_eff = d_tau_abs * frac
        d_tau_scatt_eff = d_tau_scatt * frac

        absorbed = inter & (d_tau_abs_eff > 100.0)  # dies unrecorded (:991-994,1041-1044)

        d_tau = d_tau_abs_eff + d_tau_scatt_eff
        decay_taylor = 1.0 - d_tau / 24.0 * (24.0 - d_tau * (12.0 - d_tau * (4.0 - d_tau)))
        decay = jnp.where(d_tau < 1.0e-3, decay_taylor, jnp.exp(-jnp.minimum(d_tau, 200.0)))
        # (reference uses the taylor branch below dtau_abs<1e-3 on the scatter
        # path and dtau<1e-3 otherwise; the scales are equal to rounding)
        w_new = jnp.where(inter & ~absorbed, p.w * decay, p.w)

        # Scatter lanes roll back to the pre-step state and re-push by frac*dl.
        roll = scatter & ~absorbed
        p = p._replace(
            x=jnp.where(roll[:, None], x2_, p.x),
            k=jnp.where(roll[:, None], k2_, p.k),
            dkdlam=jnp.where(roll[:, None], dk2_, p.dkdlam),
            e_0_s=jnp.where(roll, e0s2_, p.e_0_s),
            pend_dl=jnp.where(roll, dl * frac, p.pend_dl),
            sec_w=jnp.where(roll, sec_w, p.sec_w),
            pend_push=p.pend_push | roll,
            w=w_new,
            tau_abs=jnp.where(inter & ~absorbed, p.tau_abs + d_tau_abs_eff, p.tau_abs),
            tau_scatt=jnp.where(inter & ~absorbed, p.tau_scatt + d_tau_scatt_eff, p.tau_scatt),
            alpha_scatti=alpha_scatti,
            alpha_absi=alpha_absi,
            bi=bi,
            interacting=jnp.where(
                inter, (alpha_scatti > 0.0) | (alpha_absi > 0.0) | (fs.n_e > 0.0),
                p.interacting,
            ),
            alive=p.alive & ~absorbed,
        )

        # Step count bookkeeping (consts.hpp:55; the cap is configurable —
        # the reference tolerates 1.28e6-step stragglers at scalar cost, but
        # in lockstep batches they dominate wall-clock).
        stepped = moving
        n_step = p.n_step + stepped.astype(jnp.int32)
        over = stepped & (n_step > cfg.stall_steps)
        p = p._replace(n_step=n_step, alive=p.alive & ~over)

        return state._replace(pool=p, key=key, it=state.it + 1)

    # ------------------------------------------------------------------
    # periodic phase: scatter events, record, refill, init
    # ------------------------------------------------------------------
    def spectrum_add(spec, counters, p: Pool):
        """Record escaped photons (harm_model.cpp:1291-1335) via scatter-add."""
        rec = p.record_pending & ~(jnp.isnan(p.w) | jnp.isnan(p.e))

        dx2 = (mc.x_stop[2] - mc.x_start[2]) / (2.0 * consts.N_TH_BINS)
        mid = 0.5 * (mc.x_start[2] + mc.x_stop[2])
        ix2 = jnp.where(
            p.x[:, 2] < mid,
            jnp.floor(p.x[:, 2] / dx2),
            jnp.floor((mc.x_stop[2] - p.x[:, 2]) / dx2),
        ).astype(jnp.int32)
        l_e = jnp.log(jnp.maximum(p.e, 1e-30))
        i_e = (
            jnp.floor((l_e - consts.spectrum.L_E_0) / consts.spectrum.D_L_E + 2.5).astype(
                jnp.int32
            )
            - 2
        )
        in_bins = (ix2 >= 0) & (ix2 < consts.N_TH_BINS) & (i_e >= 0) & (i_e < consts.N_E_BINS)
        ok = rec & in_bins

        idx = jnp.where(ok, ix2 * consts.N_E_BINS + i_e, DUMP_BIN)
        w = p.w.astype(jnp.float64)
        vals = jnp.stack(
            [
                w,
                w * p.e,
                jnp.ones_like(w),
                p.n_scatt.astype(jnp.float64),
                w * p.x1i,
                w * p.x2i * p.x2i,
                w * p.x[:, 3] * p.x[:, 3],
                w * p.tau_abs,
                w * p.tau_scatt,
                w * p.n_e_0,
                w * p.theta_e_0,
                w * p.b_0,
                w * p.e_0,
            ],
            axis=-1,
        )
        vals = jnp.where(ok[:, None], vals, 0.0)
        spec = spec.at[idx].add(vals)

        counters = counters._replace(
            n_recorded=counters.n_recorded + jnp.sum(ok).astype(jnp.int64),
            n_scatt_rec=counters.n_scatt_rec
            + jnp.sum(jnp.where(ok, p.n_scatt, 0)).astype(jnp.int64),
            max_tau_scatt=jnp.maximum(
                counters.max_tau_scatt, jnp.max(jnp.where(ok, p.tau_scatt, 0.0))
            ),
        )
        # Free recorded (and unrecordable) lanes.
        p = p._replace(
            occupied=p.occupied & ~p.record_pending,
            record_pending=jnp.zeros_like(p.record_pending),
        )
        return spec, counters, p

    def process_scatters(key, p: Pool, sec: SecBuf, counters):
        """Run deferred scatter events; pack secondaries into the buffer."""
        ev = p.at_event

        g_cov, fs = eval_fluid(p.x)
        res = scattering.scatter_event(key, p.k, fs, g_cov, mc.b_unit)

        parent_die = ev & res.parent_die
        make = ev & res.made & (fs.n_e > 0.0) & ~res.parent_die

        # Post-event opacity refresh for surviving parents (:1026-1039).
        theta, nu, a_scf, a_abf = eval_alphas(p.k, fs)
        neg = nu < 0.0
        survivors = ev & ~parent_die
        p = p._replace(
            alpha_scatti=jnp.where(survivors, jnp.where(neg, 0.0, a_scf), p.alpha_scatti),
            alpha_absi=jnp.where(survivors, jnp.where(neg, 0.0, a_abf), p.alpha_absi),
            bi=jnp.where(survivors, bias_func(fs.theta_e, p.w, counters), p.bi),
            w=jnp.where(parent_die, 0.0, p.w),
            alive=p.alive & ~parent_die,
            occupied=p.occupied & ~parent_die,
            at_event=jnp.zeros_like(p.at_event),
        )

        # Pack secondaries at sec.count + prefix ranks.
        rank = jnp.cumsum(make.astype(jnp.int32)) - 1
        pos = sec.count + rank
        room = pos < cfg.sec_cap
        put = make & room
        dropped = jnp.sum(make & ~room)
        # Non-writing lanes get an out-of-range slot; mode="drop" discards them
        # (a masked scatter: collision-free by the uniqueness of prefix ranks).
        slot = jnp.where(put, pos, cfg.sec_cap)

        def put_f(buf, vals):
            return buf.at[slot].set(vals, mode="drop")

        sec = sec._replace(
            x=put_f(sec.x, p.x),
            k=put_f(sec.k, res.k_sec),
            w=put_f(sec.w, p.sec_w),
            e=put_f(sec.e, res.e_sec),
            l=put_f(sec.l, res.l_sec),
            n_e_0=put_f(sec.n_e_0, p.n_e_0),
            theta_e_0=put_f(sec.theta_e_0, p.theta_e_0),
            b_0=put_f(sec.b_0, fs.b),
            e_0=put_f(sec.e_0, p.e_0),
            n_scatt=put_f(sec.n_scatt, p.n_scatt + 1),
            count=sec.count + jnp.sum(put).astype(jnp.int32),
        )
        counters = counters._replace(
            n_sec_drop=counters.n_sec_drop + dropped.astype(jnp.int64)
        )
        return p, sec, counters

    def refill(p: Pool, sec: SecBuf, backlog, backlog_pos, counters):
        """Fill free slots: secondaries (LIFO) first, then backlog primaries."""
        free = ~p.occupied
        n = p.w.shape[0]
        t_total = backlog.x.shape[0]

        rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
        n_sec = sec.count
        from_sec = free & (rank < n_sec)
        sec_idx = jnp.clip(n_sec - 1 - rank, 0, cfg.sec_cap - 1)

        bl_off = rank - n_sec
        bl_idx = backlog_pos + jnp.maximum(bl_off, 0)
        from_bl = free & (rank >= n_sec) & (bl_idx < t_total)
        bl_idx = jnp.clip(bl_idx, 0, t_total - 1)

        load = from_sec | from_bl

        def pick4(sec_f, bl_f, cur):
            v = jnp.where(from_sec[:, None], sec_f[sec_idx], bl_f[bl_idx])
            return jnp.where(load[:, None], v, cur)

        def pick1(sec_f, bl_f, cur):
            v = jnp.where(from_sec, sec_f[sec_idx], bl_f[bl_idx])
            return jnp.where(load, v, cur)

        x = pick4(sec.x, backlog.x, p.x)
        k = pick4(sec.k, backlog.k, p.k)
        w = pick1(sec.w, backlog.w, p.w)
        e = pick1(sec.e, backlog.e, p.e)
        lq = pick1(sec.l, backlog.l, p.l)
        n_e_0 = pick1(sec.n_e_0, backlog.n_e_0, p.n_e_0)
        theta_e_0 = pick1(sec.theta_e_0, backlog.theta_e_0, p.theta_e_0)
        b_0 = pick1(sec.b_0, backlog.b_0, p.b_0)
        e_0 = pick1(sec.e_0, backlog.e_0, p.e_0)
        n_sc = jnp.where(
            load,
            jnp.where(from_sec, sec.n_scatt[sec_idx], backlog.n_scatt[bl_idx]),
            p.n_scatt,
        )

        # Invalid photons are dropped on load (harm_model.cpp:895-900).
        bad = (
            jnp.any(jnp.isnan(x), axis=-1) | jnp.any(jnp.isnan(k), axis=-1) | (w == 0.0)
        )
        ok = load & ~bad

        zero = jnp.zeros_like(w)
        p = p._replace(
            x=x, k=k, w=w, e=e, l=lq, n_e_0=n_e_0, theta_e_0=theta_e_0, b_0=b_0,
            e_0=e_0,
            e_0_s=jnp.where(load, e, p.e_0_s),
            x1i=jnp.where(load, x[:, 1], p.x1i),
            x2i=jnp.where(load, x[:, 2], p.x2i),
            tau_abs=jnp.where(load, zero, p.tau_abs),
            tau_scatt=jnp.where(load, zero, p.tau_scatt),
            n_scatt=n_sc,
            n_step=jnp.where(load, 0, p.n_step),
            pend_dl=jnp.where(load, zero, p.pend_dl),
            sec_w=jnp.where(load, zero, p.sec_w),
            dl_shrink=jnp.where(load, jnp.ones_like(p.dl_shrink), p.dl_shrink),
            occupied=p.occupied | ok,
            alive=p.alive | ok,
            pend_push=p.pend_push & ~load,
            at_event=p.at_event & ~load,
            record_pending=p.record_pending & ~load,
        )

        n_from_sec = jnp.sum(from_sec).astype(jnp.int32)
        n_from_bl = jnp.sum(from_bl).astype(jnp.int32)
        sec = sec._replace(count=sec.count - n_from_sec)
        counters = counters._replace(
            n_created=counters.n_created + n_from_bl.astype(jnp.int64)
        )
        return p, sec, backlog_pos + n_from_bl, counters, ok

    def init_fresh(p: Pool, fresh, counters):
        """Track-start initialisation (harm_model.cpp:902-915) for new lanes."""
        conn = geometry.connection(p.x, a, hs)
        dkdlam0 = geometry.geodesic_rhs(conn, p.k)

        g_cov, fs = eval_fluid(p.x)
        theta, nu, a_sc, a_ab = eval_alphas(p.k, fs)
        inside = fs.n_e > 0.0
        b0 = bias_func(fs.theta_e, p.w, counters)

        return p._replace(
            dkdlam=jnp.where(fresh[:, None], dkdlam0, p.dkdlam),
            alpha_scatti=jnp.where(fresh, jnp.where(inside, a_sc, 0.0), p.alpha_scatti),
            alpha_absi=jnp.where(fresh, jnp.where(inside, a_ab, 0.0), p.alpha_absi),
            bi=jnp.where(fresh, jnp.where(inside, b0, 0.0), p.bi),
            interacting=jnp.where(fresh, inside, p.interacting),
        )

    def periodic_phase(state: State, backlog) -> State:
        p, spec, counters, sec = state.pool, state.spec, state.counters, state.sec
        key, k_sc = random.split(state.key)

        # NaN insurance: poisoned lanes die unrecorded.
        poison = p.occupied & (
            jnp.any(jnp.isnan(p.x), axis=-1)
            | jnp.any(jnp.isnan(p.k), axis=-1)
            | jnp.isnan(p.w)
        )
        p = p._replace(
            alive=p.alive & ~poison,
            occupied=p.occupied & ~poison,
            record_pending=p.record_pending & ~poison,
            at_event=p.at_event & ~poison,
        )

        p, sec, counters = process_scatters(k_sc, p, sec, counters)
        spec, counters, p = spectrum_add(spec, counters, p)
        # Free dead-but-unrecorded lanes (horizon, roulette, absorbed).
        p = p._replace(occupied=p.occupied & (p.alive | p.record_pending))
        p, sec, backlog_pos, counters, fresh = refill(
            p, sec, backlog, state.backlog_pos, counters
        )
        p = init_fresh(p, fresh, counters)

        return state._replace(
            pool=p, spec=spec, counters=counters, sec=sec,
            backlog_pos=backlog_pos, key=key,
        )

    # ------------------------------------------------------------------
    # drivers
    # ------------------------------------------------------------------
    def run(state: State, backlog) -> State:
        t_total = backlog.x.shape[0]

        def cond(state):
            return (
                (jnp.sum(state.pool.occupied) > cfg.tail_exit)
                | (state.backlog_pos < t_total)
                | (state.sec.count > 0)
            ) & (state.it < cfg.max_outer)

        def body(state):
            state = lax.cond(
                state.it % cfg.m_period == 0,
                lambda s: periodic_phase(s, backlog),
                lambda s: s,
                state,
            )
            return hot_step(state)

        state = lax.while_loop(cond, body, state)
        # Final flush of any pending records (all lanes are dead here).
        p, spec, counters = state.pool, state.spec, state.counters
        spec, counters, p = spectrum_add(spec, counters, p)
        return state._replace(pool=p, spec=spec, counters=counters)

    def fresh_state(key):
        return State(
            pool=empty_pool(cfg.n_pool, dt),
            spec=jnp.zeros((N_BINS + 1, N_SPEC_CHAN), jnp.float64),
            counters=init_counters(mc.max_tau_scatt0, dt),
            sec=empty_secbuf(cfg.sec_cap, dt),
            backlog_pos=jnp.zeros((), jnp.int32),
            key=key,
            it=jnp.zeros((), jnp.int32),
        )

    return {
        "run": run,
        "hot_step": hot_step,
        "periodic_phase": periodic_phase,
        "push_batch": push_batch,
        "fresh_state": fresh_state,
        "bias_func": bias_func,
    }

"""Fused Pallas TPU kernels for the transport hot iteration.

The hot iteration is lane-local math except for (a) the bilinear
corner-row gather and (b) the RNG draws.  The XLA path runs it as ~15
separate fusions with VMEM<->HBM round trips between them; this module
fuses each half into one Mosaic kernel:

    K1  = engine.hot_phase_a  (step size, geodesic push attempt, per-lane
          shrink control, partial-re-push bookkeeping, stop criterion +
          Russian roulette, bilinear cell index)
    XLA = ``corner_rows[z]`` row gather — stays outside: the TPU dynamic
          row gather is hardware-bound (~1.5 ns/row) and Mosaic cannot
          beat it in-kernel
    K2  = engine.hot_phase_b  (bilinear fluid blend, photon-fluid
          kinematics, Chebyshev opacities, biased scatter decision,
          rollback, weight decay, step accounting)

The kernel bodies call the SAME module-level phase functions as the XLA
engine (engine.hot_phase_a/b), so the two backends cannot drift; the
parity test (tests/test_pallas_hot.py) runs the kernels in interpret mode
on CPU against the XLA path and asserts exact field equality.  Uniform
draws come from the caller's threefry stream exactly as in the XLA path.

Mosaic constraints shaped three design points (kept here so they aren't
re-learned):

* rank-1 lane vectors crash layout inference (layout.h implicit_dim
  check) and (1, blk) leading blocks violate the (8, 128) tiling rule —
  so every (N,) pool field travels as (N/128, 128) with (blk/128, 128)
  blocks, and the (4, N) vectors are split into four such components.
  The gathered rows go in as (N/128, 128, 32) so ``rows[..., m]``
  broadcasts against the lane shape.
* i1 vector stores at kernel outputs fail to legalize, and so do the
  int8<->i1 trunci/extui conversions — masks cross the boundary as
  engine-dtype floats (0.0/1.0) written with a select and re-entered
  with a `!= 0` compare.
* under jax_enable_x64, python float literals trace as weak f64 scalars
  and Mosaic has no f64 converts — the kernel bodies trace under
  ``jax.enable_x64(False)`` (the XLA f32 path does the same, keeping the
  two backends bitwise identical).

Reference for the fused-step shape: the CUDA engine's per-photon kernel
pipeline (super_photon.cu:1207-1472) — one thread does push + interact
back to back; here one VREG lane does, with the pool blocked over a 1-D
grid so Mosaic double-buffers the HBM<->VMEM block DMAs.

Gated by ``EngineConfig.pallas_hot`` (TPU only).
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The fused kernels chain several hundred elementwise ops (40 Christoffel
# terms, Chebyshev FMA chains, ...); tracing/lowering recurses over the
# expression tree and blows the default 1000-frame Python limit.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

from grmonty_tpu.transport import engine as engine_mod

LANE = 128


def make_pallas_hot_phases(mc, cfg, hc_coeffs, k2_coeffs, weight_min,
                           shrink_floor, n_pool, dtype, interpret=False,
                           detached=False):
    """Build (phase_a_call, phase_b_call): fused Mosaic kernels over a
    lane-blocked grid.  All per-lane operands are (n_pool/128, 128).

    With ``detached`` (EngineConfig.detached_events), phase A additionally
    emits the ``arrived`` mask and phase B the raw refresh values
    (a_scf/a_abf/bf/nu) that engine._capture_events consumes — the capture
    itself stays in XLA after the kernels (elementwise, ~10 lane arrays).
    Gated so the default config's kernel artifacts are unchanged."""
    blk = min(n_pool, int(cfg.pallas_block))
    assert n_pool % blk == 0 and blk % (8 * LANE) == 0, (n_pool, blk)
    grid = (n_pool // blk,)
    rows2 = n_pool // LANE
    brows = blk // LANE
    f = dtype
    i32 = jnp.int32

    def mf(m):
        # bool -> {0,1} in the engine float dtype via select: Mosaic has no
        # vector trunci/extui to or from i1, so masks cross the kernel
        # boundary as floats and re-enter with a `!= 0` compare.
        return jnp.where(m, jnp.ones((), f), jnp.zeros((), f))

    lane_spec = pl.BlockSpec((brows, LANE), lambda i: (i, 0))
    rows_spec = pl.BlockSpec((brows, LANE, 32), lambda i: (i, 0, 0))
    hc_spec = pl.BlockSpec(
        (hc_coeffs.shape[0], hc_coeffs.shape[1]), lambda i: (0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def sds(dt):
        return jax.ShapeDtypeStruct((rows2, LANE), dt)

    # ---------------- phase A ----------------
    # inputs: x0-3 k0-3 dk0-3 | e0s shr pdl w | pp ae al rp | u
    # outputs: same 12+4+4 | seg commit moving wasp stopped | z
    def kernel_a(*refs):
        ins = refs[:21]
        outs = refs[21:]
        x = tuple(ins[i][...] for i in range(4))
        k = tuple(ins[4 + i][...] for i in range(4))
        dk = tuple(ins[8 + i][...] for i in range(4))
        e0s, shr, pdl, w = (ins[12][...], ins[13][...], ins[14][...],
                            ins[15][...])
        pp, ae, al, rp = (ins[16][...] != 0, ins[17][...] != 0,
                          ins[18][...] != 0, ins[19][...] != 0)
        u = ins[20][...]
        with jax.enable_x64(False):
            A = engine_mod.hot_phase_a(
                x, k, dk, e0s, shr, pdl, pp, ae, al, w, rp, u,
                mc, cfg.fp_iters, weight_min, shrink_floor,
                cfg.ref_err_metric, cfg.grow_cap, cfg.grow_rate,
                step_ctrl=cfg.step_ctrl,
            )
        vals = (
            list(A["x"]) + list(A["k"]) + list(A["dkdlam"])
            + [A["e_0_s"], A["dl_shrink"], A["pend_dl"], A["w"]]
            + [mf(A[m]) for m in
               ("pend_push", "at_event", "alive", "record_pending")]
            + [A["seg"]]
            + [mf(A[m]) for m in
               ("commit", "moving", "was_pend", "stopped")]
            + [A["z"]]
            + ([mf(A["arrived"])] if detached else [])
        )
        for ref, v in zip(outs, vals):
            ref[...] = v

    a_out_shape = ([sds(f)] * 25 + [sds(i32)]
                   + ([sds(f)] if detached else []))
    phase_a_call = pl.pallas_call(
        kernel_a,
        grid=grid,
        in_specs=[lane_spec] * 21,
        out_specs=[lane_spec] * len(a_out_shape),
        out_shape=a_out_shape,
        interpret=interpret,
    )

    # ---------------- phase B ----------------
    # array inputs (46): rows hc | x0-3 k0-3 dk0-3 | e0s w asc aab bi ta
    #   ts pdl sw | pp inter al | xp0-3 kp0-3 dkp0-3 e0sp |
    #   seg commit moving wasp stopped | ns u
    # then the SMEM bias scalar; outputs follow.
    def kernel_b(*refs):
        ins = refs[:46]
        bs_ref = refs[46]
        outs = refs[47:]
        rows = ins[0][...]
        hc = ins[1][...]
        x = tuple(ins[2 + i][...] for i in range(4))
        k = tuple(ins[6 + i][...] for i in range(4))
        dk = tuple(ins[10 + i][...] for i in range(4))
        (e0s, w, asc, aab, bi, ta, ts, pdl, sw) = (
            ins[14][...], ins[15][...], ins[16][...], ins[17][...],
            ins[18][...], ins[19][...], ins[20][...], ins[21][...],
            ins[22][...])
        pp, inter, al = (ins[23][...] != 0, ins[24][...] != 0,
                         ins[25][...] != 0)
        xp = tuple(ins[26 + i][...] for i in range(4))
        kp = tuple(ins[30 + i][...] for i in range(4))
        dkp = tuple(ins[34 + i][...] for i in range(4))
        e0sp = ins[38][...]
        seg = ins[39][...]
        commit, moving, wasp, stopped = (
            ins[40][...] != 0, ins[41][...] != 0, ins[42][...] != 0,
            ins[43][...] != 0)
        ns = ins[44][...]
        u = ins[45][...]
        bs = bs_ref[0]
        with jax.enable_x64(False):
            B = engine_mod.hot_phase_b(
                rows, x, k, dk, e0s, w, asc, aab, bi, ta, ts, inter,
                pdl, pp, sw, ns, al,
                xp, kp, dkp, e0sp,
                seg, commit, moving, wasp, stopped, u, bs,
                mc, hc, k2_coeffs, weight_min, cfg.stall_steps,
            )
        vals = (
            list(B["x"]) + list(B["k"]) + list(B["dkdlam"])
            + [B["e_0_s"], B["w"], B["alpha_scatti"], B["alpha_absi"],
               B["bi"], B["tau_abs"], B["tau_scatt"], B["pend_dl"],
               B["sec_w"]]
            + [mf(B[m]) for m in
               ("pend_push", "interacting", "alive")]
            + [B["n_step"]]
            + ([B["a_scf"], B["a_abf"], B["bf"], B["nu"]]
               if detached else [])
        )
        for ref, v in zip(outs, vals):
            ref[...] = v

    b_out_shape = ([sds(f)] * 24 + [sds(i32)]
                   + ([sds(f)] * 4 if detached else []))
    phase_b_call = pl.pallas_call(
        kernel_b,
        grid=grid,
        in_specs=([rows_spec, hc_spec] + [lane_spec] * 44 + [smem_spec]),
        out_specs=[lane_spec] * len(b_out_shape),
        out_shape=b_out_shape,
        interpret=interpret,
    )
    return phase_a_call, phase_b_call


def make_hot_step(mc, cfg, hc_coeffs, k2_coeffs, corner_rows, weight_min,
                  shrink_floor, bias_scale_fn, interpret=False):
    """Drop-in replacement for the engine's hot_step using the fused
    kernels.  Stream-identical to the XLA hot_step_shared."""
    import jax.random as random

    dt = cfg.dtype
    detached = cfg.detached_events
    hc_dev = jnp.asarray(hc_coeffs, dt)
    phase_a_call, phase_b_call = make_pallas_hot_phases(
        mc, cfg, hc_dev, k2_coeffs, weight_min,
        shrink_floor, cfg.n_pool, dt, interpret=interpret,
        detached=detached,
    )

    def hot_step(state):
        p = state.pool
        n = p.w.shape[0]
        key, k_roul2, k_x1 = random.split(state.key, 3)
        u_roul = random.uniform(k_roul2, p.w.shape, dt)
        u_x1 = random.uniform(k_x1, p.w.shape, dt)

        r2 = lambda a: a.reshape(n // LANE, LANE)
        m8 = lambda m: r2(m.astype(dt))
        comps = lambda v: [r2(v[i]) for i in range(4)]

        # x64 must be off while the pallas_calls trace: the BlockSpec index
        # maps return python-int literals which otherwise bind as i64 —
        # Mosaic then fails to legalize the index-map func.return (i32, i64).
        with jax.enable_x64(False):
            a_out = phase_a_call(
                *comps(p.x), *comps(p.k), *comps(p.dkdlam),
                r2(p.e_0_s), r2(p.dl_shrink), r2(p.pend_dl), r2(p.w),
                m8(p.pend_push), m8(p.at_event), m8(p.alive),
                m8(p.record_pending), r2(u_roul),
            )
        (xa0, xa1, xa2, xa3, ka0, ka1, ka2, ka3, dka0, dka1, dka2, dka3,
         e0sa, shra, pdla, wa, ppa, aea, ala, rpa,
         seg, commit, moving, wasp, stopped, z) = a_out[:26]
        arrived = a_out[26] if detached else None

        rows = corner_rows[z.reshape(n)].reshape(n // LANE, LANE, 32)
        bias_scale = jnp.reshape(
            bias_scale_fn(state.counters).astype(dt), (1,))

        with jax.enable_x64(False):
            b_out = phase_b_call(
                rows, hc_dev,
                xa0, xa1, xa2, xa3, ka0, ka1, ka2, ka3,
                dka0, dka1, dka2, dka3,
                e0sa, wa, r2(p.alpha_scatti), r2(p.alpha_absi), r2(p.bi),
                r2(p.tau_abs), r2(p.tau_scatt), pdla, r2(p.sec_w),
                ppa, m8(p.interacting), ala,
                *comps(p.x), *comps(p.k), *comps(p.dkdlam), r2(p.e_0_s),
                seg, commit, moving, wasp, stopped,
                r2(p.n_step), r2(u_x1), bias_scale,
            )
        (xb0, xb1, xb2, xb3, kb0, kb1, kb2, kb3, dkb0, dkb1, dkb2, dkb3,
         e0sb, wb, ascb, aabb, bib, tab, tsb, pdlb, swb,
         ppb, interb, alb, nsb) = b_out[:25]

        fl = lambda a: a.reshape(n)
        bl = lambda m: m.reshape(n) != 0
        vec = lambda c0, c1, c2, c3: (fl(c0), fl(c1), fl(c2), fl(c3))
        p = p._replace(
            x=vec(xb0, xb1, xb2, xb3), k=vec(kb0, kb1, kb2, kb3),
            dkdlam=vec(dkb0, dkb1, dkb2, dkb3), e_0_s=fl(e0sb),
            dl_shrink=fl(shra), pend_dl=fl(pdlb), pend_push=bl(ppb),
            at_event=bl(aea), w=fl(wb), alive=bl(alb),
            record_pending=bl(rpa),
            tau_abs=fl(tab), tau_scatt=fl(tsb),
            alpha_scatti=fl(ascb), alpha_absi=fl(aabb), bi=fl(bib),
            interacting=bl(interb), sec_w=fl(swb), n_step=fl(nsb),
        )
        if detached:
            # Same capture the XLA hot_step_shared runs — elementwise in
            # XLA on the kernel outputs (engine._capture_events draws no
            # randomness, so the threefry stream stays kernel-identical).
            a_scf, a_abf, bf, nu = (fl(b_out[25]), fl(b_out[26]),
                                    fl(b_out[27]), fl(b_out[28]))
            with jax.enable_x64(False):
                p = p._replace(**engine_mod._capture_events(
                    state.pool, bl(arrived), p.at_event, p.x, p.k,
                    p.w, p.sec_w, p.alive,
                    p.alpha_scatti, p.alpha_absi, p.bi,
                    a_scf, a_abf, bf, nu,
                ))
        counters = engine_mod._util_counters(
            state.counters, p.occupied, bl(moving), bl(commit), p.at_event)
        return state._replace(pool=p, counters=counters, key=key,
                              it=state.it + 1)

    return hot_step

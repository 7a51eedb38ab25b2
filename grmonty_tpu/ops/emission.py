"""Superphoton emission: importance tables, zone budgets, batched sampling.

Equivalent of the reference's emission subsystem:

* ``init_weight_table``  (harm_model.cpp:268-306)  -> :func:`weight_table`
* ``init_nint_table``    (harm_model.cpp:308-338)  -> :func:`nint_table`
* ``init_zone``          (harm_model.cpp:1337-1389)-> :func:`zone_budgets`
* ``get_zone`` stochastic rounding (:693-697)      -> :func:`zone_counts`
* ``sample_zone_photon`` (harm_model.cpp:706-782)  -> :func:`sample_photons`

The reference feeds zones one at a time through a producer thread + 4
sampling workers + a bounded queue (harm_model.cpp:813-892, utils.hpp).
Here the whole emission pass is three vectorized device computations: per-zone
expected counts for all zones at once, stochastically rounded counts, then
one masked-rejection sampling pass over the full photon batch (each photon
carries its zone id; per-zone state is gathered).
"""

import math
import typing

import jax.numpy as jnp
import numpy as np
from jax import lax, random

from grmonty_tpu import consts
from grmonty_tpu.ops import jnu, tetrads

PI = math.pi

_MAX_REJECT_ITERS = 1024


def weight_table(fluid_zone, g_det, mc, photon_n, f_table, k2_table):
    """ln(photon weight) vs frequency, (N_E_SAMP + 1,) (harm_model.cpp:268-306).

    Sums the per-zone emissivity proxy over all zones at each table frequency.
    ``fluid_zone``: FluidState of (n1, n2) arrays; ``g_det``: (n1, n2).
    """
    nu = jnp.exp(jnp.arange(consts.N_E_SAMP + 1) * consts.D_L_NU + consts.L_NU_MIN)

    s_fac = mc.dx[1] * mc.dx[2] * mc.dx[3]  # times l_unit^3 below
    l_unit3 = (mc_l_unit(mc)) ** 3

    k2 = jnu.k2_eval(fluid_zone.theta_e, k2_table)  # (n1, n2)
    live = (fluid_zone.n_e > 0.0) & (fluid_zone.theta_e >= consts.THETA_E_MIN) & (k2 > 0.0)
    fac = jnp.where(
        live,
        (consts.JCST * fluid_zone.n_e * fluid_zone.b * fluid_zone.theta_e**2 / (k2 + consts.EPS))
        * s_fac
        * l_unit3
        * g_det,
        0.0,
    )

    f = jnu.f_eval(
        fluid_zone.theta_e[..., None], fluid_zone.b[..., None], nu, f_table
    )  # (n1, n2, S+1)
    f = jnp.where(live[..., None], f, 0.0)
    sums = jnp.einsum("ij,ijk->k", fac, f)
    return jnp.log(sums / (consts.HPL * photon_n) + 1e-300)


def mc_l_unit(mc):
    """l_unit recovered from d_tau_k (kept out of ModelConsts to avoid dupes)."""
    return mc.d_tau_k * (consts.ME * consts.CL * consts.CL / consts.HBAR) / (2.0 * PI)


def nint_table(weights, mc, f_table):
    """(ln nint, ln dndlnu_max) vs ln(B theta_e^2), each (NINT + 1,)
    (harm_model.cpp:308-338)."""
    b_mag = jnp.exp(jnp.arange(consts.NINT + 1) * consts.D_L_B + consts.L_B_MIN)
    nu = jnp.exp(jnp.arange(consts.N_E_SAMP) * consts.D_L_NU + consts.L_NU_MIN)

    dn = jnu.f_eval(1.0, b_mag[:, None], nu[None, :], f_table) / (
        jnp.exp(weights[: consts.N_E_SAMP])[None, :] + 1.0e-100
    )
    dndlnu_max = jnp.max(dn, axis=1)
    nint = jnp.sum(consts.D_L_NU * dn, axis=1)
    nint = nint * (
        mc.dx[1]
        * mc.dx[2]
        * mc.dx[3]
        * mc_l_unit(mc) ** 3
        * math.sqrt(2.0)
        * consts.EE**3
        / (27.0 * consts.ME * consts.CL * consts.CL)
        / consts.HPL
    )
    return jnp.log(nint + 1e-300), jnp.log(dndlnu_max + 1e-300)


def zone_budgets(fluid_zone, g_det, nint_tab, dndlnu_max_tab, k2_table, photon_n):
    """Expected photon count nz and rejection envelope dn_max for every zone
    (harm_model.cpp:1337-1389).  Returns (nz, dn_max), each (n1, n2)."""
    theta_e = fluid_zone.theta_e
    b = fluid_zone.b

    l_bth = jnp.log(jnp.maximum(b * theta_e * theta_e, 1e-300))
    d_l = (l_bth - consts.L_B_MIN) / consts.D_L_B
    # Truncation toward zero (C++ int cast): d_l in (-1, 0) lands in bin 0
    # with a negative fraction (mild extrapolation), as in the reference.
    l_idx = jnp.trunc(d_l).astype(jnp.int32)
    frac = d_l - l_idx
    # Deviation: the reference recomputes out-of-table zones with a direct
    # sweep (and its own index bug, harm_model.cpp:1358-1369); we clamp into
    # the 12-decade table instead (l >= NINT is unreachable for sane dumps).
    li = jnp.clip(l_idx, 0, consts.NINT - 1)
    ninterp = jnp.exp((1.0 - frac) * nint_tab[li] + frac * nint_tab[li + 1])
    dn_max = jnp.exp((1.0 - frac) * dndlnu_max_tab[li] + frac * dndlnu_max_tab[li + 1])

    k2 = jnu.k2_eval(theta_e, k2_table)
    nz = g_det * fluid_zone.n_e * b * theta_e * theta_e * ninterp / (k2 + consts.EPS)

    bad = (
        (fluid_zone.n_e <= 0.0)
        | (theta_e < consts.THETA_E_MIN)
        | (l_idx < 0)
        | (k2 <= 0.0)
        | (nz > photon_n * math.log(consts.NU_MAX / consts.NU_MIN))
    )
    return jnp.where(bad, 0.0, nz), jnp.where(bad, 0.0, dn_max)


def zone_counts(key, nz):
    """Stochastically round expected counts to integers (harm_model.cpp:693-697)."""
    u = random.uniform(key, nz.shape, nz.dtype)
    frac = nz - jnp.floor(nz)
    return (jnp.floor(nz) + (frac > u)).astype(jnp.int32)


class EmissionPlan(typing.NamedTuple):
    """Host-side plan: one entry per photon to create."""

    zone_i: np.ndarray  # (T,) int32
    zone_j: np.ndarray  # (T,) int32
    total: int


def plan_emission(counts: np.ndarray) -> EmissionPlan:
    """Expand per-zone counts into a flat photon -> zone map (host).

    Replaces the reference's zone sweep + producer queue: the 'queue' is just
    an index array.
    """
    counts = np.asarray(counts)
    flat = counts.reshape(-1)
    zone_ids = np.repeat(np.arange(flat.size, dtype=np.int64), flat)
    n2 = counts.shape[1]
    return EmissionPlan(
        zone_i=(zone_ids // n2).astype(np.int32),
        zone_j=(zone_ids % n2).astype(np.int32),
        total=int(flat.sum()),
    )


class InitPhotons(typing.NamedTuple):
    """SoA batch of freshly emitted photons (photon.hpp:41-52)."""

    x: jnp.ndarray  # (T, 4)
    k: jnp.ndarray  # (T, 4)
    w: jnp.ndarray
    e: jnp.ndarray
    l: jnp.ndarray
    n_e_0: jnp.ndarray
    theta_e_0: jnp.ndarray
    b_0: jnp.ndarray
    e_0: jnp.ndarray
    n_scatt: jnp.ndarray  # int32


def _interp_weight_ln(nu, weights):
    """ln(photon weight) at frequency nu from the log table
    (harm_model.cpp:784-792, kept in log space for TPU range safety)."""
    d_i = (jnp.log(nu) - consts.L_NU_MIN) / consts.D_L_NU
    i = jnp.clip(jnp.floor(d_i).astype(jnp.int32), 0, consts.N_E_SAMP - 1)
    frac = d_i - i
    return (1.0 - frac) * weights[i] + frac * weights[i + 1]


def _interp_weight(nu, weights):
    """Photon weight at frequency nu (harm_model.cpp:784-792)."""
    return jnp.exp(_interp_weight_ln(nu, weights))


def sample_photons(
    key,
    zone_i,
    zone_j,
    zone_x,
    fluid_zone,
    e_con_zone,
    e_cov_zone,
    ln_dn_max_zone,
    weights,
    f_table,
    dtype=jnp.float64,
    ln_w_offset=0.0,
) -> InitPhotons:
    """Sample one photon per (zone_i, zone_j) entry (harm_model.cpp:706-782).

    Per-zone precomputes (fluid state, tetrads from the field direction,
    rejection envelope) are gathered through the zone index arrays; the two
    rejection loops (frequency against the weight envelope, direction against
    the pitch-angle emissivity) run masked over the whole batch.

    TPU-native design: both accept tests run in LOG space — the envelope
    quantities span ~1e-70..1e50, far outside the f32 exponent range that
    bounds all TPU arithmetic (emulated f64 included), so the sampler takes
    ``ln_dn_max_zone`` = ln(dn_max) and compares ln U against
    ln F - ln w - ln dn_max; the direction test uses the prefactor-free
    ln[j(th)/j(pi/2)] (jnu.ln_synch_ratio), which also removes the K2 table
    from the sampler entirely.  The produced photon weight is
    exp(ln w + ln_w_offset): the driver passes ln(weight_scale) here so the
    weight leaves the sampler already in the engine's representable range.
    """
    zi, zj = zone_i, zone_j
    theta_e = fluid_zone.theta_e[zi, zj].astype(dtype)
    n_e = fluid_zone.n_e[zi, zj].astype(dtype)
    b = fluid_zone.b[zi, zj].astype(dtype)
    ln_dn_max = ln_dn_max_zone[zi, zj].astype(dtype)
    e_con = e_con_zone[zi, zj].astype(dtype)
    e_cov = e_cov_zone[zi, zj].astype(dtype)
    x = zone_x[zi, zj].astype(dtype)

    shape = theta_e.shape
    # Lanes pointing at dead zones (padding, or zones with no emission
    # budget) can never accept a draw; start them accepted so they don't
    # drive the masked loops to the iteration cap.
    dead = jnp.isneginf(ln_dn_max) | (theta_e < consts.THETA_E_MIN)

    # --- frequency rejection against the weight envelope (:736-740) -------
    def nu_body(state):
        key, nu, lnw, accepted, it = state
        key, k1, k2_ = random.split(key, 3)
        nu_new = jnp.exp(random.uniform(k1, shape, dtype) * consts.N_L_N + consts.L_NU_MIN)
        lnw_new = _interp_weight_ln(nu_new, weights)
        ln_ratio = (jnu.ln_f_eval(theta_e, b, nu_new, f_table)
                    - lnw_new - ln_dn_max)
        ln_u = jnp.log(random.uniform(k2_, shape, dtype) + 1e-300)
        accept = ln_u <= ln_ratio
        take = accept & ~accepted
        nu = jnp.where(take, nu_new, nu)
        lnw = jnp.where(take, lnw_new, lnw)
        return key, nu, lnw, accepted | accept, it + 1

    def nu_cond(state):
        *_, accepted, it = state
        return (~jnp.all(accepted)) & (it < _MAX_REJECT_ITERS)

    key, nu, lnw, _, _ = lax.while_loop(
        nu_cond,
        nu_body,
        (key, jnp.full(shape, consts.NU_MIN, dtype),
         jnp.full(shape, -jnp.inf, dtype), dead, 0),
    )
    w = jnp.exp(lnw + ln_w_offset)

    # --- direction rejection against j(theta)/j(pi/2) (:743-751) ----------
    # j(pi/2) = 0 exactly when the nu > 1e12 nu_s cutoff trips at sin = 1.
    nu_c = consts.EE * b / (2.0 * PI * consts.ME * consts.CL)
    j90_zero = nu > 1.0e12 * (2.0 / 9.0) * nu_c * theta_e * theta_e

    def th_body(state):
        key, cth, accepted, it = state
        key, k1, k2_ = random.split(key, 3)
        cth_new = 2.0 * random.uniform(k1, shape, dtype) - 1.0
        s_th = jnp.sqrt(jnp.maximum(1.0 - cth_new * cth_new, 1e-30))
        ln_ratio = jnu.ln_synch_ratio(nu, theta_e, b, s_th)
        ln_u = jnp.log(random.uniform(k2_, shape, dtype) + 1e-300)
        accept = ln_u <= ln_ratio
        cth = jnp.where(accept & ~accepted, cth_new, cth)
        return key, cth, accepted | accept, it + 1

    def th_cond(state):
        *_, accepted, it = state
        return (~jnp.all(accepted)) & (it < _MAX_REJECT_ITERS)

    key, cos_th, _, _ = lax.while_loop(
        th_cond, th_body, (key, jnp.zeros(shape, dtype), dead | j90_zero, 0)
    )

    sin_th = jnp.sqrt(1.0 - cos_th * cos_th)
    key, kp = random.split(key)
    phi = 2.0 * PI * random.uniform(kp, shape, dtype)

    e = nu * consts.HPL / (consts.ME * consts.CL * consts.CL)
    k_tetrad = jnp.stack(
        [e, e * cos_th, e * sin_th * jnp.cos(phi), e * sin_th * jnp.sin(phi)], axis=-1
    )
    k = tetrads.tetrad_to_coordinate(e_con, k_tetrad)

    k_tetrad = k_tetrad.at[..., 0].multiply(-1.0)
    tmp = tetrads.tetrad_to_coordinate(e_cov, k_tetrad)

    return InitPhotons(
        x=x,
        k=k,
        w=w,
        e=-tmp[..., 0],
        l=tmp[..., 3],
        n_e_0=n_e,
        theta_e_0=theta_e,
        b_0=b,
        e_0=-tmp[..., 0],
        n_scatt=jnp.zeros(shape, jnp.int32),
    )


def zone_tetrads(fluid_zone, g_cov, b_unit):
    """Per-zone emission tetrads from the field direction (harm_model.cpp:717-730).

    Trial vector: b_con * b_unit / b when magnetized, else the time axis
    (which make_tetrad's degeneracy fallback turns into the x1 axis).
    """
    b_code_mag = fluid_zone.b / b_unit
    b_hat = jnp.where(
        (fluid_zone.b > 0.0)[..., None],
        fluid_zone.b_con / jnp.maximum(b_code_mag, 1e-30)[..., None],
        jnp.zeros_like(fluid_zone.b_con).at[..., 0].set(1.0),
    )
    return tetrads.make_tetrad(fluid_zone.u_con, b_hat, g_cov)

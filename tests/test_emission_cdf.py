"""Inverse-CDF emission sampler vs the reference-semantics rejection
sampler: distribution equivalence (see emission.SamplerTables).

Both samplers target the same densities (frequency: dN/dlnnu ~ F/W per
zone, harm_model.cpp:736-740; direction: j(theta)/j(pi/2), :743-751), so
their draws must agree statistically.  Compared per test zone at 20k
draws: binned chi^2 over lnnu deciles and cos(theta) octiles, plus the
tail quantiles (the CDF sampler's exponential within-bin inversion must
preserve the spectral tail).
"""

import numpy as np
import pytest

from grmonty_tpu import consts


@pytest.fixture(scope="module")
def setup(torus_model):
    import jax.numpy as jnp

    from grmonty_tpu.models import harm  # noqa: F401
    from grmonty_tpu.ops import emission, fluid
    from grmonty_tpu.utils import cache

    model = torus_model
    mc = fluid.make_model_consts(model)
    zone_x, g_cov_z, g_con_z, g_det_z = fluid.precompute_zone_geometry(mc)
    prims = jnp.asarray(model.data.stacked())
    fz = fluid.get_fluid_zone(prims, g_cov_z, g_con_z, mc)
    f_table, k2_table = cache.jnu_tables()
    weights = emission.weight_table(fz, g_det_z, mc, 2000,
                                    jnp.asarray(f_table),
                                    jnp.asarray(k2_table))
    nint_t, dndmax_t = emission.nint_table(weights, mc, jnp.asarray(f_table))
    nz, dn_max = emission.zone_budgets(fz, g_det_z, nint_t, dndmax_t,
                                       jnp.asarray(k2_table), 2000)
    e_con_z, e_cov_z = emission.zone_tetrads(fz, g_cov_z, mc.b_unit)
    zm, lnr, cdf = emission.build_nu_cdf(fz, np.asarray(weights),
                                         np.asarray(f_table), np.asarray(nz))
    tabs = emission.SamplerTables(
        zone_map=jnp.asarray(zm), lnrho=jnp.asarray(lnr),
        cdf=jnp.asarray(cdf), theta_q=jnp.asarray(cache.theta_quantiles()))
    ln_dn = np.log(np.maximum(np.asarray(dn_max, np.float64), 1e-300))
    ln_dn += np.where(np.asarray(dn_max) > 0.0, 0.0, -np.inf)
    return dict(mc=mc, fz=fz, weights=weights, f_table=jnp.asarray(f_table),
                zone_x=zone_x, e_con_z=e_con_z, e_cov_z=e_cov_z,
                ln_dn=jnp.asarray(ln_dn), tabs=tabs, nz=np.asarray(nz),
                zm=zm)


def _draw(setup, zone, n, tabs):
    import jax
    import jax.numpy as jnp
    from jax import random

    from grmonty_tpu.ops import emission

    zi = jnp.full((n,), zone[0], jnp.int32)
    zj = jnp.full((n,), zone[1], jnp.int32)
    batch = emission.sample_photons(
        random.PRNGKey(42 if tabs is None else 43), zi, zj,
        setup["zone_x"], setup["fz"], setup["e_con_z"], setup["e_cov_z"],
        setup["ln_dn"], setup["weights"], setup["f_table"],
        dtype=jnp.float64, tabs=tabs,
    )
    # recover nu and cos(theta) from the tetrad-frame energy/direction:
    # e = h nu / me c^2; k_tetrad[1]/e = cos(theta)
    b = jax.device_get(batch)
    e = np.asarray(b.e_0)
    nu = e * consts.ME * consts.CL**2 / consts.HPL
    return nu, np.asarray(b.w)


def _test_zones(setup):
    nz = setup["nz"]
    zm = setup["zm"]
    idx = np.argwhere((nz > 0) & (zm >= 0))
    # spread: low/medium/high emission zones
    order = np.argsort(nz[idx[:, 0], idx[:, 1]])
    picks = [idx[order[len(order) // 4]], idx[order[len(order) // 2]],
             idx[order[-1]]]
    return [tuple(int(v) for v in p) for p in picks]


def test_nu_distribution_matches(setup):
    n = 20000
    for zone in _test_zones(setup):
        nu_rej, w_rej = _draw(setup, zone, n, None)
        nu_cdf, w_cdf = _draw(setup, zone, n, setup["tabs"])
        # Drop dud draws: the rejection sampler accepts ~2% of a hot
        # zone's photons in the global weight table's sentinel bins,
        # carrying weights ~1e-220 — physically null packets that the
        # roulette kills immediately.  The CDF build zeroes their density
        # outright (see build_nu_cdf), a deliberate deviation: compare
        # the real-photon distributions.
        real = np.exp(-150.0)
        ln_r = np.log(nu_rej[w_rej > real])
        ln_c = np.log(nu_cdf[w_cdf > real])
        # decile chi^2: counts of the CDF draws in the rejection deciles
        edges = np.quantile(ln_r, np.linspace(0, 1, 11))
        edges[0], edges[-1] = -np.inf, np.inf
        c = np.histogram(ln_c, edges)[0]
        exp = ln_c.size / 10.0
        chi2 = ((c - exp) ** 2 / exp).sum() / 9.0
        assert chi2 < 3.0, (zone, chi2, c)
        # tail agreement: 99th/99.9th percentile (the 99.9th has only ~20
        # draws beyond it at n=20000, so its MC scatter dominates)
        dln = consts.N_L_N / 511
        for q, tol in ((0.99, max(4 * dln, 0.12)), (0.999, 0.35)):
            assert abs(np.quantile(ln_r, q) - np.quantile(ln_c, q)) < tol, \
                (zone, q)
        # weights at matched frequencies agree by construction (W(nu));
        # mean weight within MC error
        assert abs(np.log(w_rej.mean() / w_cdf.mean())) < 0.2, zone


def test_costh_distribution_matches(setup):
    import jax
    import jax.numpy as jnp
    from jax import random

    from grmonty_tpu.ops import emission, jnu

    # direction density depends only on x90: check the table against
    # explicit rejection sampling at several x90 values
    rng = np.random.default_rng(5)
    for lx in (-6.0, -1.0, 0.5, 2.0, 5.0):
        x90 = 10.0**lx
        # rejection draws (numpy, exact density)
        acc = []
        while len(acc) < 20000:
            c = rng.uniform(-1, 1, 40000)
            s = np.sqrt(1 - c * c)
            # theta_e=1, b chosen so nu_s90 = 1 and nu = x90
            b_for_unit = (9.0 / 2.0) * 2.0 * np.pi * consts.ME * consts.CL / consts.EE
            ln_r = np.asarray(jnu.ln_synch_ratio(x90, 1.0, b_for_unit, s))
            u = rng.uniform(0, 1, c.size)
            acc.extend(c[np.log(u + 1e-300) <= ln_r].tolist())
        c_rej = np.asarray(acc[:20000])
        # table draws
        b_val = (9.0 / 2.0) * 2.0 * np.pi * consts.ME * consts.CL / consts.EE
        nu_arr = jnp.full((20000,), x90, jnp.float64)
        te_arr = jnp.ones((20000,), jnp.float64)
        b_arr = jnp.full((20000,), b_val, jnp.float64)
        _, c_tab = emission.sample_costh_cdf(
            random.PRNGKey(7), nu_arr, te_arr, b_arr, setup["tabs"],
            jnp.float64)
        c_tab = np.asarray(jax.device_get(c_tab))
        # octile chi^2 on |c| (density is symmetric)
        edges = np.quantile(np.abs(c_rej), np.linspace(0, 1, 9))
        edges[0], edges[-1] = 0.0, 1.0 + 1e-9
        cnt = np.histogram(np.abs(c_tab), edges)[0]
        exp = c_tab.size / 8.0
        chi2 = ((cnt - exp) ** 2 / exp).sum() / 7.0
        assert chi2 < 3.0, (lx, chi2, cnt)
        # symmetry
        assert abs(np.mean(c_tab)) < 0.02, lx

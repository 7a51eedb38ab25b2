"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest)."""

import os

import jax
import numpy as np
import pytest

from grmonty_tpu.transport import engine as engine_mod


@pytest.fixture(scope="module")
def dumps(tmp_path_factory):
    from grmonty_tpu.models import torus

    path = tmp_path_factory.mktemp("dumps") / "torus_dump"
    torus.write_torus_dump(str(path), n1=64, n2=32)
    return str(path)


def _cfg(pool):
    return engine_mod.EngineConfig(
        n_pool=pool, m_period=8, sec_cap=8 * pool, max_outer=40000,
        stall_steps=40000,
    )


def test_mesh_available():
    assert len(jax.devices()) >= 8, "conftest must provide an 8-device CPU mesh"


@pytest.fixture(scope="module")
def sharded_run(dumps):
    from grmonty_tpu.parallel import sharding

    sim = sharding.ShardedSimulation(
        dumps, photon_n=60, mass_unit=4.0e18, config=_cfg(64),
        emit_chunk=1024, n_devices=8, warmup=0,
    )
    spec, stats = sim.run()
    return spec, stats


def test_sharded_runs_and_records(sharded_run):
    spec, stats = sharded_run
    assert stats["n_devices"] == 8
    assert stats["n_recorded"] > 0
    nph = spec[: engine_mod.N_BINS, 2].sum()
    assert nph == stats["n_recorded"]  # counters psum == spectrum sum
    assert np.isfinite(spec[: engine_mod.N_BINS]).all()
    assert spec[: engine_mod.N_BINS, 1].sum() > 0


def test_sharded_matches_single_device(dumps, sharded_run):
    """Spectrum and accounting agree statistically with a single-device run
    of the same dump/photon budget (different RNG partitioning, so the
    comparison is statistical, not bitwise)."""
    from grmonty_tpu.transport import driver

    spec_s, stats_s = sharded_run

    sim1 = driver.Simulation(
        dumps, photon_n=60, mass_unit=4.0e18, config=_cfg(512),
        emit_chunk=1024, warmup=0,
    )
    spec_1, stats_1 = sim1.run()

    # comparable photon budgets were actually consumed
    assert stats_s["n_created"] == stats_1["n_created"]
    rec_ratio = stats_s["n_recorded"] / max(stats_1["n_recorded"], 1)
    assert 0.5 < rec_ratio < 2.0

    lum_s = spec_s[: engine_mod.N_BINS, 1].sum()
    lum_1 = spec_1[: engine_mod.N_BINS, 1].sum()
    assert lum_s > 0 and lum_1 > 0
    assert abs(np.log10(lum_s / lum_1)) < 0.7  # heavy-tailed weights, small n


def test_sharded_bench_knobs_terminate(tmp_path):
    """The bench profile's deviation knobs (detached_events, grow_cap,
    refill_period, mxu_extract, gather_split) at dryrun shapes MUST
    terminate on the 8-shard mesh.

    Regression test for the MULTICHIP_r02 rc=124 livelock: with a
    secondary ring sized small relative to the no-pilot Compton storm,
    every lane ends up holding an unconsumed scatter event while the ring
    is full — the ring-full backpressure then consumed no events, no lane
    could ever retire, and refill (which drains the ring into FREE lanes)
    never ran: occ/sec/pos frozen forever.  The engine now lifts the
    backpressure in exactly that wedged state (process_scatters, the
    reference's force_enqueue analogue, utils.hpp:79-83) and the sharded
    driver raises on a frozen progress signature instead of spinning.
    CI-runnable (no GRMONTY_SLOW gate): this is the shipped-configuration
    multi-chip signal that round 2 lost.
    """
    from grmonty_tpu.models import torus
    from grmonty_tpu.parallel import sharding

    # The wedge reproduced at exactly the dryrun shapes: a 32x16 torus at
    # M=4e19 (hot inner zones -> storm), 64-lane pools, 512-slot ring.
    path = str(tmp_path / "torus_32x16")
    torus.write_torus_dump(path, n1=32, n2=16)
    cfg = engine_mod.EngineConfig(
        n_pool=64, m_period=8, sec_cap=512, max_outer=20000,
        stall_steps=20000, detached_events=True, grow_cap=8.0,
        grow_rate=1.1892, refill_period=4, mxu_extract=True,
        gather_split=2, ev_k=32, refill_k=64,
    )
    sim = sharding.ShardedSimulation(
        path, photon_n=50, mass_unit=4.0e19, config=cfg,
        emit_chunk=64 * 8, n_devices=8, warmup=0,
    )
    spec, stats = sim.run()
    assert stats["n_recorded"] > 0
    assert np.isfinite(spec[: engine_mod.N_BINS]).all()


def _chi2_groups(spec_a, n_a, spec_b, n_b, group=20):
    """Coarse-group chi^2 between two spectra using each run's exact MC
    variance channel (sum((w e)^2), channel 13) — the same statistic as
    tools/validate_accuracy.py."""
    from grmonty_tpu import consts

    NB, NE = consts.N_TH_BINS, consts.N_E_BINS
    sa = spec_a[: NB * NE].reshape(NB, NE, -1)
    sb = spec_b[: NB * NE].reshape(NB, NE, -1)
    ng = NE // group
    e_a = sa[:, :, 1].sum(0)[: ng * group].reshape(ng, group).sum(1) / n_a
    e_b = sb[:, :, 1].sum(0)[: ng * group].reshape(ng, group).sum(1) / n_b
    c_a = sa[:, :, 2].sum(0)[: ng * group].reshape(ng, group).sum(1)
    c_b = sb[:, :, 2].sum(0)[: ng * group].reshape(ng, group).sum(1)
    v_a = sa[:, :, 13].sum(0)[: ng * group].reshape(ng, group).sum(1) / n_a**2
    v_b = sb[:, :, 13].sum(0)[: ng * group].reshape(ng, group).sum(1) / n_b**2
    use = (c_a >= 10) & (c_b >= 10)
    chi2 = float((((e_a - e_b) ** 2)[use] / (v_a + v_b)[use]).sum())
    return chi2, int(use.sum())


@pytest.mark.slow  # two cold engine compiles (~30 min on a 1-core host);
# results recorded in the MULTICHIP artifacts.  The CI-fast shipped-config
# signal is test_sharded_bench_knobs_terminate above.
def test_sharded_chi2_parity_bench_profile(dumps):
    """Statistical-power parity: a 1200-photon sharded run (8 shards, the
    bench profile's deviation knobs incl. detached_events — newly
    supported sharded) against the single-device engine with the SAME
    config, compared by the exact-variance chi^2 of the accuracy harness.

    Replaces the round-1 60-photon/5x-tolerance check (VERDICT r1 #5);
    passes at chi2/dof ~ 1 with ~20x the photon count and per-group
    exact MC variances.
    """
    from grmonty_tpu.parallel import sharding
    from grmonty_tpu.transport import driver

    n_ph = 1200
    cfg = engine_mod.EngineConfig(
        n_pool=128, m_period=8, sec_cap=4096, max_outer=60000,
        stall_steps=40000, detached_events=True, grow_cap=8.0,
        grow_rate=1.1892, refill_period=4, mxu_extract=True,
        ev_k=64, refill_k=128,
    )
    sim_s = sharding.ShardedSimulation(
        dumps, photon_n=n_ph, mass_unit=4.0e19, config=cfg,
        emit_chunk=4096, n_devices=8, warmup=0,
    )
    spec_s, stats_s = sim_s.run()

    sim_1 = driver.Simulation(
        dumps, photon_n=n_ph, mass_unit=4.0e19,
        config=cfg._replace(n_pool=1024, ev_k=512, refill_k=1024),
        emit_chunk=4096, warmup=0,
    )
    spec_1, stats_1 = sim_1.run()

    assert stats_s["n_created"] == stats_1["n_created"]
    rec_ratio = stats_s["n_recorded"] / max(stats_1["n_recorded"], 1)
    assert 0.7 < rec_ratio < 1.4, rec_ratio

    lum_s = spec_s[: engine_mod.N_BINS, 1].sum()
    lum_1 = spec_1[: engine_mod.N_BINS, 1].sum()
    assert abs(np.log10(lum_s / lum_1)) < 0.15, (lum_s, lum_1)

    chi2, dof = _chi2_groups(spec_s, n_ph, spec_1, n_ph)
    assert dof >= 4
    assert chi2 / dof < 3.0, (chi2, dof)

"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest)."""

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

"""detached_events sanity: immediate parent continuation after scatter.

With EngineConfig.detached_events, a parent photon captures its scatter
event into per-lane shadow registers and keeps moving instead of parking
at_event until the next periodic phase.  The physics is identical (the
event record is the same pre-sampling state process_scatters would have
read from the parked lane; the parent's fate and opacity refresh depend
only on parent state) — only the RNG trajectory differs, so parity with
the default path is statistical.  This drives a full tiny simulation both
ways and asserts the global observables agree while event parking
actually disappears from the lane-slot census.
"""

import numpy as np
import pytest

from grmonty_tpu.transport import engine as engine_mod


def _run(tmp_path_factory, detached):
    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver

    path = tmp_path_factory.mktemp("dumps") / f"torus_d{int(detached)}"
    torus.write_torus_dump(str(path), n1=64, n2=32)
    cfg = engine_mod.EngineConfig(
        n_pool=256, m_period=8, sec_cap=4096, max_outer=40000,
        stall_steps=40000, detached_events=bool(detached),
    )
    sim = driver.Simulation(
        str(path), photon_n=60, mass_unit=4.0e18, config=cfg,
        emit_chunk=2048, warmup=128,
    )
    spec, stats = sim.run()
    return np.asarray(spec), stats


@pytest.mark.slow
def test_detached_events_preserves_observables(tmp_path_factory):
    spec0, st0 = _run(tmp_path_factory, False)
    spec1, st1 = _run(tmp_path_factory, True)

    assert np.isfinite(spec1).all()
    assert st1["n_recorded"] > 0
    # same photon accounting within loose MC bounds (different RNG path)
    r0 = st0["n_recorded"] / max(st0["n_created"], 1)
    r1 = st1["n_recorded"] / max(st1["n_created"], 1)
    assert 0.7 < r1 / r0 < 1.4, (r0, r1)
    # luminosity per created photon within 25% (few-thousand-photon MC)
    l0 = spec0[:, 1].sum() / max(st0["n_created"], 1)
    l1 = spec1[:, 1].sum() / max(st1["n_created"], 1)
    assert 0.75 < l1 / l0 < 1.33, (l0, l1)
    # scattering actually happened in both runs (the deviation under test)
    assert st0["n_scatt_recorded"] > 0 and st1["n_scatt_recorded"] > 0
    # Event parking becomes negligible.  It does not vanish at THIS scale:
    # the tiny pool's auto EV_K (n_pool/8 = 32) lets consumed-per-phase lag
    # events-per-phase, so pending registers linger and second events park.
    # Both runs are chaotic few-photon trajectories, so the two parked
    # fractions individually vary across hosts (FP reassociation differs by
    # CPU codegen); require a real reduction only when the baseline parks a
    # substantial fraction, and otherwise just bound the detached residual.
    assert (
        st1["util_parked"] < 0.6 * st0["util_parked"]
        or st1["util_parked"] < 0.02
    ), (st0["util_parked"], st1["util_parked"])

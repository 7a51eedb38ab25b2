"""VMEM row-gather kernel vs plain XLA gather (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
from jax import random

from grmonty_tpu.ops import gather


def test_vmem_row_gather_matches_xla():
    key = random.PRNGKey(7)
    for z, w, n in [(512, 32, 512), (256, 32, 1000), (1024, 32, 300)]:
        table = random.normal(key, (z, w), jnp.float32)
        idx = random.randint(random.fold_in(key, z), (n,), 0, z, jnp.int32)
        out = gather.vmem_row_gather(table, idx, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_fits_vmem_gate():
    assert gather.fits_vmem(65536, 32)
    assert not gather.fits_vmem(65536 * 8, 32)


def test_engine_vmem_gather_spectrum_identical(tmp_path):
    """The VMEM-gather engine is bit-for-bit the same physics: identical
    gathered rows -> identical downstream math -> identical spectrum."""
    import jax

    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine as engine_mod

    path = str(tmp_path / "torus_dump")
    torus.write_torus_dump(path, n1=64, n2=32)
    base = dict(n_pool=256, m_period=8, sec_cap=4096, max_outer=4000,
                stall_steps=4000)
    specs = []
    for vg in (False, True):
        cfg = engine_mod.EngineConfig(vmem_gather=vg, **base)
        sim = driver.Simulation(path, photon_n=40, mass_unit=4.0e18,
                                config=cfg, emit_chunk=1024, warmup=64)
        spec, stats = sim.run()
        specs.append(np.asarray(spec))
    np.testing.assert_allclose(specs[0], specs[1], rtol=1e-6)


def test_device_emission_matches_host_distribution(tmp_path):
    """The accelerator-side emission path (log-space accept tests, engine
    dtype) produces the same photon population as the host f64 path."""
    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine as engine_mod

    path = str(tmp_path / "torus_dump")
    torus.write_torus_dump(path, n1=64, n2=32)
    cfg = engine_mod.EngineConfig(n_pool=256, dtype=jnp.float32)
    sim = driver.Simulation(path, photon_n=4000, mass_unit=4.0e18,
                            config=cfg, emit_chunk=4096, warmup=0)
    plan = sim.plan()
    n = min(4096, plan.total)

    host_rows = sim.emit_packed_host(plan, 0, 4096, n)
    dev_rows, _ = sim.emit_packed_dev(plan, 0, n)
    dev_rows = np.asarray(dev_rows)

    hw, dw = host_rows[:, 8], dev_rows[:, 8]
    # host path scales weights on the host; device path folds ln(scale) in
    assert (hw > 0).sum() > 100 and (dw > 0).sum() > 100
    # same zones -> same positions row-for-row (position is deterministic)
    np.testing.assert_allclose(dev_rows[:n, 1], host_rows[:n, 1], rtol=1e-5)
    # photon frequency/energy distributions agree statistically (different
    # RNG draws): compare medians of ln(e) over live rows
    he = np.log(host_rows[hw > 0, 9])
    de = np.log(dev_rows[dw > 0, 9])
    assert abs(np.median(he) - np.median(de)) < 0.7
    # total emitted weight agrees to MC accuracy
    assert abs(np.log(hw.sum() / dw.sum())) < 0.3

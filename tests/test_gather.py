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

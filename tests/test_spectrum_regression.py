"""Fixed-seed golden-spectrum regression (SURVEY §7 stage 9).

A deterministic small CPU run is compared against committed golden numbers:
total luminosity, recorded-photon accounting, and the coarse-grained energy
spectrum.  Tolerances are set so benign numeric evolution (compiler/library
updates) passes but a 5% luminosity drift or a shape change fails.

Regenerate after an *intentional* physics change with:
    python tests/test_spectrum_regression.py --regen
and justify the diff in the commit message.
"""

import json
import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "spectrum_torus64x32.json")

RUN = dict(photon_n=60, mass_unit=4.0e18, seed=123)


def _run():
    from grmonty_tpu import consts
    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine

    import tempfile

    d = tempfile.mkdtemp()
    path = os.path.join(d, "torus_dump")
    torus.write_torus_dump(path, n1=64, n2=32)
    cfg = engine.EngineConfig(
        n_pool=256, m_period=8, sec_cap=4096, max_outer=40000, stall_steps=40000
    )
    sim = driver.Simulation(path, config=cfg, emit_chunk=2048, warmup=128, **RUN)
    spec, stats = sim.run()

    nb = consts.N_TH_BINS * consts.N_E_BINS
    e_by_bin = spec[:nb, 1].reshape(consts.N_TH_BINS, consts.N_E_BINS).sum(0)
    n_by_bin = spec[:nb, 2].reshape(consts.N_TH_BINS, consts.N_E_BINS).sum(0)
    g = 25  # coarse groups of 8 energy bins
    e_g = e_by_bin[: (200 // g) * g].reshape(-1, g).sum(1)
    n_g = n_by_bin[: (200 // g) * g].reshape(-1, g).sum(1)
    return {
        "luminosity_w": float(spec[:nb, 1].sum()),
        "n_created": int(stats["n_created"]),
        "n_recorded": int(stats["n_recorded"]),
        "n_scatt_recorded": int(stats["n_scatt_recorded"]),
        "coarse_e": [float(v) for v in e_g],
        "coarse_n": [float(v) for v in n_g],
    }


@pytest.fixture(scope="module")
def current():
    return _run()


def test_golden_exists():
    assert os.path.exists(GOLDEN), "run `python tests/test_spectrum_regression.py --regen`"


def test_luminosity_within_5pct(current):
    with open(GOLDEN) as f:
        gold = json.load(f)
    assert current["n_created"] == gold["n_created"]
    rel = abs(current["luminosity_w"] / gold["luminosity_w"] - 1.0)
    assert rel < 0.05, f"luminosity drifted {rel:.1%} from golden"


def test_accounting_within_5pct(current):
    with open(GOLDEN) as f:
        gold = json.load(f)
    assert abs(current["n_recorded"] / gold["n_recorded"] - 1.0) < 0.05
    assert abs(current["n_scatt_recorded"] / max(gold["n_scatt_recorded"], 1) - 1.0) < 0.10


def test_spectrum_shape(current):
    with open(GOLDEN) as f:
        gold = json.load(f)
    e_now = np.asarray(current["coarse_e"])
    e_gold = np.asarray(gold["coarse_e"])
    n_gold = np.asarray(gold["coarse_n"])
    # compare groups with enough photons for meaningful statistics
    use = n_gold >= 50
    assert use.any()
    rel = np.abs(e_now[use] / e_gold[use] - 1.0)
    assert rel.max() < 0.25, f"spectrum group drift up to {rel.max():.1%}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        data = _run()
        with open(GOLDEN, "w") as f:
            json.dump(data, f, indent=2)
        print(f"golden written to {GOLDEN}")
        print(json.dumps(data, indent=2)[:400])
    else:
        print(__doc__)

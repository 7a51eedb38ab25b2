"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU pod is
available in CI); set platform/device-count before JAX is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (tunneled single chip) overrides JAX_PLATFORMS from the
# environment; force the CPU backend explicitly so tests never compile over
# the tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tier (multi-minute engine compiles / long transport "
        "runs); deselected by default — run with GRMONTY_SLOW=1 or "
        "-m slow.  The fast tier (everything unmarked) must stay under "
        "~10 min on a single core and keeps full shipped-configuration "
        "coverage (incl. the sharded bench-knob regression test).",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GRMONTY_SLOW", "0") == "1":
        return  # run everything
    if config.getoption("-m"):
        return  # explicit marker selection wins
    skip_slow = pytest.mark.skip(
        reason="slow tier: set GRMONTY_SLOW=1 or use -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def jnu_tables():
    from grmonty_tpu.utils import cache

    return cache.jnu_tables()


@pytest.fixture(scope="session")
def hotcross_table():
    from grmonty_tpu.utils import cache

    return cache.hotcross_table()


@pytest.fixture(scope="session")
def torus_model(tmp_path_factory):
    """A small synthetic torus dump, parsed, for end-to-end tests."""
    from grmonty_tpu.models import torus, harm

    path = tmp_path_factory.mktemp("dumps") / "torus_dump"
    torus.write_torus_dump(str(path), n1=64, n2=32)
    return harm.read_dump(str(path), mass_unit=4.0e19)


@pytest.fixture
def rng():
    return np.random.default_rng(123)

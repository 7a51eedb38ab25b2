"""Parity: the fused Pallas hot-step kernels vs the XLA hot step.

Both backends execute the same module-level hot_phase_a/b functions
(engine.py), so on identical state and key they must produce identical
pools — verified here field-by-field in interpret mode on the CPU
backend, over several iterations interleaved with periodic phases so the
state covers refills, scatters and records.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from grmonty_tpu.models import torus
from grmonty_tpu.transport import driver, engine

# Heavy tier: multi-minute engine compiles / long transport runs on the
# single-core CI host (tests/conftest.py tiering).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sims():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    dump = os.path.join(cache, "torus_64x32_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=64, n2=32)

    mk = lambda **kw: driver.Simulation(
        dump, photon_n=2000, mass_unit=4e19, emit_chunk=4096,
        config=engine.EngineConfig(
            n_pool=2048, m_period=8, sec_cap=4096, stall_steps=20000,
            dtype=jnp.float32, pallas_block=1024, **kw),
    )
    return mk(), mk(pallas_hot=True)


def test_pallas_hot_step_matches_xla(sims):
    """Near-bitwise parity over a few steps.

    The two backends execute the same hot_phase_a/b functions, but the
    Chebyshev hotcross surrogate is a small matmul whose reduction order
    differs between the XLA (N, 41) shape and the kernel's (N/128, 128,
    41) block shape — a few-ulp difference in alpha_scatt that feeds
    back into positions through step sizes.  So: masks and integers must
    match exactly; floats to 1e-4 relative over 6 steps (no chaotic
    accumulation at this depth).
    """
    sim_x, sim_p = sims
    plan = sim_x.plan()
    backlog = sim_x.emit_packed(plan, 0, 4096)

    state_x = sim_x.engine["fresh_state"](random.PRNGKey(3))
    state_p = sim_p.engine["fresh_state"](random.PRNGKey(3))
    pp_x = jax.jit(sim_x.engine["periodic_phase"])
    pp_p = jax.jit(sim_p.engine["periodic_phase"])
    hs_x = jax.jit(sim_x.engine["hot_step"])
    hs_p = jax.jit(sim_p.engine["hot_step"])

    state_x = pp_x(state_x, backlog)
    state_p = pp_p(state_p, backlog)

    for i in range(6):
        state_x = hs_x(state_x)
        state_p = hs_p(state_p)

    _assert_pools_match(state_x.pool, state_p.pool)


def _assert_pools_match(pool_x, pool_p):
    for f in pool_x._fields:
        a = np.asarray(getattr(pool_x, f))
        b = np.asarray(getattr(pool_p, f))
        if a.size == 0:
            continue
        if a.dtype == np.bool_ or a.dtype.kind == "i":
            mismatch = (a != b).sum()
            assert mismatch <= a.size // 1000, f"pool.{f}: {mismatch} differ"
        else:
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-6, err_msg=f"pool.{f}")


@pytest.mark.slow
def test_pallas_hot_step_matches_xla_detached(sims):
    """Same parity with detached_events: the capture runs in XLA on extra
    kernel outputs (arrived, a_scf/a_abf/bf/nu), drawing no randomness, so
    the shadow registers and continuation masks must track the XLA path."""
    sim_x, sim_p = sims
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    dump = os.path.join(cache, "torus_64x32_dump")
    mk = lambda **kw: driver.Simulation(
        dump, photon_n=2000, mass_unit=4e19, emit_chunk=4096,
        config=engine.EngineConfig(
            n_pool=2048, m_period=8, sec_cap=4096, stall_steps=20000,
            dtype=jnp.float32, pallas_block=1024, detached_events=True,
            **kw),
    )
    sim_dx, sim_dp = mk(), mk(pallas_hot=True)
    plan = sim_dx.plan()
    backlog = sim_dx.emit_packed(plan, 0, 4096)

    state_x = sim_dx.engine["fresh_state"](random.PRNGKey(3))
    state_p = sim_dp.engine["fresh_state"](random.PRNGKey(3))
    state_x = jax.jit(sim_dx.engine["periodic_phase"])(state_x, backlog)
    state_p = jax.jit(sim_dp.engine["periodic_phase"])(state_p, backlog)
    hs_x = jax.jit(sim_dx.engine["hot_step"])
    hs_p = jax.jit(sim_dp.engine["hot_step"])
    for _ in range(6):
        state_x = hs_x(state_x)
        state_p = hs_p(state_p)

    _assert_pools_match(state_x.pool, state_p.pool)

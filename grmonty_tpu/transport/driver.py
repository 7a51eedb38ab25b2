"""Host-side simulation driver: the orchestrator tying I/O, tables,
emission, and the transport engine together.

Equivalent of the reference's ``harm::HARMModel`` 5-phase pipeline
(``main.cpp:26-56``: construct -> read_file -> init -> run_simulation ->
report_spectrum) re-drawn for JAX: all init products are device arrays, the
emission producer/worker machinery is a vectorized sampler, and the
simulation loop is a sequence of jitted engine waves over photon backlogs.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from grmonty_tpu import consts
from grmonty_tpu.models import harm
from grmonty_tpu.ops import emission, fluid, spectrum as spectrum_ops
from grmonty_tpu.transport import engine as engine_mod
from grmonty_tpu.utils import cache

log = logging.getLogger("grmonty")


class Simulation:
    """One HARM snapshot + photon budget -> spectrum."""

    def __init__(
        self,
        dump_path: str,
        photon_n: int = 5_000_000,
        mass_unit: float = 4.0e19,
        seed: int = consts.RNG_SEED,
        config: engine_mod.EngineConfig | None = None,
        emit_chunk: int = 1 << 20,
        wave_tail_exit: int | None = None,
    ):
        self.photon_n = photon_n
        self.emit_chunk = emit_chunk
        self.cfg = config or engine_mod.EngineConfig()
        dt = self.cfg.dtype

        self.model = harm.read_dump(dump_path, mass_unit)
        self.mc = fluid.make_model_consts(self.model)

        log.info("Initializing tables")
        f_table, k2_table = cache.jnu_tables()
        hc = cache.hotcross_table()
        self.prims = jnp.asarray(self.model.data.stacked())

        # Zone-centred geometry + fluid state (harm_model.cpp:242-266,538-593).
        self.zone_x, self.g_cov_z, self.g_con_z, self.g_det_z = (
            fluid.precompute_zone_geometry(self.mc)
        )
        self.fluid_zone = fluid.get_fluid_zone(
            self.prims, self.g_cov_z, self.g_con_z, self.mc
        )

        f_t = jnp.asarray(f_table)
        k2_t = jnp.asarray(k2_table)
        weights = emission.weight_table(
            self.fluid_zone, self.g_det_z, self.mc, photon_n, f_t, k2_t
        )
        self.tables = engine_mod.Tables(
            f_table=f_t, k2_table=k2_t, hotcross=jnp.asarray(hc), weights=weights
        )

        nint_t, dndmax_t = emission.nint_table(weights, self.mc, f_t)
        self.nz, self.dn_max = emission.zone_budgets(
            self.fluid_zone, self.g_det_z, nint_t, dndmax_t, k2_t, photon_n
        )
        self.e_con_z, self.e_cov_z = emission.zone_tetrads(
            self.fluid_zone, self.g_cov_z, self.mc.b_unit
        )

        self.key = random.PRNGKey(seed)
        # Main engine exits each wave once the backlog is drained and only a
        # small tail of stragglers remains (they roll into the next wave);
        # a narrow tail engine finishes the final stragglers so a handful of
        # long-lived photons never hold the full-width pool hostage.
        if wave_tail_exit is None:
            wave_tail_exit = max(1, self.cfg.n_pool // 16)
        wave_cfg = self.cfg._replace(tail_exit=wave_tail_exit)
        self.engine = engine_mod.make_engine(self.mc, self.tables, self.prims, wave_cfg)
        self._run_jit = jax.jit(self.engine["run"], donate_argnums=(0,))
        self.tail_cfg = self.cfg._replace(
            n_pool=max(256, self.cfg.n_pool // 64), tail_exit=0
        )
        self._tail = None  # built lazily on first drain
        self._sample_jit = jax.jit(
            lambda key, zi, zj: emission.sample_photons(
                key, zi, zj, self.zone_x, self.fluid_zone, self.e_con_z,
                self.e_cov_z, self.dn_max, self.tables.weights,
                self.tables.f_table, self.tables.k2_table, dtype=dt,
            )
        )
        log.info("Initializing done")

    # ------------------------------------------------------------------
    def plan(self) -> emission.EmissionPlan:
        """Per-zone photon counts -> flat photon->zone map (harm_model.cpp:673-704)."""
        self.key, k = random.split(self.key)
        counts = np.asarray(emission.zone_counts(k, self.nz))
        plan = emission.plan_emission(counts)
        log.info("Emission plan: %d superphotons from %d zones",
                 plan.total, int((counts > 0).sum()))
        return plan

    def emit(self, plan: emission.EmissionPlan, start: int, count: int):
        """Sample a [start, start+count) slice of the plan into an InitPhotons
        batch (padded to ``count`` with zero-weight photons that the engine
        drops on load)."""
        zi = plan.zone_i[start : start + count]
        zj = plan.zone_j[start : start + count]
        pad = count - zi.shape[0]
        if pad:
            zi = np.concatenate([zi, np.zeros(pad, np.int32)])
            zj = np.concatenate([zj, np.zeros(pad, np.int32)])
        self.key, k = random.split(self.key)
        batch = self._sample_jit(k, jnp.asarray(zi), jnp.asarray(zj))
        if pad:
            w = batch.w.at[count - pad :].set(0.0)
            batch = batch._replace(w=w)
        return batch

    # ------------------------------------------------------------------
    def _drain_tail(self, state):
        """Finish leftover stragglers in a narrow pool.

        Gathers the occupied lanes of the wide pool into a pool 64x
        narrower and runs it to completion, carrying the spectrum, counters
        and secondary buffer through.  Repeats until nothing is occupied.
        """
        if self._tail is None:
            self._tail = engine_mod.make_engine(
                self.mc, self.tables, self.prims, self.tail_cfg
            )
            self._tail_run = jax.jit(self._tail["run"], donate_argnums=(0,))
            dummy = jax.device_get(self._sample_jit(
                random.PRNGKey(0), jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32)
            ))
            self._tail_backlog = jax.tree.map(
                lambda a: jnp.asarray(np.zeros_like(a)), dummy
            )  # single zero-weight photon: dropped on load

        n_t = self.tail_cfg.n_pool
        while True:
            occ = np.asarray(state.pool.occupied)
            idx = np.nonzero(occ)[0]
            if idx.size == 0 and int(state.sec.count) == 0:
                break
            take = idx[:n_t]
            gather = np.zeros(n_t, np.int64)
            gather[: take.size] = take
            valid = np.zeros(n_t, bool)
            valid[: take.size] = True
            gi = jnp.asarray(gather)
            vm = jnp.asarray(valid)

            small = jax.tree.map(lambda a: a[gi], state.pool)
            small = small._replace(
                occupied=small.occupied & vm,
                alive=small.alive & vm,
                pend_push=small.pend_push & vm,
                at_event=small.at_event & vm,
                record_pending=small.record_pending & vm,
            )
            tstate = engine_mod.State(
                pool=small, spec=state.spec, counters=state.counters,
                sec=state.sec, backlog_pos=jnp.zeros((), jnp.int32),
                key=state.key, it=jnp.zeros((), jnp.int32),
            )
            tstate = self._tail_run(tstate, self._tail_backlog)
            # clear the taken lanes from the wide pool
            wide = state.pool
            drop = jnp.zeros(occ.shape, bool).at[jnp.asarray(take)].set(True)
            wide = wide._replace(
                occupied=wide.occupied & ~drop, alive=wide.alive & ~drop,
            )
            state = state._replace(
                pool=wide, spec=tstate.spec, counters=tstate.counters,
                sec=tstate.sec, key=tstate.key,
            )
        return state

    def run(self):
        """Emit + track everything; returns (spectrum_rows, stats)."""
        t0 = time.time()
        plan = self.plan()
        self.key, k_eng = random.split(self.key)
        state = self.engine["fresh_state"](k_eng)

        chunk = self.emit_chunk
        n_chunks = max(1, -(-plan.total // chunk))
        done = 0
        for c in range(n_chunks):
            backlog = self.emit(plan, c * chunk, chunk)
            state = self._run_jit(state, backlog)
            done = min((c + 1) * chunk, plan.total)
            counters = jax.device_get(state.counters)
            elapsed = time.time() - t0
            log.info(
                "wave %d/%d: %d emitted, %d recorded, %d scatters(rec), "
                "%.0f ph/s",
                c + 1, n_chunks, done, int(counters.n_recorded),
                int(counters.n_scatt_rec), done / max(elapsed, 1e-9),
            )

        state = self._drain_tail(state)
        state.spec.block_until_ready()
        elapsed = time.time() - t0
        counters = jax.device_get(state.counters)
        stats = {
            "n_created": plan.total,
            "n_recorded": int(counters.n_recorded),
            "n_scatt_recorded": int(counters.n_scatt_rec),
            "max_tau_scatt": float(counters.max_tau_scatt),
            "n_secondary_dropped": int(counters.n_sec_drop),
            "elapsed_s": elapsed,
            "photon_rate": plan.total / max(elapsed, 1e-9),
        }
        log.info("Final rate %.2f ph/s", stats["photon_rate"])
        log.info("Super photons: created %d, recorded %d",
                 stats["n_created"], stats["n_recorded"])
        self.state = state
        return np.asarray(state.spec), stats

    def report(self, spectrum_path: str, spec=None):
        spec = self.state.spec if spec is None else spec
        rows = spectrum_ops.write_spectrum(spectrum_path, np.asarray(spec), self.mc)
        log.info("Spectrum written to %s", spectrum_path)
        log.info("\tluminosity: %g", rows["luminosity"])
        log.info("\tmax_tau_scatt: %g", rows["max_tau_scatt"])
        return rows

"""Multi-chip scale-out: data-parallel photon transport over a device mesh.

The reference is strictly single-GPU (SURVEY §2: no NCCL/MPI anywhere); its
scale-out analogue is the fixed 16384-photon pool per CUDA stream.  Here we
shard the photon pool and emission backlog over a 1D ``jax.sharding.Mesh``
axis ``'ph'`` with ``shard_map``: every chip runs the full transport engine
on its own photon shard (photons are independent), and the only cross-chip
communication is a single ``psum`` of the spectrum accumulators and counters
when the run completes — photon transport needs no other collective.

Design deviation (documented): the bias-feedback scalars (n_recorded,
n_scatt, max_tau_scatt) are per-shard during flight rather than globally
synchronized each superstep.  The reference itself reads these racily from
device globals while kernels update them (super_photon.cu:36-46,1649-1662),
so per-shard staleness is the same class of approximation, and it keeps the
hot loop collective-free so shards never wait on each other.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import random
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

from grmonty_tpu.transport import driver as driver_mod
from grmonty_tpu.transport import engine as engine_mod

log = logging.getLogger("grmonty")


def _state_specs(spec_pool):
    """PartitionSpec pytree for engine.State: pool sharded, rest per-shard
    private (unreplicated scalars/accumulators -> check_rep disabled)."""
    pool = engine_mod.Pool(*([spec_pool] * len(engine_mod.Pool._fields)))
    sec = engine_mod.SecBuf(
        x=spec_pool, k=spec_pool, w=spec_pool, e=spec_pool, l=spec_pool,
        n_e_0=spec_pool, theta_e_0=spec_pool, b_0=spec_pool, e_0=spec_pool,
        n_scatt=spec_pool, count=P(),
    )
    counters = engine_mod.Counters(*([P()] * len(engine_mod.Counters._fields)))
    return engine_mod.State(
        pool=pool, spec=P(), counters=counters, sec=sec,
        backlog_pos=P(), key=P(), it=P(),
    )


class ShardedSimulation(driver_mod.Simulation):
    """Simulation with the photon pool sharded over ``n_devices`` chips."""

    def __init__(self, *args, n_devices: int = 0, devices=None, **kwargs):
        devices = devices or jax.devices()
        n_devices = n_devices or len(devices)
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        self.n_devices = n_devices
        self.mesh = Mesh(np.array(devices[:n_devices]), ("ph",))
        # Per-shard waves drain fully (no host-side tail compaction across
        # shards); stragglers only block their own shard.
        kwargs.setdefault("wave_tail_exit", 0)
        super().__init__(*args, **kwargs)

        # Per-shard engine: the wide engine closures are reused inside
        # shard_map; shapes inside the body are per-shard (n_pool each).
        run = self.engine["run"]
        specs = _state_specs(P("ph"))
        backlog_specs = driver_mod.emission.InitPhotons(
            *([P("ph")] * len(driver_mod.emission.InitPhotons._fields))
        )

        def _run_shard(state, backlog):
            # each call gets a fresh backlog: restart its consumption cursor
            state = state._replace(backlog_pos=jnp.zeros((), jnp.int32))
            return run(state, backlog)

        self._run_jit = jax.jit(
            shard_map(
                _run_shard,
                mesh=self.mesh,
                in_specs=(specs, backlog_specs),
                out_specs=specs,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

        def _reduce(state):
            def body(spec, counters):
                spec = jax.lax.psum(spec, "ph")
                counters = engine_mod.Counters(
                    n_recorded=jax.lax.psum(counters.n_recorded, "ph"),
                    n_scatt_rec=jax.lax.psum(counters.n_scatt_rec, "ph"),
                    max_tau_scatt=jax.lax.pmax(counters.max_tau_scatt, "ph"),
                    n_created=jax.lax.psum(counters.n_created, "ph"),
                    n_sec_drop=jax.lax.psum(counters.n_sec_drop, "ph"),
                )
                return spec, counters

            return shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), _state_specs(P("ph")).counters),
                out_specs=(P(), engine_mod.Counters(*([P()] * 5))),
                check_vma=False,
            )(state.spec, state.counters)

        self._reduce = jax.jit(_reduce)

    # -- sharded state/backlog construction ------------------------------
    def _fresh_sharded_state(self, key):
        keys = random.split(key, self.n_devices)

        def mk(k):
            return self.engine["fresh_state"](k[0])

        specs = _state_specs(P("ph"))
        return jax.jit(
            shard_map(
                mk, mesh=self.mesh, in_specs=(P("ph"),), out_specs=specs,
                check_vma=False,
            )
        )(keys.reshape(self.n_devices, 2))

    def run(self):
        t0 = time.time()
        plan = self.plan()
        self.key, k_eng = random.split(self.key)
        state = self._fresh_sharded_state(k_eng)

        # chunk must divide evenly across shards
        chunk = -(-self.emit_chunk // self.n_devices) * self.n_devices
        n_chunks = max(1, -(-plan.total // chunk))
        for c in range(n_chunks):
            backlog = self.emit(plan, c * chunk, chunk)
            backlog = jax.device_put(
                backlog,
                jax.tree.map(
                    lambda _: jax.sharding.NamedSharding(self.mesh, P("ph")), backlog
                ),
            )
            state = self._run_jit(state, backlog)
        spec, counters = self._reduce(state)
        spec = driver_mod.unscale_spectrum(
            np.asarray(jax.device_get(spec)), self.cfg.weight_scale
        )
        counters = jax.device_get(counters)
        elapsed = time.time() - t0
        stats = {
            "n_created": plan.total,
            "n_recorded": int(counters.n_recorded),
            "n_scatt_recorded": int(counters.n_scatt_rec),
            "max_tau_scatt": float(counters.max_tau_scatt),
            "n_secondary_dropped": int(counters.n_sec_drop),
            "elapsed_s": elapsed,
            "photon_rate": plan.total / max(elapsed, 1e-9),
            "n_devices": self.n_devices,
        }
        log.info("Final rate %.2f ph/s over %d devices",
                 stats["photon_rate"], self.n_devices)

        class _S:  # minimal state shim for report()
            pass

        s = _S()
        s.spec = spec
        self.state = s
        return np.asarray(spec), stats

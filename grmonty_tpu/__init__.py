"""grmonty_tpu — TPU-native general-relativistic Monte Carlo radiative transport.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of cuda-grmonty
(reference: /root/reference, a CUDA port of grmonty, Dolence et al. 2009,
arXiv:0909.0708).  Photons are tracked as SoA batches stepped inside a
`lax.while_loop`; all physics is expressed as pure, vectorized functions so
XLA can fuse the entire transport superstep.

Layout:
    models/     HARM GRMHD snapshot I/O, units, synthetic torus generator
    ops/        physics kernels: geometry, tetrads, fluid interpolation,
                synchrotron emissivity, Compton cross sections, opacities,
                Monte Carlo samplers, emission, spectrum binning
    transport/  the batched geodesic transport engine (the hot loop)
    parallel/   multi-chip sharding (shard_map over a photon-axis Mesh)
    utils/      logging, table caching

Precision: double precision is required for parity with the reference
(which is entirely `double`); we enable x64 at import.  The transport
engine's compute dtype is configurable (see
`grmonty_tpu.transport.engine.EngineConfig`);
float64 is the parity default, float32 is ~4x faster on TPU and passes the
same statistical spectrum checks.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: remote TPU compiles through the axon tunnel
# take minutes; caching the compiled executables makes re-runs instant.
#
# The default cache dir is keyed by a host fingerprint (machine arch + CPU
# model/flags): XLA:CPU caches AOT executables whose cache key does NOT
# include the host's CPU features, so a cache populated on one machine and
# read on another loads AOT code compiled for the wrong feature set
# ("Machine type used for XLA:CPU compilation doesn't match ... could lead
# to execution errors such as SIGILL" — observed in MULTICHIP_r02).  A
# per-host directory makes that cross-machine reuse impossible while still
# caching everything on re-runs of the same host.


def _host_fingerprint():
    import hashlib
    import platform

    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) >= 3:
                        break
    except OSError:  # pragma: no cover - non-Linux
        bits.append(platform.processor())
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "GRMONTY_JAX_CACHE",
    os.path.expanduser(f"~/.cache/grmonty_tpu_jax_{_host_fingerprint()}"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax
    pass

__version__ = "0.2.0"

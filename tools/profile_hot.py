#!/usr/bin/env python
"""Capture a TPU profile of the transport hot loop and print the op table.

Runs a few mid-wave engine slices under jax.profiler.trace and converts the
xplane capture into the framework-op profile (tensorboard_plugin_profile),
printing the top ops by self time.  Diagnostic tool only.

Env knobs: same as bench_micro (MICRO_POOL, MICRO_FP_ITERS, ...).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import random

    from grmonty_tpu.models import torus
    from grmonty_tpu.transport import driver, engine
    from grmonty_tpu.utils.logging import setup

    setup("warning")
    pool = int(os.environ.get("MICRO_POOL", "65536"))

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache")
    dump = os.path.join(cache, "torus_256x256_dump")
    if not os.path.exists(dump):
        torus.write_torus_dump(dump, n1=256, n2=256)

    cfg = engine.EngineConfig(
        n_pool=pool, m_period=int(os.environ.get("MICRO_PERIOD", "32")),
        sec_cap=pool, stall_steps=150000, dtype=jnp.float32,
        fp_iters=int(os.environ.get("MICRO_FP_ITERS", "2")),
        interp_geom=os.environ.get("MICRO_INTERP", "0") == "1",
    )
    sim = driver.Simulation(dump, photon_n=1_000_000, mass_unit=4e19,
                            config=cfg, emit_chunk=pool * 8)
    plan = sim.plan()
    # Default to the Compton-storm segment of the plan (see bench_micro.py:
    # the first ~1M rows are an idle-pool regime that under-reports the
    # gather-bound hot-step cost by ~3x).
    start = int(os.environ.get("MICRO_START", str(2 << 20)))
    start = max(0, min(start, plan.total - pool * 8))
    if jax.default_backend() == "cpu":
        backlog = sim.emit_packed(plan, start, pool * 8)
    else:
        backlog, _ = sim.emit_packed_dev(plan, start, pool * 8)
    state = sim.engine["fresh_state"](random.PRNGKey(0))
    state = jax.jit(sim.engine["periodic_phase"])(state, backlog)
    state = sim._run_jit(state, backlog)
    state = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
    jax.block_until_ready(state)

    logdir = "/tmp/grmonty_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        s = sim._run_jit(state._replace(it=jnp.zeros((), jnp.int32)), backlog)
        jax.block_until_ready(s)

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print(f"capture: {paths}", file=sys.stderr)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode() if data[:2] == b"\x1f\x8b" else data.decode()
    # framework_op_stats is a JSON-ish table; just print the head
    out = json.loads(data) if data.lstrip().startswith(("[", "{")) else data
    if isinstance(out, str):
        print(out[:8000])
        return
    print(json.dumps(out)[:200], file=sys.stderr)
    # gviz table: {cols: [...], rows: [{c: [{v: ...}...]}]}
    for tbl in (out if isinstance(out, list) else [out]):
        cols = [c.get("label") or c.get("id") for c in tbl.get("cols", [])]
        rows = tbl.get("rows", [])[:25]
        print("\t".join(map(str, cols)))
        for r in rows:
            print("\t".join(str(c.get("v")) for c in r["c"]))


if __name__ == "__main__":
    main()

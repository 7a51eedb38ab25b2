"""Pallas VMEM row gather for the transport hot loop.

STATUS (measured on a real v5e, 2026-08-19): NOT usable on hardware for
production table sizes — Mosaic rejects the kernel with ``Not implemented:
Multiple source vregs along gather dimension``: the hardware
``tpu.dynamic_gather`` only permutes within one 8-sublane vreg, so a
65536-row table cannot be gathered in VMEM at all.  The kernel still runs
in interpret mode (CPU tests) and would work for tables with <= 8 rows per
lane group; kept for the record and gated by ``fits_vmem`` + the
``vmem_gather`` EngineConfig knob (default off).  The production gather is
the XLA HBM row gather (~8.5 ns/index at 64k lanes); the layout cost of
CONSUMING the gathered rows is solved separately by the MXU transpose
(fluid.mxu_transpose_rows / EngineConfig.mxu_extract).

The transport engine's per-iteration cost is dominated by ONE dynamic row
gather from the packed bilinear-corner table (``fluid.make_corner_table``):
XLA lowers it to an HBM gather that costs ~8.5 ns/index at 64k lanes
(tools/probe_vmem_gather.py — sorting the indices or fencing the gather
with optimization barriers does not move it), which is random-access HBM
transaction cost, not compute.

TPU-native fix: keep the table resident in VMEM and gather there.  Mosaic
exposes exactly one vectorized dynamic-gather lowering (the
``take_along_axis`` pattern whose index array has the same shape as the
operand, jax/_src/pallas/mosaic/lowering.py ``_gather_lowering_rule``):

    out[i, j] = table[idx[i, j], j]      # idx.shape == table.shape

i.e. a per-(sublane-)row permutation gather of the whole table.  To gather
N photon rows from a Z-row table we therefore process ceil(N/Z) chunks of
Z indices (padding the tail chunk), each one a same-shape gather of the
full table.  The cost per chunk scales with Z — for the production regime
(N = pool = 65536 lanes, Z = n1*n2 = 65536 zones for a 256x256 dump) one
chunk covers the whole pool.

The table must fit in VMEM next to the chunk buffers: (Z, 32) float32 =
8 MB at Z = 65536, within the ~16 MB/core budget.  ``fits_vmem`` gates the
Pallas path; callers fall back to the XLA HBM gather otherwise (grids
bigger than ~380x380 zones, or f64 tables).

Reference analogue: the fluid arrays the CUDA build keeps in device global
memory and reads through ``__restrict__`` pointers with L2 caching
(super_photon.cu:447-486, harm_model.cuh:246-335); VMEM residency is the
TPU equivalent of that cache.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave headroom for pool-state buffers that share VMEM with the table.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fits_vmem(n_rows, row_width, itemsize=4):
    """Whether the (n_rows, row_width) table qualifies for the VMEM path."""
    return n_rows * row_width * itemsize <= _VMEM_BUDGET_BYTES


def _gather_kernel(idx_ref, table_ref, out_ref):
    z, w = table_ref.shape
    idx2 = jnp.broadcast_to(idx_ref[:].reshape(z, 1), (z, w))
    # Spelled as a raw lax.gather in exactly the shape Mosaic lowers to a
    # hardware tpu.dynamic_gather along the sublane axis
    # (jax/_src/pallas/mosaic/lowering.py, _gather_lowering_rule).  The
    # jnp.take_along_axis wrapper produces the same gather but force-casts
    # the indices to int64 when jax_enable_x64 is on (the engine's global
    # setting), which Mosaic rejects.
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
        operand_batching_dims=(1,),
        start_indices_batching_dims=(1,),
    )
    out_ref[:] = jax.lax.gather(
        table_ref[:],
        idx2[:, :, None],
        dnums,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def vmem_row_gather(table, idx, interpret=None):
    """``table[idx]`` with the table resident in VMEM.

    table: (Z, W) float32, W a multiple of 8 (lane padding is the caller's
    problem; the corner table is 32 wide).  idx: (N,) int32 in [0, Z).
    Returns (N, W).  N is processed in chunks of Z (see module docstring);
    the common transport configuration has N == Z and runs in one chunk.
    ``interpret=None`` auto-selects the Pallas interpreter off-TPU so the
    CPU test backend exercises the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic has no 64-bit support; the engine runs with global x64 enabled
    # (f64 host-side geometry), so the cell index may arrive as int64.
    idx = idx.astype(jnp.int32)
    z, w = table.shape
    (n,) = idx.shape
    n_chunks = -(-n // z)
    pad = n_chunks * z - n
    idx_p = jnp.pad(idx, (0, pad)) if pad else idx

    call = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((z, w), table.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(3.2 * z * w * table.dtype.itemsize + (1 << 20)),
        ),
        interpret=interpret,
    )
    if n_chunks == 1:
        out = call(idx_p, table)
    else:
        out = jnp.concatenate(
            [call(idx_p[c * z:(c + 1) * z], table) for c in range(n_chunks)]
        )
    return out[:n]

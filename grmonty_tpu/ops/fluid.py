"""Fluid state evaluation: zone-centred and bilinear-interpolated plasma.

Equivalent of ``cuda_grmonty/harm_model.cpp``: ``get_fluid_zone`` :538-593,
``get_fluid_params`` :595-671, ``interp_scalar`` :1646-1656 (the GPU mirror
``harm_model.cuh:246-335`` is the branch-free template we follow).

The 8 primitives live on device as one (8, n1, n2) float array in the order
rho, u, u1, u2, u3, B1, B2, B3.  Both entry points reconstruct the fluid
4-velocity from the HARM velocity primitives (u^0 from v.v and g^00), build
the magnetic 4-vector b^mu, and return everything batched.
"""

import math
import typing

import jax.numpy as jnp

from grmonty_tpu import consts
from grmonty_tpu.ops import geometry, linalg, tetrads


class ModelConsts(typing.NamedTuple):
    """Static per-dump scalars threaded through the physics (hashable)."""

    a: float
    h_slope: float
    r_0: float
    x_start: tuple  # (4,)
    x_stop: tuple  # (4,)
    dx: tuple  # (4,)
    n1: int
    n2: int
    n_e_unit: float
    theta_e_unit: float
    b_unit: float
    x1_min: float  # ln(horizon radius)
    bias_norm: float
    d_tau_k: float
    max_tau_scatt0: float  # initial bias normalisation depth (harm_model.cpp:72)


class FluidState(typing.NamedTuple):
    n_e: jnp.ndarray
    theta_e: jnp.ndarray
    b: jnp.ndarray  # field magnitude [gauss]
    u_con: jnp.ndarray  # (..., 4)
    u_cov: jnp.ndarray
    b_con: jnp.ndarray  # (..., 4), code units
    b_cov: jnp.ndarray


def _four_vectors(v_con_sp, bp_sp, g_cov, g_con, mc):
    """Shared reconstruction of u^mu and b^mu from spatial primitives.

    ``v_con_sp``/``bp_sp``: (..., 3) spatial primitives; metrics (..., 4, 4).
    """
    zeros = jnp.zeros_like(v_con_sp[..., :1])
    v_con = jnp.concatenate([zeros, v_con_sp], axis=-1)
    bp = jnp.concatenate([zeros, bp_sp], axis=-1)

    v_dot_v = jnp.einsum("...i,...ij,...j->...", v_con[..., 1:], g_cov[..., 1:, 1:], v_con[..., 1:])
    v_fac = jnp.sqrt(-1.0 / g_con[..., 0, 0] * (1.0 + jnp.abs(v_dot_v)))

    u_con = v_con - v_fac[..., None] * g_con[..., 0, :]
    u_con = u_con.at[..., 0].set(-v_fac * g_con[..., 0, 0])
    u_cov = tetrads.lower(u_con, g_cov)

    u_dot_bp = jnp.sum(u_cov[..., 1:] * bp[..., 1:], axis=-1)
    b_con = (bp + u_con * u_dot_bp[..., None]) / u_con[..., 0:1]
    b_con = b_con.at[..., 0].set(u_dot_bp)
    b_cov = tetrads.lower(b_con, g_cov)

    b_mag = jnp.sqrt(jnp.abs(jnp.sum(b_con * b_cov, axis=-1))) * mc.b_unit
    return u_con, u_cov, b_con, b_cov, b_mag


def get_fluid_zone(prims, g_cov, g_con, mc):
    """Zone-centred fluid state for every zone at once (harm_model.cpp:538-593).

    ``prims``: (8, n1, n2); ``g_cov``/``g_con``: (n1, n2, 4, 4).
    Returns a FluidState of (n1, n2[, 4]) arrays.
    """
    rho, uu = prims[0], prims[1]
    n_e = rho * mc.n_e_unit
    theta_e = uu / rho * mc.theta_e_unit

    v_con_sp = jnp.moveaxis(prims[2:5], 0, -1)  # (n1, n2, 3)
    bp_sp = jnp.moveaxis(prims[5:8], 0, -1)
    u_con, u_cov, b_con, b_cov, b_mag = _four_vectors(v_con_sp, bp_sp, g_cov, g_con, mc)
    return FluidState(n_e, theta_e, b_mag, u_con, u_cov, b_con, b_cov)


def get_fluid_params(x, g_cov, prims, mc, prims_rows=None):
    """Bilinearly interpolated fluid state at arbitrary x (harm_model.cpp:595-671).

    ``x``: (..., 4); ``g_cov``: (..., 4, 4) evaluated at x by the caller.
    Outside the grid the electron density is zeroed (sentinel), matching the
    reference's early return.

    ``prims_rows`` (optional): the primitives pre-transposed to
    (n1*n2, 8) so each bilinear corner is one contiguous row gather —
    substantially faster than 32 scalar gathers on TPU.
    """
    inside = (
        (x[..., 1] >= mc.x_start[1])
        & (x[..., 1] <= mc.x_stop[1])
        & (x[..., 2] >= mc.x_start[2])
        & (x[..., 2] <= mc.x_stop[2])
    )

    i, j, del_i, del_j = geometry.x_to_ij(x, mc.x_start, mc.dx, (mc.n1, mc.n2))

    if prims_rows is not None:
        base = i * mc.n2 + j
        p00 = jnp.moveaxis(prims_rows[base], -1, 0)
        p01 = jnp.moveaxis(prims_rows[base + 1], -1, 0)
        p10 = jnp.moveaxis(prims_rows[base + mc.n2], -1, 0)
        p11 = jnp.moveaxis(prims_rows[base + mc.n2 + 1], -1, 0)
    else:
        # Bilinear gather of all 8 primitives at once: (8, ...) per corner.
        p00 = prims[:, i, j]
        p01 = prims[:, i, j + 1]
        p10 = prims[:, i + 1, j]
        p11 = prims[:, i + 1, j + 1]
    c00 = (1.0 - del_i) * (1.0 - del_j)
    c01 = (1.0 - del_i) * del_j
    c10 = del_i * (1.0 - del_j)
    c11 = del_i * del_j
    p = p00 * c00 + p01 * c01 + p10 * c10 + p11 * c11  # (8, ...)

    rho, uu = p[0], p[1]
    n_e = jnp.where(inside, rho * mc.n_e_unit, 0.0)
    theta_e = uu / rho * mc.theta_e_unit

    g_con = geometry.gcon(x, mc.a, mc.h_slope, mc.r_0)
    v_con_sp = jnp.moveaxis(p[2:5], 0, -1)
    bp_sp = jnp.moveaxis(p[5:8], 0, -1)
    u_con, u_cov, b_con, b_cov, b_mag = _four_vectors(v_con_sp, bp_sp, g_cov, g_con, mc)
    return FluidState(n_e, theta_e, b_mag, u_con, u_cov, b_con, b_cov)


class FluidC(typing.NamedTuple):
    """Component-form fluid state for the transport hot path (see the
    geometry module docstring for the TPU layout rationale)."""

    n_e: jnp.ndarray
    theta_e: jnp.ndarray
    b: jnp.ndarray  # field magnitude [gauss]
    u_con: tuple  # 4x (N,)
    u_cov: tuple
    b_con: tuple  # code units
    b_cov: tuple


def make_corner_table(prims, n1, n2):
    """Pack the bilinear stencil into one gather-friendly table.

    TPU gathers cost ~9 ns per *index* regardless of row width, so the four
    corner gathers of ``get_fluid_params`` are folded into one: row z of the
    returned (n1*n2, 32) array holds the 8 primitives at zones z, z+1, z+n2,
    z+n2+1 (the reference's p00/p01/p10/p11 corners, harm_model.cpp:617-641).
    Out-of-range corners on the last row/column are never selected (the
    bilinear cell index is clamped to n-2) but are padded validly anyway.
    """
    import numpy as np

    p = np.asarray(prims).reshape(8, n1 * n2).T  # (Z, 8)
    z = np.arange(n1 * n2)
    c00 = p[z]
    c01 = p[np.minimum(z + 1, n1 * n2 - 1)]
    c10 = p[np.minimum(z + n2, n1 * n2 - 1)]
    c11 = p[np.minimum(z + n2 + 1, n1 * n2 - 1)]
    return np.concatenate([c00, c01, c10, c11], axis=1)  # (Z, 32)


def _four_vectors_c(v1, v2, v3, b1, b2, b3, g7, gc6, mc):
    """Component-form u^mu / b^mu reconstruction (harm_model.cpp:560-593)."""
    g00, g01, g03, g11, g13, g22, g33 = g7
    gc00, gc01, gc11, gc13, gc22, gc33 = gc6

    v_dot_v = (
        g11 * v1 * v1 + g22 * v2 * v2 + g33 * v3 * v3 + 2.0 * g13 * v1 * v3
    )
    v_fac = jnp.sqrt(-1.0 / gc00 * (1.0 + jnp.abs(v_dot_v)))

    u0 = -v_fac * gc00
    u1 = v1 - v_fac * gc01
    u2 = v2
    u3 = v3  # gcon row 0 has only (00, 01) nonzero
    u_con = (u0, u1, u2, u3)
    u_cov = geometry.lower_c(g7, u_con)

    u_dot_bp = u_cov[1] * b1 + u_cov[2] * b2 + u_cov[3] * b3
    bc0 = u_dot_bp
    bc1 = (b1 + u1 * u_dot_bp) / u0
    bc2 = (b2 + u2 * u_dot_bp) / u0
    bc3 = (b3 + u3 * u_dot_bp) / u0
    b_con = (bc0, bc1, bc2, bc3)
    b_cov = geometry.lower_c(g7, b_con)

    bsq = bc0 * b_cov[0] + bc1 * b_cov[1] + bc2 * b_cov[2] + bc3 * b_cov[3]
    b_mag = jnp.sqrt(jnp.abs(bsq)) * mc.b_unit
    return u_con, u_cov, b_con, b_cov, b_mag


def get_fluid_params_c(x1, x2, corner_rows, mc, g7=None, gc6=None):
    """Bilinear fluid state at (x1, x2) via ONE wide-row gather.

    Hot-path equivalent of :func:`get_fluid_params` (harm_model.cpp:595-671):
    the 4 corner gathers collapse into one gather of the packed
    ``corner_rows`` (see :func:`make_corner_table`); everything else is
    component math.  ``g7``/``gc6``: optional precomputed metric component
    tuples at (x1, x2) — computed here if omitted.
    """
    inside = (
        (x1 >= mc.x_start[1])
        & (x1 <= mc.x_stop[1])
        & (x2 >= mc.x_start[2])
        & (x2 <= mc.x_stop[2])
    )
    i, j, del_i, del_j = geometry.x_to_ij_c(x1, x2, mc.x_start, mc.dx, (mc.n1, mc.n2))
    z = i * mc.n2 + j
    rows = corner_rows[z]  # (N, 32) — the single hot-loop gather

    c00 = ((1.0 - del_i) * (1.0 - del_j))[:, None]
    c01 = ((1.0 - del_i) * del_j)[:, None]
    c10 = (del_i * (1.0 - del_j))[:, None]
    c11 = (del_i * del_j)[:, None]
    p = (
        rows[:, 0:8] * c00
        + rows[:, 8:16] * c01
        + rows[:, 16:24] * c10
        + rows[:, 24:32] * c11
    ).T  # (8, N): components back into the sublane dim

    rho, uu = p[0], p[1]
    n_e = jnp.where(inside, rho * mc.n_e_unit, 0.0)
    theta_e = uu / rho * mc.theta_e_unit

    if g7 is None:
        g7 = geometry.gcov_c(x1, x2, mc.a, mc.h_slope, mc.r_0)
    if gc6 is None:
        gc6 = geometry.gcon_c(x1, x2, mc.a, mc.h_slope, mc.r_0)
    u_con, u_cov, b_con, b_cov, b_mag = _four_vectors_c(
        p[2], p[3], p[4], p[5], p[6], p[7], g7, gc6, mc
    )
    return FluidC(n_e, theta_e, b_mag, u_con, u_cov, b_con, b_cov)


def precompute_zone_geometry(mc, dtype=jnp.float64):
    """gcov/gcon/sqrt|det g| at every zone center (harm_model.cpp:242-266)."""
    ii, jj = jnp.meshgrid(
        jnp.arange(mc.n1, dtype=dtype), jnp.arange(mc.n2, dtype=dtype), indexing="ij"
    )
    x = geometry.zone_center(ii, jj, mc.x_start, mc.dx)
    g_cov = geometry.gcov(x, mc.a, mc.h_slope, mc.r_0)
    g_con = geometry.gcon(x, mc.a, mc.h_slope, mc.r_0)
    g_det = jnp.sqrt(jnp.abs(linalg.det(g_cov)))  # closed form: TPU f64 has no LU
    return x, g_cov, g_con, g_det


def make_model_consts(model) -> ModelConsts:
    """Build ModelConsts from a parsed models.harm.HARMModel.

    All scalars are plain python floats (weakly typed under JAX) so they
    never promote a float32 engine to f64.
    """
    h = model.header
    return ModelConsts(
        a=float(h.a),
        h_slope=float(h.h_slope),
        r_0=float(h.r_0),
        x_start=tuple(float(v) for v in h.x_start),
        x_stop=tuple(float(v) for v in h.x_stop),
        dx=tuple(float(v) for v in h.dx),
        n1=int(h.n[0]),
        n2=int(h.n[1]),
        n_e_unit=float(model.units.n_e_unit),
        theta_e_unit=float(model.units.theta_e_unit),
        b_unit=float(model.units.b_unit),
        x1_min=float(model.x1_min),
        bias_norm=float(model.bias_norm),
        d_tau_k=float(model.d_tau_k),
        max_tau_scatt0=float(model.max_tau_scatt_init),
    )

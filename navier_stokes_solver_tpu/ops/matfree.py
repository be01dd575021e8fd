"""Matrix-free cell-local operators on the structured Taylor-Hood grid.

This module is the TPU-native replacement for the reference's assembled
Jacobian / residual (``NSSolver::assemble_system``, NSSolver.cpp:313-599;
stationary variant NSSolverStationary.cpp:317-577) and for Trilinos SpMV.
Each operator application is:

    stride-slice gather (cell-local DoFs)
      -> batched einsum against reference-element tables  (MXU matmuls)
      -> pointwise physics at quadrature points            (VPU)
      -> batched einsum with test functions                (MXU)
      -> dilated-pad scatter-add back to the node lattice

All shapes are static; the voxelized cylinder is handled by masking inactive
cell lanes (``disc.cell_mask``), and lattice nodes that do not exist in the
reference triangulation behave as identity rows so Krylov stays well-posed.

Sign conventions follow the reference exactly, including the regime split:

  * Stokes / first-iteration regime (NSSolver.cpp:381-409): Jacobian =
    nu (grad du, grad v) - (div v, dp) - (div du, q); rhs = outlet Neumann
    only.  (The state-dependent ``(u - u_old) / dt`` matrix quirk at
    NSSolver.cpp:396-398 is identically zero at runtime because
    ``solution_old`` is refreshed before the first assembly of each step,
    NSSolver.cpp:820 -- documented, not implemented.)
  * Newton regime (NSSolver.cpp:411-519): adds linearized convection and the
    implicit-Euler mass term, and flips the continuity coupling sign to
    + (div du, q) (NSSolver.cpp:461-463).

Dirichlet handling replicates ``MatrixTools::apply_boundary_values`` with
``eliminate_columns = false`` (NSSolver.cpp:596-597): constrained *rows* are
replaced by ``diag * x_i`` (the assembled diagonal is kept) while columns are
left untouched, and the rhs entry becomes ``diag * g_i``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.ops.disc import Disc

__all__ = [
    "LinearizationQ",
    "eval_state",
    "apply_F",
    "apply_B",
    "apply_Bt",
    "apply_Mp",
    "apply_Mp_raw",
    "apply_Fp",
    "apply_Lp",
    "diag_Lp",
    "p_outlet_mask",
    "apply_jacobian",
    "residual",
    "diag_F",
    "diag_Mp",
    "lift_drag_forces",
    "make_dot",
]


# ---------------------------------------------------------------------------
# Gather / scatter between node lattices and cell-local layout
# ---------------------------------------------------------------------------


def _gather(x: jax.Array, k: int, ny: int, nx: int) -> jax.Array:
    """Gather cell-local DoFs from a degree-k lattice.

    ``x``: [..., NY, NX] -> [n_loc, ..., ny, nx] where local node
    m = a * (k+1) + b sits at lattice position (k*iy + a, k*ix + b).
    Pure strided slicing (XLA-fusible; no gather op).
    """
    lead = x.shape[:-2]
    nd = len(lead)
    slabs = []
    for a in range(k + 1):
        for b in range(k + 1):
            start = (0,) * nd + (a, b)
            limit = lead + (a + k * (ny - 1) + 1, b + k * (nx - 1) + 1)
            strides = (1,) * nd + (k, k)
            slabs.append(jax.lax.slice(x, start, limit, strides))
    return jnp.stack(slabs)


def _scatter(loc: jax.Array, k: int, ny: int, nx: int) -> jax.Array:
    """Scatter-add cell-local contributions onto the degree-k lattice.

    ``loc``: [n_loc, ..., ny, nx] -> [..., NY, NX].  Implemented as a sum of
    interior-padded (dilated) arrays -- pure dense ops, no XLA scatter.
    """
    NY, NX = k * ny + 1, k * nx + 1
    lead = loc.shape[1:-2]
    nd = len(lead)
    zero = jnp.zeros((), loc.dtype)
    out = None
    i = 0
    for a in range(k + 1):
        for b in range(k + 1):
            cfg = [(0, 0, 0)] * nd + [
                (a, NY - (a + k * (ny - 1) + 1), k - 1),
                (b, NX - (b + k * (nx - 1) + 1), k - 1),
            ]
            padded = jax.lax.pad(loc[i], zero, cfg)
            out = padded if out is None else out + padded
            i += 1
    return out


def _axis_seam_sum(y: jax.Array, axis_name: str, n: int, dim: int) -> jax.Array:
    """Ring-exchange and add the first/last slice of ``dim`` with the
    neighbors along ``axis_name`` (non-periodic)."""
    lo = jax.lax.slice_in_dim(y, 0, 1, axis=dim)
    hi = jax.lax.slice_in_dim(y, y.shape[dim] - 1, y.shape[dim], axis=dim)
    perm_r = [(i, i + 1) for i in range(n - 1)]
    perm_l = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(hi, axis_name, perm_r)
    from_right = jax.lax.ppermute(lo, axis_name, perm_l)
    mid = jax.lax.slice_in_dim(y, 1, y.shape[dim] - 1, axis=dim)
    return jnp.concatenate([lo + from_left, mid, hi + from_right], axis=dim)


def _seam_sum(disc: Disc, y: jax.Array) -> jax.Array:
    """Sum seam partial scatters with the neighbors' copies.

    Under the 1-D/2-D domain decomposition each tile duplicates its boundary
    lattice columns/rows with its neighbors; cell-local scatter produces only
    the partial sum from locally-owned cells.  ``ppermute`` ring exchanges
    over ICI (the analog of Trilinos ``compress(add)`` ghost exchange,
    NSSolver.cpp:560-562) complete the sum and leave all copies consistent.
    The x-exchange runs first, so the subsequent y-exchange carries
    x-complete rows and corner nodes (shared by four tiles) come out right.
    """
    if disc.halo_axis is not None and disc.halo_n > 1:
        y = _axis_seam_sum(y, disc.halo_axis, disc.halo_n, y.ndim - 1)
    if disc.halo_axis_y is not None and disc.halo_ny > 1:
        y = _axis_seam_sum(y, disc.halo_axis_y, disc.halo_ny, y.ndim - 2)
    return y


def _gather_v(disc: Disc, u: jax.Array) -> jax.Array:
    return _gather(u, disc.deg_v, disc.ny, disc.nx)  # [n_v, 2, ny, nx]


def _gather_p(disc: Disc, p: jax.Array) -> jax.Array:
    return _gather(p, disc.deg_p, disc.ny, disc.nx)  # [n_p, ny, nx]


def _scatter_v(disc: Disc, loc: jax.Array) -> jax.Array:
    return _seam_sum(disc, _scatter(loc, disc.deg_v, disc.ny, disc.nx))


def _scatter_p(disc: Disc, loc: jax.Array) -> jax.Array:
    return _seam_sum(disc, _scatter(loc, disc.deg_p, disc.ny, disc.nx))


def _seam_weight(disc: Disc, width: int, axis_name: str, n: int) -> jax.Array:
    """Per-column inner-product weight: duplicated seam columns count 1/2 on
    each of the two tiles sharing them (exact in floating point)."""
    idx = jax.lax.axis_index(axis_name)
    w = jnp.ones((width,), disc.dtype)
    w = w.at[0].set(jnp.where(idx == 0, 1.0, 0.5))
    w = w.at[-1].set(jnp.where(idx == n - 1, 1.0, 0.5))
    return w


def seam_weights(disc: Disc, k: int) -> jax.Array | None:
    """[NY, NX] inner-product weights for a degree-``k`` tile lattice:
    duplicated seam columns/rows weigh 1/2 per sharing tile (corners 1/4).
    ``None`` when the disc is not decomposed (all weights would be 1)."""
    has_x = disc.halo_axis is not None and disc.halo_n > 1
    has_y = disc.halo_axis_y is not None and disc.halo_ny > 1
    if not (has_x or has_y):
        return None
    wx = (
        _seam_weight(disc, k * disc.nx + 1, disc.halo_axis, disc.halo_n)
        if has_x
        else jnp.ones((k * disc.nx + 1,), disc.dtype)
    )
    wy = (
        _seam_weight(disc, k * disc.ny + 1, disc.halo_axis_y, disc.halo_ny)
        if has_y
        else jnp.ones((k * disc.ny + 1,), disc.dtype)
    )
    return wy[:, None] * wx[None, :]


def mesh_axes(disc: Disc) -> tuple[str, ...]:
    """Device-mesh axis names this tile participates in (empty = single)."""
    return tuple(
        a
        for a, n in (
            (disc.halo_axis, disc.halo_n),
            (disc.halo_axis_y, disc.halo_ny),
        )
        if a is not None and n > 1
    )


def make_dot(disc: Disc):
    """Inner product over (possibly tile-local) lattice pytrees.

    Single tile: plain ``vdot``.  Distributed: seam-weighted local sum +
    ``psum`` over the mesh axes (the analog of Trilinos dot-product
    allreduces inside Krylov, SURVEY.md section 5).  In 2-D the weights are
    the tensor product of the per-axis seam weights (corner copies weigh
    1/4, exactly).  Simplex discs delegate to the unstructured backend's
    seam-weighted dot."""
    if not isinstance(disc, Disc):
        from navier_stokes_solver_tpu.unstructured.ops import (
            make_dot as simplex_make_dot,
        )

        return simplex_make_dot(disc)
    has_x = disc.halo_axis is not None and disc.halo_n > 1
    has_y = disc.halo_axis_y is not None and disc.halo_ny > 1
    if not (has_x or has_y):
        from navier_stokes_solver_tpu.krylov.solvers import tvdot

        return tvdot

    wv = seam_weights(disc, disc.deg_v)
    wp = seam_weights(disc, disc.deg_p)
    axes = tuple(
        a for a in (disc.halo_axis if has_x else None,
                    disc.halo_axis_y if has_y else None)
        if a is not None
    )

    def dot(x, y):
        s = jnp.zeros((), disc.dtype)
        for a, b in zip(jax.tree_util.tree_leaves(x), jax.tree_util.tree_leaves(y)):
            w = wv if a.shape[-1] == wv.shape[-1] else wp
            s = s + jnp.sum(a * b * w)
        return jax.lax.psum(s, axes)

    return dot


# ---------------------------------------------------------------------------
# Quadrature-point evaluation (deal.II FEValues::get_function_{values,gradients})
# ---------------------------------------------------------------------------


def _eval_v(disc: Disc, u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Velocity values [n_q, 2, ny, nx] and physical gradients
    [n_q, 2(comp), 2(dim), ny, nx] at volume quadrature points."""
    t = disc.tables
    loc = _gather_v(disc, u)
    phi = jnp.asarray(t.phi_v, disc.dtype)
    dphi = jnp.asarray(t.dphi_v, disc.dtype)
    vals = jnp.einsum("qm,mcyx->qcyx", phi, loc)
    gx = jnp.einsum("qm,mcyx->qcyx", dphi[:, :, 0], loc) / disc.hx
    gy = jnp.einsum("qm,mcyx->qcyx", dphi[:, :, 1], loc) / disc.hy
    return vals, jnp.stack([gx, gy], axis=2)


def _eval_p(disc: Disc, p: jax.Array) -> jax.Array:
    t = disc.tables
    loc = _gather_p(disc, p)
    return jnp.einsum("qn,nyx->qyx", jnp.asarray(t.phi_p, disc.dtype), loc)


class LinearizationQ(NamedTuple):
    """Current Newton state evaluated at quadrature points."""

    u: jax.Array  # [n_q, 2, ny, nx]
    gradu: jax.Array  # [n_q, 2, 2, ny, nx]
    p: jax.Array  # [n_q, ny, nx]


def eval_state(disc: Disc, st: Blocks) -> LinearizationQ:
    vals, grads = _eval_v(disc, st.u)
    return LinearizationQ(u=vals, gradu=grads, p=_eval_p(disc, st.p))


# ---------------------------------------------------------------------------
# Projection back onto test functions (the transpose of evaluation)
# ---------------------------------------------------------------------------


def _qweights(disc: Disc) -> jax.Array:
    t = disc.tables
    return jnp.asarray(t.w_q, disc.dtype) * (disc.hx * disc.hy)


def _project_v(disc: Disc, f_val, f_grad) -> jax.Array:
    """R[m,c] = sum_q JxW (f_val[q,c] phi_m + f_grad[q,c,:] . grad phi_m),
    masked by active cells, scattered to the velocity lattice.

    Either of ``f_val`` [n_q,2,ny,nx] / ``f_grad`` [n_q,2,2,ny,nx] may be None.
    """
    t = disc.tables
    w = _qweights(disc)
    mask = disc.cell_mask
    loc = None
    if f_val is not None:
        phi_w = jnp.asarray(t.phi_v, disc.dtype) * w[:, None]
        loc = jnp.einsum("qm,qcyx->mcyx", phi_w, f_val * mask)
    if f_grad is not None:
        dphi = jnp.asarray(t.dphi_v, disc.dtype)
        dxw = dphi[:, :, 0] * (w / disc.hx)[:, None]
        dyw = dphi[:, :, 1] * (w / disc.hy)[:, None]
        g = f_grad * mask
        term = jnp.einsum("qm,qcyx->mcyx", dxw, g[:, :, 0]) + jnp.einsum(
            "qm,qcyx->mcyx", dyw, g[:, :, 1]
        )
        loc = term if loc is None else loc + term
    return _scatter_v(disc, loc)


def _project_p(disc: Disc, f_val: jax.Array) -> jax.Array:
    """R[n] = sum_q JxW f_val[q] psi_n, masked and scattered."""
    t = disc.tables
    w = _qweights(disc)
    phi_w = jnp.asarray(t.phi_p, disc.dtype) * w[:, None]
    return _scatter_p(disc, jnp.einsum("qn,qyx->nyx", phi_w, f_val * disc.cell_mask))


# ---------------------------------------------------------------------------
# Block operators
# ---------------------------------------------------------------------------


def _convection_linearized(linq: LinearizationQ, xv, xg) -> jax.Array:
    """Frechet derivative of the convective term at u_k (NSSolver.cpp:424-441):
    conv[c] = sum_l u_k[l] * dx[c,l] + xv[l] * gradu_k[c,l]."""
    return jnp.einsum("qlyx,qclyx->qcyx", linq.u, xg) + jnp.einsum(
        "qlyx,qclyx->qcyx", xv, linq.gradu
    )


def apply_F(
    disc: Disc,
    nu,
    inv_dt,
    linq: LinearizationQ | None,
    x_u: jax.Array,
    *,
    stokes: bool,
    bc_diag: jax.Array | None = None,
) -> jax.Array:
    """Velocity-block (0,0) operator application.

    Stokes regime: nu * (grad du, grad v) (NSSolver.cpp:383-388).
    Newton regime: adds linearized convection + du . v / dt
    (NSSolver.cpp:424-453).  ``inv_dt = 0`` gives the stationary variant.

    ``bc_diag``: if given, constrained rows are replaced by ``diag * x``
    (the post-``apply_boundary_values`` matrix, as used for preconditioner
    inner solves on the velocity block, NSSolver.cpp:609).
    """
    from navier_stokes_solver_tpu.ops.pallas_cell import (
        cell_apply_F_pallas,
        pallas_enabled,
    )

    # Mosaic has no f64 on TPU: the fused kernel serves the f32
    # preconditioner context; the f64 outer matvec stays on the XLA path.
    if pallas_enabled() and x_u.dtype == jnp.float32:
        x_loc = _gather_v(disc, x_u)
        loc = cell_apply_F_pallas(disc, nu, inv_dt, linq, x_loc, stokes=stokes)
        y = _scatter_v(disc, loc)
    elif stokes:
        xv, xg = _eval_v(disc, x_u)
        y = _project_v(disc, None, nu * xg)
    else:
        xv, xg = _eval_v(disc, x_u)
        f_val = _convection_linearized(linq, xv, xg) + inv_dt * xv
        y = _project_v(disc, f_val, nu * xg)
    if bc_diag is not None:
        y = jnp.where(disc.u_dirichlet, bc_diag * x_u, y)
        y = jnp.where(disc.u_active, y, x_u)
    return y


def apply_Bt(
    disc: Disc, x_p: jax.Array, *, zero_dirichlet_rows: bool = False
) -> jax.Array:
    """Pressure-gradient coupling into velocity rows: -(div v, dp)
    (same sign in both regimes: NSSolver.cpp:391-393 and :456-458).

    ``zero_dirichlet_rows=True`` gives the post-BC block(0,1) whose
    constrained rows were eliminated (used by aSIMPLE, NSSolver.cpp:649).
    """
    pv = _eval_p(disc, x_p)
    eye = jnp.eye(2, dtype=disc.dtype)
    f_grad = -pv[:, None, None] * eye[None, :, :, None, None]
    y = _project_v(disc, None, f_grad)
    if zero_dirichlet_rows:
        y = jnp.where(disc.u_dirichlet | ~disc.u_active, 0.0, y)
    return y


def apply_B(disc: Disc, x_u: jax.Array, *, stokes: bool) -> jax.Array:
    """Continuity coupling into pressure rows: -(div du, q) in the Stokes
    regime (NSSolver.cpp:401-403), +(div du, q) in the Newton regime
    (NSSolver.cpp:461-463)."""
    _, xg = _eval_v(disc, x_u)
    div = xg[:, 0, 0] + xg[:, 1, 1]
    return _project_p(disc, -div if stokes else div)


def apply_Mp(disc: Disc, nu, x_p: jax.Array) -> jax.Array:
    """Pressure mass matrix scaled by 1/nu (NSSolver.cpp:406-408), with
    identity on non-existent pressure lanes."""
    pv = _eval_p(disc, x_p)
    y = _project_p(disc, pv / nu)
    return jnp.where(disc.p_active, y, x_p)


def p_outlet_mask(disc: Disc) -> jax.Array:
    """Pressure-lattice nodes on the outlet boundary (id 8, x = 2.2).

    Under x-decomposition only the rightmost tile owns the outlet column
    (resolved by ``axis_index`` inside shard_map)."""
    NPy, NPx = disc.NP
    m = jnp.broadcast_to((jnp.arange(NPx) == NPx - 1)[None, :], (NPy, NPx))
    if disc.halo_axis is not None and disc.halo_n > 1:
        idx = jax.lax.axis_index(disc.halo_axis)
        m = m & (idx == disc.halo_n - 1)
    return m & disc.p_active


def apply_Lp(disc: Disc, x_p: jax.Array) -> jax.Array:
    """Pressure Laplacian (grad psi_j, grad psi_i) on active cells.

    This operator does not exist in the reference; it is the second leg of
    the Cahouet-Chabard Schur approximation for the *unsteady* regime,
    S^-1 ~ nu Mp^-1 + (1/dt) Lp^-1 (Cahouet & Chabard, Int. J. Numer.
    Methods Fluids 8, 1988) -- with the implicit-Euler time term the Schur
    complement is dt-Laplacian-dominated and the reference's pure
    pressure-mass preconditioner (NSSolver.hpp:228-236) loses
    h/dt-robustness.  Boundary conditions (standard CC choice): natural
    (Neumann) on the velocity-Dirichlet boundaries, identity (Dirichlet)
    rows on the outflow column where the velocity is free -- which also
    makes the operator nonsingular.  Non-existent lattice lanes are
    identity rows.

    Unlike the reference-faithful Jacobian elimination (rows only,
    ``eliminate_columns=false``), the constrained rows AND columns are
    eliminated here so the operator stays exactly symmetric -- it feeds
    CG and Chebyshev, and no parity constraint applies.
    """
    t = disc.tables
    free = disc.p_active & ~p_outlet_mask(disc)
    loc = _gather_p(disc, jnp.where(free, x_p, 0.0))
    dphi = jnp.asarray(t.dphi_p, disc.dtype)
    gx = jnp.einsum("qn,nyx->qyx", dphi[:, :, 0], loc) / disc.hx
    gy = jnp.einsum("qn,nyx->qyx", dphi[:, :, 1], loc) / disc.hy
    w = _qweights(disc)
    dxw = dphi[:, :, 0] * (w / disc.hx)[:, None]
    dyw = dphi[:, :, 1] * (w / disc.hy)[:, None]
    mask = disc.cell_mask
    out = jnp.einsum("qn,qyx->nyx", dxw, gx * mask) + jnp.einsum(
        "qn,qyx->nyx", dyw, gy * mask
    )
    y = _scatter_p(disc, out)
    return jnp.where(free, y, x_p)


def apply_Fp(disc: Disc, nu, inv_dt, linq, x_p: jax.Array) -> jax.Array:
    """Pressure convection-diffusion operator (the PCD middle factor):

        Fp = inv_dt * Mp_raw + nu * Lp + N_p(u_k),

    with N_p the convection (u_k . grad p, psi) evaluated from the Newton
    linearization state at the shared volume quadrature points, and the
    same symmetric outlet/inactive elimination as ``apply_Lp`` so the
    composition Mp^-1 Fp Ap^-1 passes constrained entries through
    coherently.  ``Mp_raw`` is the UNSCALED pressure mass (the 1/nu
    scaling of ``apply_Mp`` belongs to the reference's preconditioner
    formula, not to the PCD algebra).  In the Stokes limit
    (``linq=None``, inv_dt = 0) Fp = nu Lp, so Mp^-1 Fp Ap^-1 reduces to
    the reference's nu-scaled mass solve exactly.

    No reference analog (Trilinos has no PCD); this is the
    h-robustness upgrade of the Schur block (Elman, Silvester & Wathen,
    "Finite Elements and Fast Iterative Solvers", ch. 9).
    """
    t = disc.tables
    free = disc.p_active & ~p_outlet_mask(disc)
    loc = _gather_p(disc, jnp.where(free, x_p, 0.0))
    phi = jnp.asarray(t.phi_p, disc.dtype)
    dphi = jnp.asarray(t.dphi_p, disc.dtype)
    pv = jnp.einsum("qn,nyx->qyx", phi, loc)
    gx = jnp.einsum("qn,nyx->qyx", dphi[:, :, 0], loc) / disc.hx
    gy = jnp.einsum("qn,nyx->qyx", dphi[:, :, 1], loc) / disc.hy
    w = _qweights(disc)
    mask = disc.cell_mask
    # diffusion leg: nu (grad p, grad psi)
    dxw = dphi[:, :, 0] * (w / disc.hx)[:, None]
    dyw = dphi[:, :, 1] * (w / disc.hy)[:, None]
    out = nu * (
        jnp.einsum("qn,qyx->nyx", dxw, gx * mask)
        + jnp.einsum("qn,qyx->nyx", dyw, gy * mask)
    )
    # reaction + convection legs: (p/dt + u_k . grad p, psi)
    f_val = inv_dt * pv
    if linq is not None:
        f_val = f_val + linq.u[:, 0] * gx + linq.u[:, 1] * gy
    phi_w = phi * w[:, None]
    out = out + jnp.einsum("qn,qyx->nyx", phi_w, f_val * mask)
    y = _scatter_p(disc, out)
    return jnp.where(free, y, x_p)


def apply_Mp_raw(disc: Disc, x_p: jax.Array) -> jax.Array:
    """Unscaled pressure mass with the PCD elimination convention
    (identity on outlet + non-existent rows; cf. ``apply_Mp`` which keeps
    the reference's 1/nu scaling and eliminates nothing)."""
    free = disc.p_active & ~p_outlet_mask(disc)
    pv = _eval_p(disc, jnp.where(free, x_p, 0.0))
    y = _project_p(disc, pv)
    return jnp.where(free, y, x_p)


def diag_Lp(disc: Disc) -> jax.Array:
    """Diagonal of the pressure Laplacian (Jacobi/Chebyshev smoothing);
    constrained/non-existent rows get 1.0."""
    t = disc.tables
    w = _qweights(disc)
    dphi = jnp.asarray(t.dphi_p, disc.dtype)
    dx = dphi[:, :, 0] / disc.hx
    dy = dphi[:, :, 1] / disc.hy
    loc = jnp.einsum("q,qn->n", w, dx * dx + dy * dy)
    d = _scatter_p(
        disc,
        jnp.broadcast_to(loc[:, None, None], (t.n_p, disc.ny, disc.nx))
        * disc.cell_mask,
    )
    d = jnp.where(p_outlet_mask(disc), 1.0, d)
    return jnp.where(disc.p_active, d, 1.0)


def apply_jacobian(
    disc: Disc,
    nu,
    inv_dt,
    linq: LinearizationQ | None,
    bc_diag: jax.Array,
    x: Blocks,
    *,
    stokes: bool,
) -> Blocks:
    """Full 2x2 block Jacobian application with Dirichlet row elimination.

    Matches the system solved by the reference's outer Krylov
    (NSSolver.cpp:601-672): rows at Dirichlet velocity DoFs are
    ``diag * x`` (columns NOT eliminated), non-existent lattice lanes are
    identity.
    """
    xv, xg = _eval_v(disc, x.u)
    pv = _eval_p(disc, x.p)
    eye = jnp.eye(2, dtype=disc.dtype)
    f_grad = nu * xg - pv[:, None, None] * eye[None, :, :, None, None]
    if stokes:
        yu = _project_v(disc, None, f_grad)
    else:
        f_val = _convection_linearized(linq, xv, xg) + inv_dt * xv
        yu = _project_v(disc, f_val, f_grad)
    div = xg[:, 0, 0] + xg[:, 1, 1]
    yp = _project_p(disc, -div if stokes else div)

    yu = jnp.where(disc.u_dirichlet, bc_diag * x.u, yu)
    yu = jnp.where(disc.u_active, yu, x.u)
    yp = jnp.where(disc.p_active, yp, x.p)
    return Blocks(u=yu, p=yp)


def residual(
    disc: Disc,
    nu,
    inv_dt,
    st: Blocks,
    u_old: jax.Array,
    bc_diag: jax.Array,
    *,
    stokes: bool,
    inlet_amp,
    p_out: float = 1.0,
    consistent: bool = False,
) -> Blocks:
    """Assembled rhs = -R(u_k) after BC application.

    Newton regime terms (all negated, NSSolver.cpp:477-519): time term
    (u - u_old) . v / dt, viscous a(u_k, v), convective c(u_k; u_k, v),
    +b(v, p_k), +b(u_k, q); plus the outlet Neumann term (:528-551) and
    Dirichlet rows ``diag * g`` (:564-598).  Stokes regime: rhs = Neumann
    term only (the i-loop is skipped, NSSolver.cpp:472-475).

    ``inlet_amp``: amplitude of the inlet parabola lifted into the Dirichlet
    rows -- U_m on the very first assembly, 0 afterwards (increment
    formulation, NSSolver.cpp:573-580).

    ``consistent``: the reference's Newton-regime continuity rhs has the
    WRONG RELATIVE SIGN vs its Jacobian: the matrix assembles
    +(q, div du) (NSSolver.cpp:461-463) while the "-R" rhs *adds*
    +(q, div u_k) (NSSolver.cpp:517-519, a `+=` where Newton consistency
    needs `-=`).  The solved update then satisfies div(du) = +div(u_k),
    so the divergence of the iterate DOUBLES on every accepted full
    Newton step -- the measured, exactly-x2-per-step antisymmetric blowup
    of long unsteady trajectories (docs/PERF.md round 4; the reference's
    own shipped lift/drag artifact diverges by step 3).  ``False`` (the
    default) keeps reference parity; ``True`` assembles the
    Jacobian-consistent -(q, div u_k) so Newton actually contracts the
    continuity residual.
    """
    if stokes:
        ru = p_out * disc.neumann_rhs1
        rp = jnp.zeros(disc.NP, disc.dtype)
        if disc.forcing_rhs is not None:
            ru = ru + disc.forcing_rhs
    else:
        linq = eval_state(disc, st)
        u_old_q, _ = _eval_v(disc, u_old)
        conv = jnp.einsum("qlyx,qclyx->qcyx", linq.u, linq.gradu)
        f_val = -inv_dt * (linq.u - u_old_q) - conv
        eye = jnp.eye(2, dtype=disc.dtype)
        f_grad = -nu * linq.gradu + linq.p[:, None, None] * eye[None, :, :, None, None]
        ru = _project_v(disc, f_val, f_grad) + p_out * disc.neumann_rhs1
        if disc.forcing_rhs is not None:
            ru = ru + disc.forcing_rhs
        div = linq.gradu[:, 0, 0] + linq.gradu[:, 1, 1]
        rp = _project_p(disc, -div if consistent else div)

    g = dirichlet_values(disc, inlet_amp)
    ru = jnp.where(disc.u_dirichlet, bc_diag * g, ru)
    ru = jnp.where(disc.u_active, ru, 0.0)
    rp = jnp.where(disc.p_active, rp, 0.0)
    return Blocks(u=ru, p=rp)


def dirichlet_values(disc: Disc, inlet_amp) -> jax.Array:
    """Dirichlet boundary values g: inlet parabola (x-component) scaled by
    ``inlet_amp`` on id-7 nodes, zero on ids 6/10 (NSSolver.cpp:573-594)."""
    gx = jnp.where(disc.u_inlet, inlet_amp * disc.inlet_profile1[:, None], 0.0)
    return jnp.stack([gx, jnp.zeros_like(gx)])


# ---------------------------------------------------------------------------
# Diagonals (for BC rows and the Jacobi/Chebyshev smoother layer)
# ---------------------------------------------------------------------------


def diag_F(
    disc: Disc, nu, inv_dt, linq: LinearizationQ | None, *, stokes: bool
) -> jax.Array:
    """Diagonal of the velocity block, matrix-free.

    Per cell, per local dof (m, c) (derived from NSSolver.cpp:424-453):
      JxW * [ nu |grad phi_m|^2
              + (Newton) phi_m^2 / dt + phi_m (u_k . grad phi_m)
              + (Newton) phi_m^2 (grad u_k)_{cc} ].
    Non-existent lanes get 1.0 so the result is safely invertible.
    """
    t = disc.tables
    w = _qweights(disc)
    phi = jnp.asarray(t.phi_v, disc.dtype)
    dphi = jnp.asarray(t.dphi_v, disc.dtype)
    dx = dphi[:, :, 0] / disc.hx
    dy = dphi[:, :, 1] / disc.hy

    # c-independent constants per local dof: [n_v]
    visc = jnp.einsum("q,qm->m", w, nu * (dx * dx + dy * dy))
    loc = jnp.broadcast_to(
        visc[:, None, None, None], (t.n_v, 2, disc.ny, disc.nx)
    )
    if not stokes:
        mass = jnp.einsum("q,qm->m", w, phi * phi) * inv_dt
        loc = loc + mass[:, None, None, None]
        # field terms: phi (u_k . grad phi)  and  phi^2 (grad u_k)_{cc}
        conv1 = jnp.einsum(
            "qm,qyx->myx", w[:, None] * phi * dx, linq.u[:, 0]
        ) + jnp.einsum("qm,qyx->myx", w[:, None] * phi * dy, linq.u[:, 1])
        phi2w = w[:, None] * phi * phi
        conv2 = jnp.stack(
            [
                jnp.einsum("qm,qyx->myx", phi2w, linq.gradu[:, 0, 0]),
                jnp.einsum("qm,qyx->myx", phi2w, linq.gradu[:, 1, 1]),
            ],
            axis=1,
        )  # [n_v, 2, ny, nx]
        loc = loc + conv1[:, None] + conv2
    d = _scatter_v(disc, loc * disc.cell_mask)
    return jnp.where(disc.u_active, d, 1.0)


def diag_Mp(disc: Disc, nu) -> jax.Array:
    """Diagonal of the (1/nu-scaled) pressure mass matrix."""
    t = disc.tables
    w = _qweights(disc)
    phi = jnp.asarray(t.phi_p, disc.dtype)
    loc = jnp.einsum("q,qn->n", w, phi * phi) / nu
    d = _scatter_p(
        disc,
        jnp.broadcast_to(loc[:, None, None], (t.n_p, disc.ny, disc.nx))
        * disc.cell_mask,
    )
    return jnp.where(disc.p_active, d, 1.0)


# ---------------------------------------------------------------------------
# Lift / drag face integral (NSSolver.cpp:839-938)
# ---------------------------------------------------------------------------


def lift_drag_forces(disc: Disc, nu, st: Blocks) -> tuple[jax.Array, jax.Array]:
    """Integrate the full stress over the cylinder boundary (id-10 faces).

    sigma = nu (grad u + grad u^T) - p I; per face quadrature point the force
    is -sigma . n * JxW with n the cell-outward normal (pointing into the
    cylinder), matching NSSolver.cpp:892-927.  Returns (drag, lift) =
    (F_x, F_y); the global sum plays the role of ``Utilities::MPI::sum``
    (NSSolver.cpp:933-934).
    """
    t = disc.tables
    u_loc = _gather_v(disc, st.u)  # [n_v, 2, ny, nx]
    p_loc = _gather_p(disc, st.p)
    face_h = (disc.hy, disc.hy, disc.hx, disc.hx)
    drag = jnp.zeros((), disc.dtype)
    lift = jnp.zeros((), disc.dtype)
    for f in range(4):
        mask = disc.cyl_face_mask[f]
        phi = jnp.asarray(t.phi_v_face[f], disc.dtype)
        dphi = jnp.asarray(t.dphi_v_face[f], disc.dtype)
        phip = jnp.asarray(t.phi_p_face[f], disc.dtype)
        wf = jnp.asarray(t.w_qf, disc.dtype) * face_h[f]
        n = jnp.asarray(t.normals[f], disc.dtype)

        gx = jnp.einsum("qm,mcyx->qcyx", dphi[:, :, 0], u_loc) / disc.hx
        gy = jnp.einsum("qm,mcyx->qcyx", dphi[:, :, 1], u_loc) / disc.hy
        grad = jnp.stack([gx, gy], axis=2)  # [qf, c, d, ny, nx]
        pv = jnp.einsum("qn,nyx->qyx", phip, p_loc)

        sig = nu * (grad + jnp.swapaxes(grad, 1, 2))
        eye = jnp.eye(2, dtype=disc.dtype)
        sig = sig - pv[:, None, None] * eye[None, :, :, None, None]
        # force[c] = -sum_d sig[c,d] n[d] * JxW_f, masked to id-10 faces
        force = -jnp.einsum("qcdyx,d,q->cyx", sig, n, wf)
        drag = drag + jnp.sum(force[0] * mask)
        lift = lift + jnp.sum(force[1] * mask)
    axes = tuple(
        a
        for a, n in (
            (disc.halo_axis, disc.halo_n),
            (disc.halo_axis_y, disc.halo_ny),
        )
        if a is not None and n > 1
    )
    if axes:
        drag = jax.lax.psum(drag, axes)
        lift = jax.lax.psum(lift, axes)
    return drag, lift

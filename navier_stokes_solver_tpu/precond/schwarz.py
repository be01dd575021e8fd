"""Cell-block additive Schwarz smoother for the velocity block.

Point-Jacobi smoothing is weak for high-order (Q3) elements: most of the
spectrum lives in intra-cell couplings the diagonal cannot see.  The
TPU-native strong smoother is overlapping additive Schwarz with one block
per cell: the local 2*n_v x 2*n_v velocity matrix of every cell is
assembled in one batched einsum sweep, inverted in one batched
``linalg.inv`` (MXU), and applied as gather -> batched matvec ->
multiplicity-weighted scatter.  This is the role ILU plays for the
reference (strong local coupling resolution) expressed as dense batched
linear algebra instead of a sequential sparse sweep.

Constrained lattice nodes (Dirichlet rows, nodes of the cylinder hole) are
decoupled in the local matrices (identity row/col) and smoothed exactly by
the global diagonal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.ops.matfree import (
    LinearizationQ,
    _gather_v,
    _scatter_v,
)

__all__ = ["make_schwarz_smoother"]


def _cell_matrices(
    disc: Disc, nu, inv_dt, linq: LinearizationQ | None, *, stokes: bool
) -> jax.Array:
    """Batched local velocity-block matrices [ny, nx, 2 n_v, 2 n_v].

    Row/column index = c * n_v + m (component-major), matching the weak
    form of ``apply_F``: viscous nu (grad phi_n, grad phi_m), implicit-Euler
    mass, and the linearized convection (NSSolver.cpp:424-453).
    """
    t = disc.tables
    dtype = disc.dtype
    n_v = t.n_v
    w = jnp.asarray(t.w_q, dtype) * (disc.hx * disc.hy)
    phi = jnp.asarray(t.phi_v, dtype)  # [q, m]
    dx = jnp.asarray(t.dphi_v[:, :, 0], dtype) / disc.hx
    dy = jnp.asarray(t.dphi_v[:, :, 1], dtype) / disc.hy

    # cell-independent: viscous + mass  [m, n]
    visc = jnp.einsum("q,qm,qn->mn", w, dx, dx) + jnp.einsum(
        "q,qm,qn->mn", w, dy, dy
    )
    base = nu * visc
    if not stokes:
        base = base + inv_dt * jnp.einsum("q,qm,qn->mn", w, phi, phi)

    ny, nx = disc.ny, disc.nx
    zeros = jnp.zeros((ny, nx, n_v, n_v), dtype)
    diag_blk = jnp.broadcast_to(base, (ny, nx, n_v, n_v))

    if not stokes and linq is not None:
        # (u_k . grad phi_n) phi_m  -- component-diagonal
        conv1 = jnp.einsum(
            "q,qm,qn,qyx->yxmn", w, phi, dx, linq.u[:, 0]
        ) + jnp.einsum("q,qm,qn,qyx->yxmn", w, phi, dy, linq.u[:, 1])
        # phi_n (grad u_k)_{c,c'} phi_m  -- couples components
        def g(c, cp):
            return jnp.einsum(
                "q,qm,qn,qyx->yxmn", w, phi, phi, linq.gradu[:, c, cp]
            )

        a00 = diag_blk + conv1 + g(0, 0)
        a01 = g(0, 1)
        a10 = g(1, 0)
        a11 = diag_blk + conv1 + g(1, 1)
    else:
        a00 = a11 = diag_blk
        a01 = a10 = zeros

    A = jnp.concatenate(
        [
            jnp.concatenate([a00, a01], axis=-1),
            jnp.concatenate([a10, a11], axis=-1),
        ],
        axis=-2,
    )  # [ny, nx, 2 n_v, 2 n_v]

    # inactive cells -> identity (their nodes never receive corrections)
    eye = jnp.eye(2 * n_v, dtype=dtype)
    A = jnp.where(
        disc.cell_mask[:, :, None, None] > 0, A, eye[None, None]
    )

    # constrained nodes: decouple (identity row/col) so local solves do not
    # push corrections through Dirichlet boundaries / the cylinder hole
    ones_like_u = jnp.ones((2,) + disc.NV, dtype)
    constrained = disc.u_dirichlet | ~disc.u_active
    cmask_loc = _gather_v(disc, jnp.where(constrained, 1.0, 0.0) * ones_like_u)
    # [n_v, 2, ny, nx] -> [ny, nx, 2 n_v] with index c * n_v + m
    cmask = jnp.transpose(cmask_loc, (3, 2, 1, 0)).reshape(
        disc.nx, disc.ny, 2 * n_v
    )
    cmask = jnp.swapaxes(cmask, 0, 1)  # [ny, nx, 2 n_v]
    keep = 1.0 - cmask
    A = A * keep[:, :, :, None] * keep[:, :, None, :]
    A = A + jnp.einsum("yxi,ij->yxij", cmask, eye)
    return A


def make_schwarz_smoother(
    disc: Disc,
    nu,
    inv_dt,
    linq: LinearizationQ | None,
    global_diag: jax.Array,
    *,
    stokes: bool,
):
    """Build ``prec(r) -> d``: one weighted additive-Schwarz sweep.

    ``global_diag``: assembled diagonal of the velocity block (used to
    smooth constrained rows exactly).
    """
    t = disc.tables
    n_v = t.n_v
    A = _cell_matrices(disc, nu, inv_dt, linq, stokes=stokes)
    # One cell's own contribution to a shared node's diagonal misses the
    # neighbor cells' parts, leaving interior local blocks singular (the
    # per-cell pure-Neumann stiffness annihilates constants).  Substitute
    # the globally assembled diagonal, which carries every contribution:
    # the local solve then sees the correct diagonal and this cell's
    # off-diagonal couplings.
    gd_loc = _gather_v(disc, global_diag * jnp.ones((2,) + disc.NV, disc.dtype))
    gd = jnp.transpose(gd_loc, (2, 3, 1, 0)).reshape(
        disc.ny, disc.nx, 2 * n_v
    )
    eye = jnp.eye(2 * n_v, dtype=disc.dtype)
    off = A * (1.0 - eye)[None, None]
    A = off + jnp.einsum("yxi,ij->yxij", gd, eye)
    A_inv = jnp.linalg.inv(A)  # batched [ny, nx, 2 n_v, 2 n_v]

    # node multiplicity (how many cells share each lattice node)
    ones_loc = jnp.ones((n_v, 2) + (disc.ny, disc.nx), disc.dtype)
    mult = _scatter_v(disc, ones_loc)
    wmult = 1.0 / jnp.maximum(mult, 1.0)

    constrained = disc.u_dirichlet | ~disc.u_active
    dinv = 1.0 / global_diag

    def prec(r):
        r_loc = _gather_v(disc, r)  # [n_v, 2, ny, nx]
        rv = jnp.transpose(r_loc, (2, 3, 1, 0)).reshape(
            disc.ny, disc.nx, 2 * n_v
        )
        dv = jnp.einsum("yxij,yxj->yxi", A_inv, rv)
        d_loc = jnp.transpose(
            dv.reshape(disc.ny, disc.nx, 2, n_v), (3, 2, 0, 1)
        )
        d = _scatter_v(disc, d_loc) * wmult
        # constrained rows: exact (Jacobi) solve with the global diagonal
        return jnp.where(constrained, dinv * r, d)

    return prec

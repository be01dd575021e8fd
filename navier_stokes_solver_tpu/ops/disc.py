"""Device-side discretization data (pytree) built from a host FESpace.

``Disc`` bundles everything the matrix-free kernels need: grid/degree static
config plus the mask/profile arrays as device data.  It is a pytree, so it can
be passed through ``jit`` / ``shard_map`` / ``vmap`` boundaries; the
reference-element tables are *not* stored (they are tiny and rebuilt from the
static fields via the lru-cached ``make_taylor_hood``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from navier_stokes_solver_tpu.elements import make_taylor_hood
from navier_stokes_solver_tpu.geometry.channel import (
    BOUNDARY_CYLINDER,
    BOUNDARY_OUTLET,
)
from navier_stokes_solver_tpu.geometry.space import FESpace

__all__ = ["Disc", "MGEdge", "make_disc"]


@struct.dataclass
class Disc:
    # ---- static config (hashable; part of the jit cache key) ----
    nx: int = struct.field(pytree_node=False)
    ny: int = struct.field(pytree_node=False)
    deg_v: int = struct.field(pytree_node=False)
    deg_p: int = struct.field(pytree_node=False)
    n_q1d: int = struct.field(pytree_node=False)
    hx: float = struct.field(pytree_node=False)
    hy: float = struct.field(pytree_node=False)

    # ---- device data ----
    cell_mask: jax.Array  # [ny, nx] dtype; 1.0 on active cells else 0.0
    u_active: jax.Array  # [NVy, NVx] bool
    p_active: jax.Array  # [NPy, NPx] bool
    u_dirichlet: jax.Array  # [NVy, NVx] bool (boundary ids 6, 7, 10)
    u_inlet: jax.Array  # [NVy, NVx] bool (boundary id 7)
    inlet_profile1: jax.Array  # [NVy] parabolic profile at u_max = 1
    neumann_rhs1: jax.Array  # [2, NVy, NVx] outlet Neumann rhs at p_out = 1
    cyl_face_mask: jax.Array  # [4, ny, nx] dtype; id-10 faces (lift/drag)
    # Forcing term projected onto velocity test functions ([2, NVy, NVx]),
    # or None.  The reference's ForcingTerm is a zero placeholder
    # (NSSolver.hpp:93-122, sinusoidal variant commented out); here a
    # callable f(x, y) -> (fx, fy) can be supplied at make_disc time.
    forcing_rhs: jax.Array | None = None

    # Domain decomposition (dist/halo.py): when ``halo_axis`` is set, this
    # Disc describes ONE tile of a 1-D/2-D decomposition running inside
    # ``shard_map``; lattice scatters exchange seam partial sums with
    # neighbors over the named mesh axes and reductions ``psum`` over them.
    halo_axis: str | None = struct.field(pytree_node=False, default=None)
    halo_n: int = struct.field(pytree_node=False, default=1)
    halo_axis_y: str | None = struct.field(pytree_node=False, default=None)
    halo_ny: int = struct.field(pytree_node=False, default=1)

    # Geometric-multigrid chain (precond/mg.py): link to the next-coarser
    # rediscretized level plus velocity-lattice transfer operators.  ``None``
    # on the coarsest level / when MG is disabled.  This is the TPU-native
    # stand-in for Trilinos PreconditionAMG / ILU (SURVEY.md N10).
    mg: "MGEdge | None" = None

    @property
    def dtype(self):
        return self.cell_mask.dtype

    @property
    def tables(self):
        return make_taylor_hood(self.deg_v, self.deg_p, self.n_q1d)

    @property
    def NV(self) -> tuple[int, int]:
        return (self.deg_v * self.ny + 1, self.deg_v * self.nx + 1)

    @property
    def NP(self) -> tuple[int, int]:
        return (self.deg_p * self.ny + 1, self.deg_p * self.nx + 1)

    @property
    def cell_volume(self) -> float:
        return self.hx * self.hy

    def zeros_u(self) -> jax.Array:
        return jnp.zeros((2,) + self.NV, self.dtype)

    def zeros_p(self) -> jax.Array:
        return jnp.zeros(self.NP, self.dtype)


@struct.dataclass
class MGEdge:
    """Link from one multigrid level to the next-coarser one.

    ``coarse`` is a rediscretized Disc of the same channel at lower cell
    resolution (its own ``mg`` continues the chain).  Transfer operators are
    dense 1-D tensor factors over the velocity lattice, applied as einsum
    contractions (MXU-friendly):

      * prolongation (coarse -> fine): evaluate the coarse FE function at
        the fine lattice nodes, ``Pvy @ x @ Pvx^T``;
      * rhs restriction: the transpose sweep, ``Pvy^T @ r @ Pvx``;
      * state restriction (fine -> coarse, for the convection
        linearization): evaluate the fine FE function at coarse nodes,
        ``Evy @ u @ Evx^T``.
    """

    coarse: "Disc"
    Pvx: jax.Array  # [NVx_fine, NVx_coarse]
    Pvy: jax.Array  # [NVy_fine, NVy_coarse]
    Evx: jax.Array  # [NVx_coarse, NVx_fine]
    Evy: jax.Array  # [NVy_coarse, NVy_fine]
    # pressure-lattice prolongation factors (the pressure-Laplacian V-cycle
    # of the Cahouet-Chabard Schur leg; restriction = transpose sweep).
    # None on chains built before the pressure MG existed.
    Ppx: jax.Array | None = None  # [NPx_fine, NPx_coarse]
    Ppy: jax.Array | None = None  # [NPy_fine, NPy_coarse]


def _neumann_rhs_unit(space: FESpace) -> np.ndarray:
    """Outlet Neumann rhs at p_out = 1 (NSSolver.cpp:528-551), host-side.

    cell_rhs(i) -= p_out * (n . phi_i) * JxW_face over boundary-id-8 faces.
    The term is state independent, so it is precomputed once as a dense
    velocity-grid array (sign convention: this is the *rhs contribution*,
    i.e. already negated).
    """
    t = space.tables
    geo = space.geo
    k = t.deg_v
    NVy, NVx = space.NVy, space.NVx
    out = np.zeros((2, NVy, NVx))
    face_h = [geo.hy, geo.hy, geo.hx, geo.hx]  # face lengths (W, E, S, N)
    for f in range(4):
        sel = geo.face_id[f] == BOUNDARY_OUTLET
        if not sel.any():
            continue
        n = t.normals[f]
        # local contribution: loc[m, c] = -sum_qf w_qf * h_face * n_c * phi_m
        loc = -np.einsum("q,qm->m", t.w_qf * face_h[f], t.phi_v_face[f])
        iy, ix = np.nonzero(sel)
        n1 = k + 1
        for m in range(n1 * n1):
            a, b = divmod(m, n1)
            for c in range(2):
                if n[c] == 0.0:
                    continue
                np.add.at(out[c], (k * iy + a, k * ix + b), loc[m] * n[c])
    return out


def _forcing_rhs(space: FESpace, forcing) -> np.ndarray:
    """(f, v) projected onto the velocity test functions, host-side."""
    t = space.tables
    geo = space.geo
    k = t.deg_v
    out = np.zeros((2, space.NVy, space.NVx))
    w = t.w_q * geo.hx * geo.hy
    cx, cy = geo.cell_centers()
    x0s = cx - 0.5 * geo.hx
    y0s = cy - 0.5 * geo.hy
    qx = np.tile(t.q1d, t.n_q1d)
    qy = np.repeat(t.q1d, t.n_q1d)
    iy, ix = np.nonzero(geo.cell_active)
    # physical quadrature points per active cell
    X = x0s[ix][:, None] + qx[None, :] * geo.hx  # [n_cells, n_q]
    Y = y0s[iy][:, None] + qy[None, :] * geo.hy
    fx, fy = forcing(X, Y)  # broadcastable arrays [n_cells, n_q]
    loc_x = np.einsum("q,qm,cq->cm", w, t.phi_v, np.broadcast_to(fx, X.shape))
    loc_y = np.einsum("q,qm,cq->cm", w, t.phi_v, np.broadcast_to(fy, X.shape))
    n1 = k + 1
    for m in range(n1 * n1):
        a, b = divmod(m, n1)
        np.add.at(out[0], (k * iy + a, k * ix + b), loc_x[:, m])
        np.add.at(out[1], (k * iy + a, k * ix + b), loc_y[:, m])
    return out


def make_disc(space: FESpace, dtype=None, forcing=None) -> Disc:
    """Lower a host FESpace to device-side discretization data.

    ``forcing``: optional callable ``f(x, y) -> (fx, fy)`` (vectorized over
    arrays); its weak-form projection is added to every velocity rhs.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    geo = space.geo
    t = space.tables
    return Disc(
        nx=geo.nx,
        ny=geo.ny,
        deg_v=t.deg_v,
        deg_p=t.deg_p,
        n_q1d=t.n_q1d,
        hx=geo.hx,
        hy=geo.hy,
        cell_mask=jnp.asarray(geo.cell_active, dtype=dtype),
        u_active=jnp.asarray(space.u_active),
        p_active=jnp.asarray(space.p_active),
        u_dirichlet=jnp.asarray(space.u_dirichlet),
        u_inlet=jnp.asarray(space.u_inlet),
        inlet_profile1=jnp.asarray(space.inlet_profile(1.0), dtype=dtype),
        neumann_rhs1=jnp.asarray(_neumann_rhs_unit(space), dtype=dtype),
        cyl_face_mask=jnp.asarray(
            geo.face_id == BOUNDARY_CYLINDER, dtype=dtype
        ),
        forcing_rhs=(
            None
            if forcing is None
            else jnp.asarray(_forcing_rhs(space, forcing), dtype=dtype)
        ),
    )

"""P2 -> P1 p-multigrid for the simplex velocity block.

The structured backend's ILU/AMG equivalence layer is an h-multigrid
(precond/mg.py); on an unstructured triangulation the natural TPU-native
coarse space is the *order-reduced* P1 space on the same triangles
(p-coarsening -- the first leg of standard p-MG, Fischer/Pazner LOR
family, PAPERS.md item 1):

  * prolongation = nodal P1 evaluation at P2 nodes: identity on vertices,
    edge-midpoint values are the mean of the edge's endpoint values
    (exact on P1 -- no quadrature, two gathers);
  * restriction = its transpose (a ``segment_sum`` over edges);
  * coarse operator = the same weak form rediscretized with the P1 basis
    on the same triangles (tables ``phi_p``/``dphi_p``), including the
    linearized convection evaluated from the vertex-restricted state;
  * smoothing = fixed-step Jacobi-preconditioned GMRES
    (``precond.mg._gmres_smooth`` -- the nonsymmetric-safe smoother);
  * coarse solve = Jacobi-preconditioned GMRES to a loose tolerance.

Two levels suffice as an inner-solve preconditioner: the P1 system has
~1/4 the velocity DoFs, and the reference meshes for ``-M`` are small
(60x40); deeper h-coarsening of an unstructured mesh needs aggregation
machinery that is not warranted at this size.

Reference behavior tied: NSSolverStationary.hpp:225-231 (AMG on the
velocity block) / NSSolver.hpp:183-189 (ILU) -- the inner-solve
preconditioner role.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.krylov import gmres
from navier_stokes_solver_tpu.ops.matfree import LinearizationQ
from navier_stokes_solver_tpu.precond.mg import _gmres_smooth
from navier_stokes_solver_tpu.unstructured import ops as sops
from navier_stokes_solver_tpu.unstructured.tri import SimplexDisc

__all__ = ["make_p_vcycle"]


def _tab(disc, name):
    return jnp.asarray(getattr(disc.tables, name), disc.dtype)


def _n_verts(disc: SimplexDisc) -> int:
    return disc.n_nodes_p  # P1 velocity nodes = pressure nodes = vertices


def prolong(disc: SimplexDisc, xc: jax.Array) -> jax.Array:
    """[2, n_verts] P1 nodal -> [2, n_nodes_v] P2 nodal (exact on P1).

    Gather-only through the local ``pmg_*`` tables, so the same code runs
    on the global disc and inside a strip-decomposed tile (pointwise --
    seam copies stay consistent without exchange)."""
    pad = jnp.pad(xc, ((0, 0), (0, 1)))
    vert = pad[:, disc.pmg_vert]
    mid = 0.5 * (pad[:, disc.pmg_edge[:, 0]] + pad[:, disc.pmg_edge[:, 1]])
    return jnp.where(disc.pmg_vert < disc.n_nodes_p, vert, mid)


def restrict(disc: SimplexDisc, rf: jax.Array) -> jax.Array:
    """Transpose of ``prolong``: [2, n_nodes_v] -> [2, n_verts].

    Under strip decomposition the per-edge contributions are weighted by
    1/multiplicity of the midpoint copy (an edge shared by two tiles is
    summed by both) and completed with the pressure-space seam exchange;
    the identity (vertex) part is pointwise on a seam-consistent input
    and needs neither."""
    mid = 0.5 * rf
    if disc.seam_v is not None:
        mid = mid * disc.seam_v.weight
    pad = jnp.pad(mid, ((0, 0), (0, 1)))
    add = pad[:, disc.pmg_mid].sum(axis=-1)
    if disc.seam_p is not None:
        add = sops._seam_sum(disc, disc.seam_p, add)
    ident = jnp.pad(rf, ((0, 0), (0, 1)))[:, disc.pmg_vert_v]
    return ident + add


def _eval_v1(disc: SimplexDisc, u: jax.Array):
    """P1 velocity values/gradients at volume q-points ([2, n_verts] in)."""
    loc = u[:, disc.dofs_p]  # [2, T, 3]
    phi = _tab(disc, "phi_p")
    dphi = _tab(disc, "dphi_p")
    vals = jnp.einsum("qm,ctm->qct", phi, loc)
    gref = jnp.einsum("qmd,ctm->qctd", dphi, loc)
    gphys = jnp.einsum("qctd,tdk->qckt", gref, disc.invJ)
    return vals, gphys


def _scatter_v1(disc: SimplexDisc, loc: jax.Array) -> jax.Array:
    flat = loc.reshape(2, -1)
    if disc.gather_p is not None:
        y = jnp.pad(flat, ((0, 0), (0, 1)))[:, disc.gather_p].sum(axis=-1)
    else:
        idx = disc.dofs_p.reshape(-1)
        y = jax.vmap(
            lambda row: jax.ops.segment_sum(
                row, idx, num_segments=_n_verts(disc)
            )
        )(flat)
    if disc.seam_p is not None:
        y = sops._seam_sum(disc, disc.seam_p, y)
    return y


def apply_F1(disc, nu, inv_dt, linq1, x, *, stokes, bc_diag):
    """P1 rediscretization of the velocity block (same weak form as
    unstructured.ops.apply_F, P1 basis)."""
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]
    xv, xg = _eval_v1(disc, x)
    dphi = _tab(disc, "dphi_p")
    gphi = jnp.einsum("qmd,tdk->qmkt", dphi, disc.invJ)
    loc = jnp.einsum("qmkt,qckt,qt->ctm", gphi, nu * xg, wdet)
    if not stokes:
        conv = jnp.einsum("qlt,qclt->qct", linq1.u, xg) + jnp.einsum(
            "qlt,qclt->qct", xv, linq1.gradu
        )
        phi = _tab(disc, "phi_p")
        loc = loc + jnp.einsum(
            "qm,qct,qt->ctm", phi, conv + inv_dt * xv, wdet
        )
    y = _scatter_v1(disc, loc)
    dir1 = jnp.pad(disc.u_dirichlet, (0, 1))[disc.pmg_vert_v]
    return jnp.where(dir1, bc_diag * x, y)


def diag_F1(disc, nu, inv_dt, linq1, *, stokes):
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]
    phi = _tab(disc, "phi_p")
    dphi = _tab(disc, "dphi_p")
    gphi = jnp.einsum("qmd,tdk->qmkt", dphi, disc.invJ)
    visc = jnp.einsum("qmkt,qmkt,qt->tm", gphi, gphi, nu * wdet)
    loc = visc[None].repeat(2, axis=0)
    if not stokes:
        mass = jnp.einsum("qm,qm,qt->tm", phi, phi, wdet) * inv_dt
        conv1 = jnp.einsum("qm,qmkt,qkt,qt->tm", phi, gphi, linq1.u, wdet)
        loc = loc + (mass + conv1)[None]
        phi2 = phi * phi
        conv2 = jnp.stack(
            [
                jnp.einsum("qm,qt,qt->tm", phi2, linq1.gradu[:, 0, 0], wdet),
                jnp.einsum("qm,qt,qt->tm", phi2, linq1.gradu[:, 1, 1], wdet),
            ]
        )
        loc = loc + conv2
    d = _scatter_v1(disc, loc)
    return jnp.where(d == 0.0, 1.0, d)


def make_p_vcycle(
    disc: SimplexDisc,
    nu,
    inv_dt,
    state_u,
    *,
    stokes: bool,
    diag_f: jax.Array,
    smooth_degree: int = 3,
    coarse_iters: int = 60,
    coarse_rtol: float = 5e-2,
    dtype=None,
):
    """Build ``M(b) -> x``: one two-level V cycle for the P2 velocity
    block (fine GMRES-smoothing, P1 coarse correction).

    ``diag_f``: the (post-BC) fine-level diagonal, reused from the
    caller's linearization.  ``dtype``: compute precision of the cycle
    (the caller's mixed-precision cast already lands everything in f32
    when used through ``LinearContext.smoother_F``).
    """
    out_dtype = disc.dtype
    if dtype is not None and dtype != disc.dtype:
        cast = lambda a: (
            a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
        )
        disc = jax.tree_util.tree_map(cast, disc)
        diag_f = diag_f.astype(dtype)
        if state_u is not None:
            state_u = state_u.astype(dtype)
        nu = jnp.asarray(nu, dtype)
        inv_dt = jnp.asarray(inv_dt, dtype)

    dir_fine = disc.u_dirichlet
    # vertex gathers through pmg_vert_v (NOT [:n_nodes_p]: tile-local
    # numbering under strip decomposition is padded, vertices are only
    # *mostly* the leading slots)
    dir_coarse = jnp.pad(dir_fine, (0, 1))[disc.pmg_vert_v]

    if stokes or state_u is None:
        linq = linq1 = None
    else:
        vals, grads = sops._eval_v(disc, state_u)
        linq = LinearizationQ(u=vals, gradu=grads, p=None)
        # vertex-injected coarse state
        u1 = jnp.pad(state_u, ((0, 0), (0, 1)))[:, disc.pmg_vert_v]
        v1, g1 = _eval_v1(disc, u1)
        linq1 = LinearizationQ(u=v1, gradu=g1, p=None)

    def A(x):
        return sops.apply_F(
            disc, nu, inv_dt, linq, x, stokes=stokes, bc_diag=diag_f
        )

    d1 = diag_F1(disc, nu, inv_dt, linq1, stokes=stokes)

    def A1(x):
        return apply_F1(
            disc, nu, inv_dt, linq1, x, stokes=stokes, bc_diag=d1
        )

    dinv = 1.0 / diag_f
    dinv1 = 1.0 / d1
    # seam-weighted + psum'd under strip decomposition (plain vdot
    # single-tile); shape dispatch inside make_dot picks the u/p weights
    dot = sops.make_dot(disc)

    def M(b):
        b = b.astype(disc.dtype)
        x = _gmres_smooth(A, dinv, b, jnp.zeros_like(b), smooth_degree,
                          dot=dot)
        r = jnp.where(dir_fine, 0.0, b - A(x))
        rc = jnp.where(dir_coarse, 0.0, restrict(disc, r))
        xc, _ = gmres(
            A1,
            rc,
            jnp.zeros_like(rc),
            tol=coarse_rtol * jnp.sqrt(dot(rc, rc)),
            maxiter=coarse_iters,
            M=lambda v: dinv1 * v,
            basis=coarse_iters,
            dot=dot,
        )
        x = x + jnp.where(dir_fine, 0.0, prolong(disc, xc))
        x = _gmres_smooth(A, dinv, b, x, smooth_degree, dot=dot)
        return x.astype(out_dtype)

    return M

"""Matrix-free P2/P1 operators on unstructured triangle meshes.

Mirrors ``ops.matfree`` (same weak form, NSSolver.cpp:313-599 /
NSSolverStationary.cpp:317-577, and the same Dirichlet row-elimination
semantics) for the ``-M`` simplex path: gather per-element DoFs with
``jnp.take``, contract against the P2/P1 tables (batched over elements),
and scatter-add with ``jax.ops.segment_sum``.  Per-element affine maps
(``invJ``, ``detJ``) replace the congruent-cell scalings of the structured
backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.ops.matfree import LinearizationQ
from navier_stokes_solver_tpu.unstructured.tri import SimplexDisc

__all__ = [
    "eval_state",
    "apply_F",
    "apply_B",
    "apply_Bt",
    "apply_Mp",
    "apply_Mp_raw",
    "apply_Lp",
    "apply_Fp",
    "diag_Lp",
    "apply_jacobian",
    "residual",
    "diag_F",
    "diag_Mp",
    "lift_drag_forces",
    "dirichlet_values",
    "make_dot",
]


def _tab(disc: SimplexDisc, name: str):
    return jnp.asarray(getattr(disc.tables, name), disc.dtype)


# ---------------------------------------------------------------------------
# Evaluation / projection
# ---------------------------------------------------------------------------


def _eval_v(disc: SimplexDisc, u: jax.Array):
    """[2, Nv] -> values [n_q, 2, T], physical gradients [n_q, 2, 2, T]."""
    loc = u[:, disc.dofs_v]  # [2, T, 6]
    phi = _tab(disc, "phi_v")  # [n_q, 6]
    dphi = _tab(disc, "dphi_v")  # [n_q, 6, 2]
    vals = jnp.einsum("qm,ctm->qct", phi, loc)
    gref = jnp.einsum("qmd,ctm->qctd", dphi, loc)  # d/dxi
    gphys = jnp.einsum("qctd,tdk->qckt", gref, disc.invJ)
    return vals, gphys  # gphys: [n_q, comp, dim, T]


def _eval_p(disc: SimplexDisc, p: jax.Array):
    loc = p[disc.dofs_p]  # [T, 3]
    return jnp.einsum("qn,tn->qt", _tab(disc, "phi_p"), loc)


def _seam_sum(disc: SimplexDisc, seam, v: jax.Array) -> jax.Array:
    """Complete seam partial sums across strip tiles (``[..., n_loc]``).

    The simplex analog of the structured lattice's ``ppermute`` seam
    exchange (dist/halo.py; Trilinos ``compress(VectorOperation::add)``,
    NSSolver.cpp:560-562): each tile sends its partial sums at
    shared-with-neighbor nodes both ways around the ring and adds what it
    receives.  Strip ends exchange all-sentinel (zero) buffers with the
    wraparound partner, so the ring is exact without special-casing.
    """
    n = disc.halo_n
    pad_v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, 1)])
    buf_r = pad_v[..., seam.send_r]  # for my right neighbor
    buf_l = pad_v[..., seam.send_l]  # for my left neighbor
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_l = jax.lax.ppermute(buf_r, disc.halo_axis, fwd)
    from_r = jax.lax.ppermute(buf_l, disc.halo_axis, bwd)
    from_l = jnp.pad(from_l, [(0, 0)] * (v.ndim - 1) + [(0, 1)])
    from_r = jnp.pad(from_r, [(0, 0)] * (v.ndim - 1) + [(0, 1)])
    return v + from_l[..., seam.add_l] + from_r[..., seam.add_r]


def _scatter_v(disc: SimplexDisc, loc: jax.Array) -> jax.Array:
    """[2, T, 6] element contributions -> [2, Nv].

    Hot path is a padded gather + sum over the precomputed scatter
    inverse (``SimplexDisc.gather_v``) -- no scatter/sort HLO reaches
    the TPU program.  ``segment_sum`` remains as the fallback for discs
    built before the tables existed.  Under strip decomposition the
    tile-local sums are completed by the seam exchange.
    """
    flat = loc.reshape(2, -1)
    if disc.gather_v is not None:
        pad = jnp.pad(flat, ((0, 0), (0, 1)))
        y = pad[:, disc.gather_v].sum(axis=-1)
    else:
        idx = disc.dofs_v.reshape(-1)
        y = jax.vmap(
            lambda row: jax.ops.segment_sum(
                row, idx, num_segments=disc.n_nodes_v
            )
        )(flat)
    if disc.seam_v is not None:
        y = _seam_sum(disc, disc.seam_v, y)
    return y


def _scatter_p(disc: SimplexDisc, loc: jax.Array) -> jax.Array:
    """[T, 3] -> [Np] (padded-gather hot path, as ``_scatter_v``)."""
    flat = loc.reshape(-1)
    if disc.gather_p is not None:
        pad = jnp.pad(flat, (0, 1))
        y = pad[disc.gather_p].sum(axis=-1)
    else:
        y = jax.ops.segment_sum(
            flat, disc.dofs_p.reshape(-1), num_segments=disc.n_nodes_p
        )
    if disc.seam_p is not None:
        y = _seam_sum(disc, disc.seam_p, y)
    return y


def make_dot(disc: SimplexDisc):
    """Inner product over (u, p) pytrees: plain ``vdot`` single-tile,
    seam-weighted local sum + ``psum`` under strip decomposition (the
    Trilinos owned-DoF dot-product allreduce analog, SURVEY.md section 5)."""
    if disc.seam_v is None:
        from navier_stokes_solver_tpu.krylov.solvers import tvdot

        return tvdot

    wv = disc.seam_v.weight
    wp = disc.seam_p.weight

    def dot(x, y):
        s = jnp.zeros((), disc.dtype)
        for a, b in zip(
            jax.tree_util.tree_leaves(x), jax.tree_util.tree_leaves(y)
        ):
            w = wv if a.shape[-1] == wv.shape[-1] else wp
            s = s + jnp.sum(a * b * w)
        return jax.lax.psum(s, disc.halo_axis)

    return dot


def _project_v(disc: SimplexDisc, f_val, f_grad) -> jax.Array:
    """loc[c,t,m] = sum_q w_q detJ_t (f_val[q,c,t] phi_m + f_grad[q,c,:,t]
    . grad phi_m), scattered to [2, Nv]."""
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]  # [n_q, T]
    loc = None
    if f_val is not None:
        phi = _tab(disc, "phi_v")
        loc = jnp.einsum("qm,qct,qt->ctm", phi, f_val, wdet)
    if f_grad is not None:
        dphi = _tab(disc, "dphi_v")
        gphi = jnp.einsum("qmd,tdk->qmkt", dphi, disc.invJ)  # phys grads
        term = jnp.einsum("qmkt,qckt,qt->ctm", gphi, f_grad, wdet)
        loc = term if loc is None else loc + term
    return _scatter_v(disc, loc)


def _project_p(disc: SimplexDisc, f_val) -> jax.Array:
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]
    loc = jnp.einsum("qn,qt,qt->tn", _tab(disc, "phi_p"), f_val, wdet)
    return _scatter_p(disc, loc)


def eval_state(disc: SimplexDisc, st: Blocks) -> LinearizationQ:
    vals, grads = _eval_v(disc, st.u)
    return LinearizationQ(u=vals, gradu=grads, p=_eval_p(disc, st.p))


# ---------------------------------------------------------------------------
# Block operators (signatures mirror ops.matfree)
# ---------------------------------------------------------------------------


def _conv_lin(linq: LinearizationQ, xv, xg):
    return jnp.einsum("qlt,qclt->qct", linq.u, xg) + jnp.einsum(
        "qlt,qclt->qct", xv, linq.gradu
    )


def apply_F(disc, nu, inv_dt, linq, x_u, *, stokes, bc_diag=None):
    xv, xg = _eval_v(disc, x_u)
    if stokes:
        y = _project_v(disc, None, nu * xg)
    else:
        y = _project_v(disc, _conv_lin(linq, xv, xg) + inv_dt * xv, nu * xg)
    if bc_diag is not None:
        y = jnp.where(disc.u_dirichlet, bc_diag * x_u, y)
    return y


def apply_Bt(disc, x_p, *, zero_dirichlet_rows=False):
    pv = _eval_p(disc, x_p)
    eye = jnp.eye(2, dtype=disc.dtype)
    f_grad = -pv[:, None, None, :] * eye[None, :, :, None]
    y = _project_v(disc, None, f_grad)
    if zero_dirichlet_rows:
        y = jnp.where(disc.u_dirichlet, 0.0, y)
    return y


def apply_B(disc, x_u, *, stokes):
    _, xg = _eval_v(disc, x_u)
    div = xg[:, 0, 0] + xg[:, 1, 1]
    return _project_p(disc, -div if stokes else div)


def apply_Mp(disc, nu, x_p):
    return _project_p(disc, _eval_p(disc, x_p) / nu)


def _p_free(disc: SimplexDisc) -> jax.Array:
    """Pressure nodes carrying Laplacian/Fp rows: everything except the
    outlet boundary (identity/Dirichlet rows there -- the standard
    Cahouet-Chabard/PCD boundary choice, mirroring
    ``ops.matfree.p_outlet_mask``) and dd padding slots (which touch no
    element and must stay identity for the inner Krylov solves)."""
    free = ~disc.p_outlet
    if disc.seam_p is not None:
        free = free & (disc.seam_p.weight > 0)
    return free


def _grad_psi_p(disc: SimplexDisc):
    """Physical P1 gradients [n_q, 3, 2, T] and quadrature weights
    w_q * detJ [n_q, T] (zero on dd padding elements)."""
    dphi = _tab(disc, "dphi_p")  # [n_q, 3, 2] (d/dxi)
    gpsi = jnp.einsum("qnd,tdk->qnkt", dphi, disc.invJ)
    w = _tab(disc, "w_q")
    return gpsi, w[:, None] * disc.detJ[None, :]


def apply_Lp(disc: SimplexDisc, x_p: jax.Array) -> jax.Array:
    """Pressure Laplacian (grad psi_j, grad psi_i) on P1 nodes.

    The simplex-backend twin of ``ops.matfree.apply_Lp`` (see there for
    the Cahouet-Chabard rationale and the boundary-condition choice; no
    reference analog exists -- the Schur upgrade is this repo's
    h/dt-robustness lever).  Constrained rows AND columns are eliminated
    so the operator stays exactly symmetric for CG/Chebyshev."""
    free = _p_free(disc)
    loc = jnp.where(free, x_p, 0.0)[disc.dofs_p]  # [T, 3]
    gpsi, wdet = _grad_psi_p(disc)
    g = jnp.einsum("qnkt,tn->qkt", gpsi, loc)
    out = jnp.einsum("qnkt,qkt,qt->tn", gpsi, g, wdet)
    y = _scatter_p(disc, out)
    return jnp.where(free, y, x_p)


def apply_Fp(disc: SimplexDisc, nu, inv_dt, linq, x_p: jax.Array) -> jax.Array:
    """Pressure convection-diffusion operator (the PCD middle factor),
    Fp = inv_dt * Mp_raw + nu * Lp + N_p(u_k); simplex twin of
    ``ops.matfree.apply_Fp`` (semantics documented there)."""
    free = _p_free(disc)
    loc = jnp.where(free, x_p, 0.0)[disc.dofs_p]  # [T, 3]
    phi = _tab(disc, "phi_p")
    gpsi, wdet = _grad_psi_p(disc)
    pv = jnp.einsum("qn,tn->qt", phi, loc)
    g = jnp.einsum("qnkt,tn->qkt", gpsi, loc)
    out = nu * jnp.einsum("qnkt,qkt,qt->tn", gpsi, g, wdet)
    f_val = inv_dt * pv
    if linq is not None:
        f_val = f_val + jnp.einsum("qkt,qkt->qt", linq.u, g)
    out = out + jnp.einsum("qn,qt,qt->tn", phi, f_val, wdet)
    y = _scatter_p(disc, out)
    return jnp.where(free, y, x_p)


def apply_Mp_raw(disc: SimplexDisc, x_p: jax.Array) -> jax.Array:
    """Unscaled pressure mass with the PCD elimination convention
    (cf. ``ops.matfree.apply_Mp_raw``)."""
    free = _p_free(disc)
    pv = _eval_p(disc, jnp.where(free, x_p, 0.0))
    y = _project_p(disc, pv)
    return jnp.where(free, y, x_p)


def apply_jacobian(disc, nu, inv_dt, linq, bc_diag, x: Blocks, *, stokes):
    xv, xg = _eval_v(disc, x.u)
    pv = _eval_p(disc, x.p)
    eye = jnp.eye(2, dtype=disc.dtype)
    f_grad = nu * xg - pv[:, None, None, :] * eye[None, :, :, None]
    if stokes:
        yu = _project_v(disc, None, f_grad)
    else:
        yu = _project_v(disc, _conv_lin(linq, xv, xg) + inv_dt * xv, f_grad)
    div = xg[:, 0, 0] + xg[:, 1, 1]
    yp = _project_p(disc, -div if stokes else div)
    yu = jnp.where(disc.u_dirichlet, bc_diag * x.u, yu)
    return Blocks(u=yu, p=yp)


def dirichlet_values(disc, inlet_amp):
    gx = jnp.where(disc.u_inlet, inlet_amp * disc.inlet_profile1, 0.0)
    return jnp.stack([gx, jnp.zeros_like(gx)])


def residual(
    disc, nu, inv_dt, st, u_old, bc_diag, *, stokes, inlet_amp, p_out=1.0,
    consistent=False,
):
    """``consistent``: flip the Newton-regime continuity rhs to the
    Jacobian-consistent -(q, div u_k); see ops/matfree.py::residual for the
    reference sign bug (NSSolver.cpp:517-519) this corrects."""
    if stokes:
        ru = p_out * disc.neumann_rhs1
        rp = jnp.zeros((disc.n_nodes_p,), disc.dtype)
    else:
        linq = eval_state(disc, st)
        u_old_q, _ = _eval_v(disc, u_old)
        conv = jnp.einsum("qlt,qclt->qct", linq.u, linq.gradu)
        f_val = -inv_dt * (linq.u - u_old_q) - conv
        eye = jnp.eye(2, dtype=disc.dtype)
        f_grad = -nu * linq.gradu + linq.p[:, None, None, :] * eye[None, :, :, None]
        ru = _project_v(disc, f_val, f_grad) + p_out * disc.neumann_rhs1
        div = linq.gradu[:, 0, 0] + linq.gradu[:, 1, 1]
        rp = _project_p(disc, -div if consistent else div)
    g = dirichlet_values(disc, inlet_amp)
    ru = jnp.where(disc.u_dirichlet, bc_diag * g, ru)
    return Blocks(u=ru, p=rp)


# ---------------------------------------------------------------------------
# Diagonals
# ---------------------------------------------------------------------------


def diag_F(disc, nu, inv_dt, linq, *, stokes):
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]
    phi = _tab(disc, "phi_v")
    dphi = _tab(disc, "dphi_v")
    gphi = jnp.einsum("qmd,tdk->qmkt", dphi, disc.invJ)
    visc = jnp.einsum("qmkt,qmkt,qt->tm", gphi, gphi, nu * wdet)
    loc = visc[None].repeat(2, axis=0)  # [2, T, 6]
    if not stokes:
        mass = jnp.einsum("qm,qm,qt->tm", phi, phi, wdet) * inv_dt
        conv1 = jnp.einsum("qm,qmkt,qkt,qt->tm", phi, gphi, linq.u, wdet)
        loc = loc + (mass + conv1)[None]
        phi2 = phi * phi
        conv2 = jnp.stack(
            [
                jnp.einsum("qm,qt,qt->tm", phi2, linq.gradu[:, 0, 0], wdet),
                jnp.einsum("qm,qt,qt->tm", phi2, linq.gradu[:, 1, 1], wdet),
            ]
        )
        loc = loc + conv2
    d = _scatter_v(disc, loc)
    return jnp.where(d == 0.0, 1.0, d)


def diag_Lp(disc):
    """Diagonal of the pressure Laplacian (Jacobi preconditioning of the
    Cahouet-Chabard Lp leg); constrained/padding rows get 1.0."""
    gpsi, wdet = _grad_psi_p(disc)
    loc = jnp.einsum("qnkt,qnkt,qt->tn", gpsi, gpsi, wdet)
    d = _scatter_p(disc, loc)
    d = jnp.where(_p_free(disc), d, 1.0)
    return jnp.where(d == 0.0, 1.0, d)


def diag_Mp(disc, nu):
    w = _tab(disc, "w_q")
    wdet = w[:, None] * disc.detJ[None, :]
    phi = _tab(disc, "phi_p")
    loc = jnp.einsum("qn,qn,qt->tn", phi, phi, wdet) / nu
    d = _scatter_p(disc, loc)
    # padding nodes of a decomposed tile touch no element: keep their
    # (identity) rows invertible for Jacobi/CG inners
    return jnp.where(d == 0.0, 1.0, d)


# ---------------------------------------------------------------------------
# Lift / drag (edge integral over boundary id 10, NSSolver.cpp:839-938)
# ---------------------------------------------------------------------------


def lift_drag_forces(disc, nu, st: Blocks):
    if disc.cyl_tri.shape[0] == 0:
        z = jnp.zeros((), disc.dtype)
        if disc.halo_axis is not None:
            z = jax.lax.psum(z, disc.halo_axis)
        return z, z
    t = disc.tables
    phi_e = jnp.asarray(t.phi_v_edge, disc.dtype)[disc.cyl_edge]  # [E, qe, 6]
    dphi_e = jnp.asarray(t.dphi_v_edge, disc.dtype)[disc.cyl_edge]  # [E,qe,6,2]
    phip_e = jnp.asarray(t.phi_p_edge, disc.dtype)[disc.cyl_edge]  # [E, qe, 3]
    w_e = jnp.asarray(t.w_e, disc.dtype)

    u_loc = st.u[:, disc.dofs_v[disc.cyl_tri]]  # [2, E, 6]
    p_loc = st.p[disc.dofs_p[disc.cyl_tri]]  # [E, 3]
    invJ_e = disc.invJ[disc.cyl_tri]  # [E, 2, 2]

    gref = jnp.einsum("eqmd,cem->eqcd", dphi_e, u_loc)
    grad = jnp.einsum("eqcd,edk->eqck", gref, invJ_e)  # [E, qe, 2, 2]
    pv = jnp.einsum("eqn,en->eq", phip_e, p_loc)

    sig = nu * (grad + jnp.swapaxes(grad, 2, 3))
    eye = jnp.eye(2, dtype=disc.dtype)
    sig = sig - pv[:, :, None, None] * eye[None, None]
    # force[c] = -sum_e sum_q w_q * len_e * sig[c, d] n_e[d]
    force = -jnp.einsum(
        "eqcd,ed,q,e->c", sig, disc.cyl_normal, w_e, disc.cyl_len
    )
    if disc.halo_axis is not None:
        force = jax.lax.psum(force, disc.halo_axis)
    return force[0], force[1]

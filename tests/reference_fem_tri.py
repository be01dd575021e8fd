"""Independent dense P2/P1 triangle assembly used as the simplex oracle.

Mirrors the reference's per-cell assembly loops (NSSolver.cpp:313-599) for
the ``-M`` simplex path: explicit Python loops over elements, quadrature
points and (i, j) dof pairs into a dense global matrix.  Shares only the
element tables with the production code (``unstructured.elements``); the
contraction path (loops + dense numpy vs gather/einsum/segment_sum) is
completely different, which makes it a meaningful oracle on tiny meshes.
"""

from __future__ import annotations

import numpy as np

from navier_stokes_solver_tpu.unstructured.elements import make_simplex_tables


class DenseTriNS:
    def __init__(self, disc):
        """``disc``: a SimplexDisc (host arrays are pulled out of it)."""
        self.t = make_simplex_tables()
        self.dofs_v = np.asarray(disc.dofs_v)
        self.dofs_p = np.asarray(disc.dofs_p)
        self.invJ = np.asarray(disc.invJ)
        self.detJ = np.asarray(disc.detJ)
        self.n_v_nodes = disc.n_nodes_v
        self.n_p_nodes = disc.n_nodes_p
        self.u_dirichlet = np.asarray(disc.u_dirichlet)
        self.n_u = 2 * self.n_v_nodes
        self.n = self.n_u + self.n_p_nodes

    def uid(self, c, node):
        return c * self.n_v_nodes + node

    def pid(self, node):
        return self.n_u + node

    def flat(self, u, p):
        return np.concatenate([np.asarray(u).ravel(), np.asarray(p).ravel()])

    def assemble_jacobian(self, uk, nu, inv_dt, *, stokes):
        """Dense Jacobian with the reference's regime split and Dirichlet
        row replacement (kept diagonal)."""
        t = self.t
        A = np.zeros((self.n, self.n))
        uk = np.asarray(uk)
        for e in range(self.dofs_v.shape[0]):
            vdofs = self.dofs_v[e]
            pdofs = self.dofs_p[e]
            iJ = self.invJ[e]
            for q in range(len(t.w_q)):
                w = t.w_q[q] * self.detJ[e]
                phi = t.phi_v[q]  # [6]
                gphi = t.dphi_v[q] @ iJ  # [6, 2] physical
                psi = t.phi_p[q]  # [3]
                if not stokes:
                    u_q = np.zeros(2)
                    gu_q = np.zeros((2, 2))
                    for m in range(6):
                        for c in range(2):
                            u_q[c] += uk[c, vdofs[m]] * phi[m]
                            gu_q[c] += uk[c, vdofs[m]] * gphi[m]
                for i in range(6):
                    for j in range(6):
                        visc = nu * (gphi[i] @ gphi[j])
                        for c in range(2):
                            ii = self.uid(c, vdofs[i])
                            jj = self.uid(c, vdofs[j])
                            A[ii, jj] += w * visc
                        if not stokes:
                            mass = inv_dt * phi[i] * phi[j]
                            conv1 = phi[i] * (u_q @ gphi[j])
                            for c in range(2):
                                ii = self.uid(c, vdofs[i])
                                A[ii, self.uid(c, vdofs[j])] += w * (
                                    mass + conv1
                                )
                                for cp in range(2):
                                    A[ii, self.uid(cp, vdofs[j])] += (
                                        w * phi[i] * phi[j] * gu_q[c, cp]
                                    )
                    # pressure coupling: -(div v, dp)
                    for jp in range(3):
                        for c in range(2):
                            A[self.uid(c, vdofs[i]), self.pid(pdofs[jp])] -= (
                                w * gphi[i][c] * psi[jp]
                            )
                    # continuity: -(div du, q) Stokes, +(div du, q) Newton
                    sgn = -1.0 if stokes else 1.0
                    for ip in range(3):
                        for c in range(2):
                            A[self.pid(pdofs[ip]), self.uid(c, vdofs[i])] += (
                                sgn * w * psi[ip] * gphi[i][c]
                            )
        # Dirichlet rows: keep diagonal, zero the rest (eliminate_columns=false)
        for node in np.nonzero(self.u_dirichlet)[0]:
            for c in range(2):
                i = self.uid(c, node)
                d = A[i, i]
                A[i, :] = 0.0
                A[i, i] = d
        return A

    def assemble_fp(self, p_free, nu, inv_dt, uk=None):
        """Dense pressure convection-diffusion Fp = Mp/dt + nu Lp + N_p(uk)
        with symmetric identity elimination on ~p_free rows/cols (the
        Cahouet-Chabard / PCD Schur-leg operators; Lp = assemble_fp(free,
        nu=1, inv_dt=0)).  ``uk``: nodal velocity [2, n_v_nodes] or None."""
        t = self.t
        n = self.n_p_nodes
        A = np.zeros((n, n))
        uk = None if uk is None else np.asarray(uk)
        for e in range(self.dofs_p.shape[0]):
            vdofs = self.dofs_v[e]
            pdofs = self.dofs_p[e]
            iJ = self.invJ[e]
            for q in range(len(t.w_q)):
                w = t.w_q[q] * self.detJ[e]
                psi = t.phi_p[q]  # [3]
                gpsi = t.dphi_p[q] @ iJ  # [3, 2] physical
                u_q = np.zeros(2)
                if uk is not None:
                    phi = t.phi_v[q]
                    for m in range(6):
                        for c in range(2):
                            u_q[c] += uk[c, vdofs[m]] * phi[m]
                for i in range(3):
                    for j in range(3):
                        val = nu * (gpsi[i] @ gpsi[j])
                        val += inv_dt * psi[i] * psi[j]
                        if uk is not None:
                            val += psi[i] * (u_q @ gpsi[j])
                        A[pdofs[i], pdofs[j]] += w * val
        for node in np.nonzero(~np.asarray(p_free))[0]:
            A[node, :] = 0.0
            A[:, node] = 0.0
            A[node, node] = 1.0
        return A

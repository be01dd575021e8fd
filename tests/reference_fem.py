"""Independent dense FEM assembly used as the test oracle.

This mirrors the *structure* of the reference's assembly loops
(NSSolver.cpp:313-599): explicit per-cell loops over quadrature points and
(i, j) dof pairs, a global dof map, and a dense global matrix.  It shares
only the element tables with the production code; the contraction path is
completely different (Python loops + dense numpy vs stride-slice einsum +
dilated-pad scatter), which makes it a meaningful oracle on tiny grids.

Global dof layout matches the production lattice layout so vectors can be
compared directly:
  u dof (c, gy, gx) -> c * NVy * NVx + gy * NVx + gx
  p dof (gy, gx)    -> 2 * NVy * NVx + gy * NPx + gx
"""

from __future__ import annotations

import numpy as np

from navier_stokes_solver_tpu.geometry.channel import (
    BOUNDARY_CYLINDER,
    BOUNDARY_OUTLET,
)
from navier_stokes_solver_tpu.geometry.space import FESpace


class DenseNS:
    def __init__(self, space: FESpace):
        self.space = space
        self.geo = space.geo
        self.t = space.tables
        self.NVy, self.NVx = space.NVy, space.NVx
        self.NPy, self.NPx = space.NPy, space.NPx
        self.n_u = 2 * self.NVy * self.NVx
        self.n = self.n_u + self.NPy * self.NPx

        t = self.t
        geo = self.geo
        self.JxW = t.w_q * geo.hx * geo.hy
        self.dphi_v = t.dphi_v.copy()
        self.dphi_v[:, :, 0] /= geo.hx
        self.dphi_v[:, :, 1] /= geo.hy

    # -- dof maps ---------------------------------------------------------
    def uid(self, c, gy, gx):
        return (c * self.NVy + gy) * self.NVx + gx

    def pid(self, gy, gx):
        return self.n_u + gy * self.NPx + gx

    def cell_u_nodes(self, iy, ix):
        k = self.t.deg_v
        return [(k * iy + a, k * ix + b) for a in range(k + 1) for b in range(k + 1)]

    def cell_p_nodes(self, iy, ix):
        k = self.t.deg_p
        return [(k * iy + a, k * ix + b) for a in range(k + 1) for b in range(k + 1)]

    def blocks_to_flat(self, u, p):
        return np.concatenate([np.asarray(u).ravel(), np.asarray(p).ravel()])

    def flat_to_blocks(self, x):
        u = x[: self.n_u].reshape(2, self.NVy, self.NVx)
        p = x[self.n_u :].reshape(self.NPy, self.NPx)
        return u, p

    # -- assembly ---------------------------------------------------------
    def assemble(self, uk, pk, u_old, nu, inv_dt, stokes, inlet_amp, p_out=1.0):
        """Returns (A, rhs, Mp, diag_kept) post boundary conditions."""
        t = self.t
        geo = self.geo
        n_v, n_p, n_q = t.n_v, t.n_p, t.n_q
        A = np.zeros((self.n, self.n))
        rhs = np.zeros(self.n)
        Mp = np.zeros((self.n, self.n))

        for iy in range(geo.ny):
            for ix in range(geo.nx):
                if not geo.cell_active[iy, ix]:
                    continue
                un = self.cell_u_nodes(iy, ix)
                pn = self.cell_p_nodes(iy, ix)
                # local state at q points
                ukl = np.array([[uk[c][g] for c in range(2)] for g in un])  # [m,2]
                uol = np.array([[u_old[c][g] for c in range(2)] for g in un])
                pkl = np.array([pk[g] for g in pn])
                u_q = np.einsum("qm,mc->qc", t.phi_v, ukl)
                uo_q = np.einsum("qm,mc->qc", t.phi_v, uol)
                gu_q = np.einsum("qmd,mc->qcd", self.dphi_v, ukl)
                p_q = t.phi_p @ pkl

                # dof list: velocity (m, c) then pressure n
                dofs = [("u", m, c) for m in range(n_v) for c in range(2)] + [
                    ("p", m, None) for m in range(n_p)
                ]
                gids = []
                for kind, m, c in dofs:
                    if kind == "u":
                        gids.append(self.uid(c, *un[m]))
                    else:
                        gids.append(self.pid(*pn[m]))

                nd = len(dofs)
                cm = np.zeros((nd, nd))
                cpm = np.zeros((nd, nd))
                cr = np.zeros(nd)
                for q in range(n_q):
                    jw = self.JxW[q]
                    for i, (ki, mi, ci) in enumerate(dofs):
                        for j, (kj, mj, cj) in enumerate(dofs):
                            if ki == "u" and kj == "u":
                                if stokes:
                                    if ci == cj:
                                        cm[i, j] += (
                                            nu
                                            * np.dot(
                                                self.dphi_v[q, mi], self.dphi_v[q, mj]
                                            )
                                            * jw
                                        )
                                else:
                                    conv = t.phi_v[q, mi] * (
                                        (ci == cj)
                                        * np.dot(u_q[q], self.dphi_v[q, mj])
                                        + t.phi_v[q, mj] * gu_q[q, ci, cj]
                                    )
                                    cm[i, j] += conv * jw
                                    if ci == cj:
                                        cm[i, j] += (
                                            t.phi_v[q, mj]
                                            * t.phi_v[q, mi]
                                            * inv_dt
                                            * jw
                                        )
                                        cm[i, j] += (
                                            nu
                                            * np.dot(
                                                self.dphi_v[q, mj], self.dphi_v[q, mi]
                                            )
                                            * jw
                                        )
                            elif ki == "u" and kj == "p":
                                cm[i, j] -= (
                                    self.dphi_v[q, mi, ci] * t.phi_p[q, mj] * jw
                                )
                            elif ki == "p" and kj == "u":
                                s = -1.0 if stokes else 1.0
                                cm[i, j] += (
                                    s * t.phi_p[q, mi] * self.dphi_v[q, mj, cj] * jw
                                )
                            else:  # p-p: only in the separate pressure mass
                                cpm[i, j] += (
                                    t.phi_p[q, mi] * t.phi_p[q, mj] / nu * jw
                                )
                        if stokes:
                            continue
                        if ki == "u":
                            cr[i] -= (u_q[q, ci] - uo_q[q, ci]) * t.phi_v[q, mi] * inv_dt * jw
                            cr[i] -= nu * np.dot(gu_q[q, ci], self.dphi_v[q, mi]) * jw
                            cr[i] -= (
                                np.dot(u_q[q], gu_q[q, ci]) * t.phi_v[q, mi] * jw
                            )
                            cr[i] += p_q[q] * self.dphi_v[q, mi, ci] * jw
                        else:
                            div = gu_q[q, 0, 0] + gu_q[q, 1, 1]
                            cr[i] += div * t.phi_p[q, mi] * jw

                # outlet Neumann faces (id 8), both regimes
                face_h = [geo.hy, geo.hy, geo.hx, geo.hx]
                for f in range(4):
                    if geo.face_id[f, iy, ix] != BOUNDARY_OUTLET:
                        continue
                    nvec = t.normals[f]
                    for qf in range(t.n_qf):
                        jwf = t.w_qf[qf] * face_h[f]
                        for i, (ki, mi, ci) in enumerate(dofs):
                            if ki == "u":
                                cr[i] -= (
                                    p_out * nvec[ci] * t.phi_v_face[f, qf, mi] * jwf
                                )

                for i in range(nd):
                    rhs[gids[i]] += cr[i]
                    for j in range(nd):
                        A[gids[i], gids[j]] += cm[i, j]
                        Mp[gids[i], gids[j]] += cpm[i, j]

        # ---- Dirichlet rows (apply_boundary_values, eliminate_columns=false)
        sp = self.space
        diag_kept = np.ones(self.n)
        g = np.zeros(self.n)
        prof = sp.inlet_profile(1.0) * inlet_amp
        for gy in range(self.NVy):
            for gx in range(self.NVx):
                if not sp.u_active[gy, gx]:
                    for c in range(2):
                        i = self.uid(c, gy, gx)
                        A[i, :] = 0.0
                        A[i, i] = 1.0
                        rhs[i] = 0.0
                    continue
                if sp.u_dirichlet[gy, gx]:
                    gval = [prof[gy] if sp.u_inlet[gy, gx] else 0.0, 0.0]
                    for c in range(2):
                        i = self.uid(c, gy, gx)
                        d = A[i, i]
                        diag_kept[i] = d
                        g[i] = gval[c]
                        A[i, :] = 0.0
                        A[i, i] = d
                        rhs[i] = d * gval[c]
        for gy in range(self.NPy):
            for gx in range(self.NPx):
                if not sp.p_active[gy, gx]:
                    i = self.pid(gy, gx)
                    A[i, :] = 0.0
                    A[i, i] = 1.0
                    rhs[i] = 0.0
                    Mp[i, i] = 1.0

        return A, rhs, Mp, diag_kept

    # -- lift/drag oracle (NSSolver.cpp:839-938) ---------------------------
    def lift_drag(self, u, p, nu):
        t = self.t
        geo = self.geo
        drag = 0.0
        lift = 0.0
        dphi_f = t.dphi_v_face.copy()
        dphi_f[:, :, :, 0] /= geo.hx
        dphi_f[:, :, :, 1] /= geo.hy
        face_h = [geo.hy, geo.hy, geo.hx, geo.hx]
        for iy in range(geo.ny):
            for ix in range(geo.nx):
                if not geo.cell_active[iy, ix]:
                    continue
                for f in range(4):
                    if geo.face_id[f, iy, ix] != BOUNDARY_CYLINDER:
                        continue
                    un = self.cell_u_nodes(iy, ix)
                    pn = self.cell_p_nodes(iy, ix)
                    ul = np.array([[u[c][gg] for c in range(2)] for gg in un])
                    pl = np.array([p[gg] for gg in pn])
                    nvec = t.normals[f]
                    for qf in range(t.n_qf):
                        grad = np.einsum("md,mc->cd", dphi_f[f, qf], ul)
                        pv = t.phi_p_face[f, qf] @ pl
                        sig = nu * (grad + grad.T) - pv * np.eye(2)
                        jwf = t.w_qf[qf] * face_h[f]
                        force = -sig @ nvec * jwf
                        drag += force[0]
                        lift += force[1]
        return drag, lift

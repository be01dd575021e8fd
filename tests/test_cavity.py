"""Lid-driven cavity extension: geometry tagging + Ghia et al. fidelity.

The reference solves only the channel; BASELINE.json's fidelity gate also
names the lid-driven cavity.  The authoritative published data for it is
Ghia, Ghia & Shin, "High-Re solutions for incompressible flow using the
Navier-Stokes equations and a multigrid method", J. Comput. Phys. 48
(1982) 387-411: centerline velocity profiles at Re = 100 on a 129x129
stream-function/vorticity grid (Tables I-II).  We solve the primitive
-variable Q2/Q1 system at exactly nu = 1/100 (``solve_direct``) and demand
pointwise agreement within 2.5e-2 -- the discretization gap between a
32x32 Q2 lattice (65^2 velocity nodes) and Ghia's 129^2 FDM grid.
"""

import numpy as np
import pytest

from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
from navier_stokes_solver_tpu.geometry import (
    BOUNDARY_INLET,
    BOUNDARY_OUTLET,
    BOUNDARY_WALL,
    INTERIOR,
    make_cavity_geometry,
    make_fe_space,
)

# Ghia et al. (1982), Table I: u_x along the vertical centerline x = 0.5,
# Re = 100 (y, u).
GHIA_U = np.array(
    [
        (1.0000, 1.00000),
        (0.9766, 0.84123),
        (0.9688, 0.78871),
        (0.9609, 0.73722),
        (0.9531, 0.68717),
        (0.8516, 0.23151),
        (0.7344, 0.00332),
        (0.6172, -0.13641),
        (0.5000, -0.20581),
        (0.4531, -0.21090),
        (0.2813, -0.15662),
        (0.1719, -0.10150),
        (0.1016, -0.06434),
        (0.0703, -0.04775),
        (0.0625, -0.04192),
        (0.0547, -0.03717),
        (0.0000, 0.00000),
    ]
)

# Ghia et al. (1982), Table II: u_y along the horizontal centerline
# y = 0.5, Re = 100 (x, v).
GHIA_V = np.array(
    [
        (1.0000, 0.00000),
        (0.9688, -0.05906),
        (0.9609, -0.07391),
        (0.9531, -0.08864),
        (0.9453, -0.10313),
        (0.9063, -0.16914),
        (0.8594, -0.22445),
        (0.8047, -0.24533),
        (0.5000, 0.05454),
        (0.2344, 0.17527),
        (0.2266, 0.17507),
        (0.1563, 0.16077),
        (0.0938, 0.12317),
        (0.0781, 0.10890),
        (0.0703, 0.10091),
        (0.0625, 0.09233),
        (0.0000, 0.00000),
    ]
)


def test_cavity_geometry_tags():
    geo = make_cavity_geometry(8, 6)
    assert geo.inlet_kind == "constant"
    assert geo.cell_active.all() and not geo.cell_ring.any()
    assert not np.any(geo.face_id == BOUNDARY_OUTLET)
    # lid = every N face of the top cell row, nothing else
    lid = geo.face_id == BOUNDARY_INLET
    assert lid[3, -1, :].all()
    lid[3, -1, :] = False
    assert not lid.any()
    # the three other sides are walls
    assert (geo.face_id[0, :, 0] == BOUNDARY_WALL).all()
    assert (geo.face_id[1, :, -1] == BOUNDARY_WALL).all()
    assert (geo.face_id[2, 0, :] == BOUNDARY_WALL).all()
    # interior faces untouched
    assert (geo.face_id[0, :, 1:] == INTERIOR).all()


def test_cavity_space_lid_profile():
    geo = make_cavity_geometry(4)
    sp = make_fe_space(geo, 2, 1)
    # constant lid profile (vs the channel parabola)
    np.testing.assert_array_equal(sp.inlet_profile(0.75), 0.75)
    # the id-7 mask is exactly the top lattice row (corners included:
    # the singular Ghia formulation)
    assert sp.u_inlet[-1, :].all()
    assert not sp.u_inlet[:-1, :].any()
    # every boundary node is Dirichlet (closed box)
    assert sp.u_dirichlet[0, :].all() and sp.u_dirichlet[-1, :].all()
    assert sp.u_dirichlet[:, 0].all() and sp.u_dirichlet[:, -1].all()
    assert not sp.u_dirichlet[1:-1, 1:-1].any()


@pytest.mark.slow
def test_cavity_ghia_re100():
    s = NSSolverStationary(
        SolverOptions(
            mesh_size=(32, 32),
            degree_velocity=2,
            degree_pressure=1,
            Re=100.0,
            solver_type=1,  # FGMRES
            tolerance=1e-10,
            preconditioner_type=1,  # blockTriangular
            krylov_basis=60,
            geometry="cavity",
            verbose=False,
        )
    )
    s.setup()
    s.solve_direct()

    u = np.asarray(s.solution.u)  # [2, NVy, NVx]
    x, y = s.space.x_v, s.space.y_v
    icx = int(np.argmin(np.abs(x - 0.5)))
    icy = int(np.argmin(np.abs(y - 0.5)))
    assert abs(x[icx] - 0.5) < 1e-12 and abs(y[icy] - 0.5) < 1e-12

    u_line = np.interp(GHIA_U[:, 0], y, u[0, :, icx])
    v_line = np.interp(GHIA_V[:, 0], x, u[1, icy, :])
    err_u = np.max(np.abs(u_line - GHIA_U[:, 1]))
    err_v = np.max(np.abs(v_line - GHIA_V[:, 1]))
    assert err_u < 2.5e-2, f"u-centerline max dev vs Ghia: {err_u}"
    assert err_v < 2.5e-2, f"v-centerline max dev vs Ghia: {err_v}"

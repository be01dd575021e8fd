"""Geometry and function-space layout tests."""

import numpy as np

from navier_stokes_solver_tpu.geometry import (
    BOUNDARY_CYLINDER,
    BOUNDARY_INLET,
    BOUNDARY_OUTLET,
    BOUNDARY_WALL,
    INTERIOR,
    make_channel_geometry,
    make_fe_space,
)


def test_cell_deletion_rule():
    geo = make_channel_geometry(100, 70)
    # independent recomputation of the deletion rule (NSSolver.cpp:43-44)
    hx, hy = 2.2 / 100, 0.41 / 70
    deleted = 0
    for iy in range(70):
        for ix in range(100):
            cx, cy = (ix + 0.5) * hx, (iy + 0.5) * hy
            if np.hypot(cx - 0.2, cy - 0.205) < 0.05:
                deleted += 1
    assert geo.n_active_cells == 100 * 70 - deleted
    assert deleted > 0


def test_dof_count_matches_reference_notebook():
    """The reference's strong-scaling setup states 100x70 Q3/Q2 = 154,244 DoFs
    (performance_analysis.ipynb markdown cell 1; SURVEY.md section 6)."""
    geo = make_channel_geometry(100, 70)
    sp = make_fe_space(geo, 3, 2)
    assert sp.n_dofs == 154_244
    assert sp.n_dofs == sp.n_dofs_velocity + sp.n_dofs_pressure


def test_boundary_ids():
    geo = make_channel_geometry(40, 20)
    fid = geo.face_id
    act = geo.cell_active
    # inlet: every active cell in column 0 has W face id 7
    assert (fid[0, :, 0][act[:, 0]] == BOUNDARY_INLET).all()
    # outlet: column nx-1, E face id 8
    assert (fid[1, :, -1][act[:, -1]] == BOUNDARY_OUTLET).all()
    # walls: bottom row S faces, top row N faces id 6
    assert (fid[2, 0, :][act[0, :]] == BOUNDARY_WALL).all()
    assert (fid[3, -1, :][act[-1, :]] == BOUNDARY_WALL).all()
    # cylinder faces exist and are tagged 10
    assert (fid == BOUNDARY_CYLINDER).sum() > 0
    # every face adjacent to a deleted cell is a boundary face
    for iy in range(geo.ny):
        for ix in range(geo.nx):
            if not act[iy, ix]:
                continue
            if ix > 0 and not act[iy, ix - 1]:
                assert fid[0, iy, ix] != INTERIOR
            if ix < geo.nx - 1 and not act[iy, ix + 1]:
                assert fid[1, iy, ix] != INTERIOR
    # inactive cells carry no boundary ids
    assert (fid[:, ~act] == INTERIOR).all()


def test_no_cylinder_channel():
    geo = make_channel_geometry(8, 4, with_cylinder=False)
    assert geo.n_active_cells == 32
    assert (geo.face_id == BOUNDARY_CYLINDER).sum() == 0
    sp = make_fe_space(geo, 2, 1)
    assert sp.u_active.all() and sp.p_active.all()
    # Q2 on 8x4: (17 x 9) velocity nodes x 2 comps + (9 x 5) pressure
    assert sp.n_dofs_velocity == 2 * 17 * 9
    assert sp.n_dofs_pressure == 45


def test_dirichlet_masks():
    geo = make_channel_geometry(30, 12)
    sp = make_fe_space(geo, 2, 1)
    # all four lattice edges except the outlet column are Dirichlet
    assert sp.u_dirichlet[:, 0].all()  # inlet
    assert sp.u_dirichlet[0, :].all() and sp.u_dirichlet[-1, :].all()  # walls
    assert not sp.u_dirichlet[1:-1, -1].any()  # outlet interior is Neumann
    # inlet mask is exactly the first column
    assert sp.u_inlet[:, 0].all() and not sp.u_inlet[:, 1:].any()
    # inlet profile: parabola 4*u*y*(H-y)/H^2 (NSSolver.hpp:71)
    prof = sp.inlet_profile(0.3)
    y = sp.y_v
    np.testing.assert_allclose(prof, 4 * 0.3 * y * (0.41 - y) / 0.41**2)
    assert prof[0] == 0.0 and abs(prof[-1]) < 1e-15
    # Dirichlet nodes are a subset of active nodes
    assert (sp.u_dirichlet <= sp.u_active).all()


def test_node_coordinates_q3():
    geo = make_channel_geometry(10, 5)
    sp = make_fe_space(geo, 3, 2)
    # Gauss-Lobatto interior spacing within each cell (deal.II FE_Q support pts)
    hx = geo.hx
    a = (1 - 1 / np.sqrt(5)) / 2
    np.testing.assert_allclose(sp.x_v[1], a * hx, atol=1e-14)
    np.testing.assert_allclose(sp.x_v[3], hx, atol=1e-14)
    np.testing.assert_allclose(sp.x_v[-1], 2.2, atol=1e-14)
    assert len(sp.x_v) == 31 and len(sp.y_v) == 16

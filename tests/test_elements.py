"""Unit tests for the reference-element tables."""

import numpy as np
import pytest

from navier_stokes_solver_tpu.elements import (
    gauss_legendre_01,
    gauss_lobatto_01,
    lagrange_derivs,
    lagrange_values,
    make_taylor_hood,
)


def test_gauss_lobatto_endpoints_and_symmetry():
    for n in (2, 3, 4, 5):
        pts = gauss_lobatto_01(n)
        assert pts[0] == 0.0 and pts[-1] == 1.0
        np.testing.assert_allclose(pts + pts[::-1], 1.0, atol=1e-14)
    # degree 3 support points: {0, (1 -+ 1/sqrt(5))/2, 1} (deal.II FE_Q(3))
    pts = gauss_lobatto_01(4)
    np.testing.assert_allclose(pts[1], (1 - 1 / np.sqrt(5)) / 2, atol=1e-14)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_gauss_legendre_exactness(n):
    x, w = gauss_legendre_01(n)
    for deg in range(2 * n):
        exact = 1.0 / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-14)


def test_lagrange_basis_kronecker_and_partition():
    nodes = gauss_lobatto_01(4)
    V = lagrange_values(nodes, nodes)
    np.testing.assert_allclose(V, np.eye(4), atol=1e-13)
    x = np.linspace(0, 1, 17)
    np.testing.assert_allclose(lagrange_values(nodes, x).sum(1), 1.0, atol=1e-13)
    np.testing.assert_allclose(lagrange_derivs(nodes, x).sum(1), 0.0, atol=1e-12)


def test_lagrange_derivs_vs_fd():
    nodes = gauss_lobatto_01(3)
    x = np.array([0.2, 0.55, 0.9])
    eps = 1e-6
    fd = (lagrange_values(nodes, x + eps) - lagrange_values(nodes, x - eps)) / (2 * eps)
    np.testing.assert_allclose(lagrange_derivs(nodes, x), fd, atol=1e-8)


@pytest.mark.parametrize("deg_v,deg_p", [(2, 1), (3, 2)])
def test_taylor_hood_tables(deg_v, deg_p):
    t = make_taylor_hood(deg_v, deg_p)
    assert t.n_q1d == deg_v + 1  # QGauss(fe->degree + 1), NSSolver.cpp:133
    # partition of unity / zero gradient sum at all volume and face points
    np.testing.assert_allclose(t.phi_v.sum(1), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.dphi_v.sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose(t.phi_p.sum(1), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.phi_v_face.sum(2), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.phi_p_face.sum(2), 1.0, atol=1e-13)
    # quadrature weights integrate the unit cell
    np.testing.assert_allclose(t.w_q.sum(), 1.0, atol=1e-14)
    np.testing.assert_allclose(t.w_qf.sum(), 1.0, atol=1e-14)


def test_quadrature_mass_matrix_exact():
    """The n_q1d = deg+1 rule integrates phi_i phi_j exactly (degree 2k <= 2n-1)."""
    t = make_taylor_hood(2, 1)
    M = np.einsum("q,qi,qj->ij", t.w_q, t.phi_v, t.phi_v)
    # compare against a much finer rule
    t_fine = make_taylor_hood(2, 1, n_q1d=8)
    M_fine = np.einsum("q,qi,qj->ij", t_fine.w_q, t_fine.phi_v, t_fine.phi_v)
    np.testing.assert_allclose(M, M_fine, atol=1e-14)

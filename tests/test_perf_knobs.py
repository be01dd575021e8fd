"""Performance knobs must not change converged answers.

The perf configuration surface (outer restart basis, inner tolerances,
inner mode) only reshapes the iteration path; the solved system and its
tolerance are identical, so fields must agree to solver tolerance.
"""

import numpy as np
import pytest

from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
from navier_stokes_solver_tpu.precond.blocks import PrecondConfig

BASE = dict(
    mesh_size=(20, 8),
    degree_velocity=2,
    degree_pressure=1,
    Re=10.0,
    solver_type=1,
    tolerance=1e-10,
    preconditioner_type=1,
    verbose=False,
)


def _solve(**kw):
    s = NSSolverStationary(SolverOptions(**BASE, **kw))
    s.setup()
    s.solve_newton()
    s.compute_lift_drag()
    return s


def test_restart_basis_invariance():
    a = _solve()
    b = _solve(krylov_basis=60)
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)
    # deeper restarts cannot need more iterations
    ita = sum(h["krylov_iters"] for h in a.history)
    itb = sum(h["krylov_iters"] for h in b.history)
    assert itb <= ita


def test_inner_tolerance_invariance():
    a = _solve()
    b = _solve(precond_config=PrecondConfig(tri_rel_u=1e-4, tri_rel_p=1e-4))
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)

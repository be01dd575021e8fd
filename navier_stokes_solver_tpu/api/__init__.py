"""User-facing solver classes mirroring the reference's API surface.

``NSSolverStationary`` (NSSolverStationary.hpp:48) and ``NSSolver``
(NSSolver.hpp:46) with the same lifecycle: ``setup()``, ``solve_newton()`` /
``solve()``, ``output()``, ``compute_lift_drag()``, ``print_lift_coeff()``,
``print_drag_coeff()``.
"""

from navier_stokes_solver_tpu.api.base import SolverOptions
from navier_stokes_solver_tpu.api.stationary import NSSolverStationary
from navier_stokes_solver_tpu.api.unsteady import NSSolver

__all__ = ["SolverOptions", "NSSolverStationary", "NSSolver"]

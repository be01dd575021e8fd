"""Jit-compiled Krylov solvers over (u, p) block pytrees.

TPU-native equivalents of the deal.II solver surface the reference uses
(``SolverGMRES`` / ``SolverFGMRES`` / ``SolverBicgstab`` / ``SolverCG`` with
``SolverControl(maxit, tol)``, NSSolver.cpp:601-672): ``lax.while_loop``
iterations, absolute-tolerance semantics, and a first-class iteration count
(the reference prints and branches on ``solver_control.last_step()``,
NSSolver.cpp:670, :721-722).
"""

from navier_stokes_solver_tpu.krylov.solvers import (
    LowCycle,
    SolveInfo,
    bicgstab,
    cg,
    fgmres,
    gmres,
)

__all__ = ["gmres", "fgmres", "bicgstab", "cg", "SolveInfo", "LowCycle"]

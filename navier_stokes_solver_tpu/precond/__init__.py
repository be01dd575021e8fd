"""Block preconditioners for the Navier-Stokes saddle system.

TPU-native re-designs of the reference's three preconditioners
(blockDiagonal / blockTriangular / aSIMPLE; NSSolver.hpp:138-384 and the
stationary variants NSSolverStationary.hpp:115-335), with the exact algebraic
sweeps and inner-solve tolerances.  The sparse smoothers the reference gets
from Trilinos (ILU / SSOR / AMG) have no efficient TPU analog; this package
provides the documented *equivalence layer*: a rediscretization geometric
multigrid V-cycle (``precond.mg``) with Chebyshev-Jacobi or cell-block
additive-Schwarz smoothing (``precond.schwarz``), run in f32 inside the f64
outer Krylov.
"""

from navier_stokes_solver_tpu.precond.blocks import (
    LinearContext,
    PrecondConfig,
    make_krylov_lo,
    make_preconditioner,
)
from navier_stokes_solver_tpu.precond.mg import attach_mg, make_mg_vcycle

__all__ = [
    "LinearContext",
    "PrecondConfig",
    "make_preconditioner",
    "make_krylov_lo",
    "attach_mg",
    "make_mg_vcycle",
]

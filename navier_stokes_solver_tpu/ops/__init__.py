"""Matrix-free TPU operators for the Navier-Stokes block system.

These replace the reference's assembled Trilinos ``BlockSparseMatrix`` +
SpMV (NSSolver.cpp:275-300, :553-562) with cell-local dense operator
application over the structured grid: stride-slice gathers, batched einsum
contractions against the reference-element tables (MXU), and dilated-pad
scatter-adds.  No sparse matrix is ever formed.
"""

from navier_stokes_solver_tpu.ops.blocks import (
    Blocks,
    axpy,
    norm,
    scale,
    vdot,
    zeros_like,
)
from navier_stokes_solver_tpu.ops.disc import Disc, make_disc
from navier_stokes_solver_tpu.ops.matfree import (
    LinearizationQ,
    apply_B,
    apply_Bt,
    apply_F,
    apply_Mp,
    apply_jacobian,
    diag_F,
    diag_Mp,
    eval_state,
    lift_drag_forces,
    make_dot,
    residual,
)

__all__ = [
    "Blocks",
    "vdot",
    "norm",
    "axpy",
    "scale",
    "zeros_like",
    "Disc",
    "make_disc",
    "LinearizationQ",
    "eval_state",
    "apply_F",
    "apply_B",
    "apply_Bt",
    "apply_Mp",
    "apply_jacobian",
    "residual",
    "diag_F",
    "diag_Mp",
    "lift_drag_forces",
    "make_dot",
]

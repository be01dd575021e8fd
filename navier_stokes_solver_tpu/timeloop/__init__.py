"""Fully on-device implicit-Euler time integration (performance path).

The reference's time loop round-trips to the host every step (VTU write +
lift/drag reduction synchronize all ranks, NSSolver.cpp:814-836).  Here the
whole loop runs as one compiled ``lax.scan``: Newton, line search, Krylov and
the lift/drag face integral all stay on device, and per-step coefficients
stream out as scan outputs -- the BASELINE.json north star.
"""

from navier_stokes_solver_tpu.timeloop.fused import (
    StepStats,
    TimeState,
    initial_state,
    make_stokes_init,
    make_time_step,
    run_time_loop,
)

__all__ = [
    "TimeState",
    "StepStats",
    "initial_state",
    "make_time_step",
    "make_stokes_init",
    "run_time_loop",
]

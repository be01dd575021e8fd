"""Observability: structured run records, timers, profiler hooks.

The reference's observability is rank-0 stdout plus shell-level timing
(SURVEY.md section 5).  Here every solver keeps a structured ``history`` of
Newton residuals / Krylov counts / per-step forces, and this module adds
phase timers and ``jax.profiler`` trace capture.
"""

from navier_stokes_solver_tpu.obs.timing import PhaseTimer, trace_to

__all__ = ["PhaseTimer", "trace_to"]

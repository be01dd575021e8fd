"""Unsteady CLI driver (test.cpp:21-155 parity)."""

from __future__ import annotations

import sys

from navier_stokes_solver_tpu.api import NSSolver
from navier_stokes_solver_tpu.cli.common import echo_config, parse_options


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    # extension flag (stationary CLI cousin): one Newton solve per step at
    # the ramp's final viscosity instead of the per-step Re continuation
    direct = "--direct" in argv
    if direct:
        argv.remove("--direct")
    opts = parse_options(argv, unsteady=True)
    echo_config(opts, unsteady=True)
    problem = NSSolver(opts)
    problem.setup()
    if opts.fused:
        run = problem.solve_fused
    elif direct:
        run = lambda: problem.solve(direct=True)
    else:
        run = problem.solve
    if opts.profile_dir:
        from navier_stokes_solver_tpu.obs import trace_to

        with trace_to(opts.profile_dir):
            run()
    else:
        run()
    if opts.fused:
        problem.print_lift_coeff()
        problem.print_drag_coeff()
    if opts.verbose:
        import json

        print("phase timings:", json.dumps(problem.timer.summary()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Stationary CLI driver (testStationary.cpp:19-139 parity)."""

from __future__ import annotations

import sys

from navier_stokes_solver_tpu.api import NSSolverStationary
from navier_stokes_solver_tpu.cli.common import echo_config, parse_options


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    # extension: skip the reference's Re-continuation ramp and Newton at
    # exactly nu = 1/Re (NSSolverStationary.solve_direct)
    direct = "--direct" in argv
    if direct:
        argv.remove("--direct")
    opts = parse_options(argv, unsteady=False)
    echo_config(opts, unsteady=False)
    problem = NSSolverStationary(opts)
    problem.setup()
    solve = problem.solve_direct if direct else problem.solve_newton
    if opts.profile_dir:
        from navier_stokes_solver_tpu.obs import trace_to

        with trace_to(opts.profile_dir):
            solve()
    else:
        solve()
    problem.output()
    problem.compute_lift_drag()
    problem.print_lift_coeff()
    problem.print_drag_coeff()
    if opts.verbose:
        import json

        print("phase timings:", json.dumps(problem.timer.summary()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Stationary CLI driver (testStationary.cpp:19-139 parity)."""

from __future__ import annotations

import sys

from navier_stokes_solver_tpu.api import NSSolverStationary
from navier_stokes_solver_tpu.cli.common import echo_config, parse_options


def main(argv=None):
    opts = parse_options(argv if argv is not None else sys.argv[1:], unsteady=False)
    echo_config(opts, unsteady=False)
    problem = NSSolverStationary(opts)
    problem.setup()
    if opts.profile_dir:
        from navier_stokes_solver_tpu.obs import trace_to

        with trace_to(opts.profile_dir):
            problem.solve_newton()
    else:
        problem.solve_newton()
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

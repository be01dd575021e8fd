#!/usr/bin/env python
"""Benchmark harness regenerating performance_log-style CSVs.

TPU-native equivalent of the reference's SLURM wrappers
(run_sim_steady.sh:13-38, run_sim_unsteady.sh:12-34): times full solver
runs with a monotonic clock and appends

    time,proc,dim_x,dim_y,solver,prec

rows (the reference's CSV schema, performance_log.csv) where ``proc`` is
the number of TPU devices used.  A ``--weak`` mode holds cells/device
constant (weak_scalability_log.csv analog).

Examples:
    python scripts/run_benchmarks.py --mesh 100,70 --solver 1 --prec 1 \
        --tol 1e-12 --re 100 --csv performance_log_tpu.csv
    python scripts/run_benchmarks.py --unsteady --mesh 60,40 \
        --timespan 0.03,0.01 --tol 1e-9 --re 1.0
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mesh", default="100,70", help="dim_x,dim_y")
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--solver", type=int, default=1, help="0 GMRES 1 FGMRES 2 BiCGStab")
    ap.add_argument("--prec", type=int, default=1,
                    help="0 blockDiagonal 1 blockTriangular 2 aSIMPLE")
    ap.add_argument("--tol", type=float, default=1e-12)
    ap.add_argument("--degrees", default="3,2")
    ap.add_argument("--unsteady", action="store_true")
    ap.add_argument("--timespan", default="1.0,0.01", help="T,dt (unsteady)")
    ap.add_argument("--csv", default="performance_log_tpu.csv")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--no-multigrid", action="store_true")
    ap.add_argument(
        "--dd", default="",
        help="X[,Y] domain-decomposition tiles (the reference's mpiexec -n "
        "analog); 'proc' in the CSV becomes X*Y",
    )
    ap.add_argument("--basis", type=int, default=30,
                    help="outer GMRES/FGMRES restart basis")
    ap.add_argument(
        "-M", "--simplex", nargs="?", const="", default=None, metavar="FILE",
        help="unstructured P2/P1 simplex backend (the reference's "
        "benchmarked unsteady config is -M, run_sim_unsteady.sh:21); "
        "with FILE read a gmsh .msh, without triangulate internally",
    )
    ap.add_argument("--schur", default="mass",
                    choices=("mass", "cahouet", "pcd"))
    args = ap.parse_args(argv)

    import jax

    from navier_stokes_solver_tpu.api import (
        NSSolver,
        NSSolverStationary,
        SolverOptions,
    )
    from navier_stokes_solver_tpu.obs import PhaseTimer

    dim_x, dim_y = (int(v) for v in args.mesh.split(","))
    deg_v, deg_p = (int(v) for v in args.degrees.split(","))
    dd = None
    if args.dd:
        parts = [int(v) for v in args.dd.split(",")]
        dd = (parts[0], parts[1] if len(parts) > 1 else 1)
    n_proc = dd[0] * dd[1] if dd else 1

    new_file = not os.path.exists(args.csv)
    with open(args.csv, "a", newline="") as f:
        w = csv.writer(f)
        if new_file:
            w.writerow(["time", "proc", "dim_x", "dim_y", "solver", "prec"])

        for rep in range(args.repeats):
            from navier_stokes_solver_tpu.precond import PrecondConfig

            opts = SolverOptions(
                mesh_size=(dim_x, dim_y),
                degree_velocity=deg_v,
                degree_pressure=deg_p,
                Re=args.re,
                solver_type=args.solver,
                tolerance=args.tol,
                preconditioner_type=args.prec,
                multigrid=not args.no_multigrid,
                verbose=False,
                dd=dd,
                krylov_basis=args.basis,
                read_mesh_from_file=args.simplex is not None,
                mesh_file_name=args.simplex or "",
                precond_config=(
                    PrecondConfig(schur_mode=args.schur)
                    if args.schur != "mass" else None
                ),
            )
            timer = PhaseTimer()
            if args.unsteady:
                T, dt = (float(v) for v in args.timespan.split(","))
                opts.time_span, opts.time_step = T, dt
                solver = NSSolver(opts)
                with timer.phase("setup"):
                    solver.setup()
                t0 = time.perf_counter()
                with timer.phase("solve"):
                    solver.solve()
                elapsed = time.perf_counter() - t0
            else:
                solver = NSSolverStationary(opts)
                with timer.phase("setup"):
                    solver.setup()
                t0 = time.perf_counter()
                with timer.phase("solve"):
                    solver.solve_newton()
                elapsed = time.perf_counter() - t0
                solver.compute_lift_drag()
                solver.compute_drag_coeff()
                solver.compute_lift_coeff()

            w.writerow([f"{elapsed:.6f}", n_proc, dim_x, dim_y,
                        args.solver, args.prec])
            f.flush()
            total_k = sum(
                h.get("krylov_iters", 0) for h in solver.history
            )
            print(
                f"rep {rep}: {elapsed:.2f}s  proc={n_proc} "
                f"mesh={dim_x}x{dim_y} solver={args.solver} prec={args.prec} "
                f"krylov_total={total_k} "
                f"drag_c={getattr(solver, 'drag_coeff', float('nan')):.6g}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

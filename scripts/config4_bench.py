#!/usr/bin/env python
"""BASELINE config-4 (unsteady 600x200 Re=1000 dt=0.005) per-step rows.

The literal reference pairing (BiCGStab + aSIMPLE, run via test.cpp with
``-m 600,200 -r 1000 -T x,0.005``) breaks down on the first tangent solve
(docs/PERF.md "BASELINE config 4 solver combo"); the working combo here is
FGMRES + blockTriangular with the Cahouet-Chabard Schur leg.

Drives the HOST path (``NSSolver.solve``-equivalent loop, direct mode:
one warm-started Newton solve per step at the ramp's final viscosity,
api/unsteady.py) rather than the fused scan: at 2.63M DoFs a fused step's
whole Newton loop is one XLA dispatch whose worst case exceeds the TPU
worker's per-execution budget, while the host path bounds every device
call through the adaptive Krylov chunking in ``solve_system``.

Per-step wall + Krylov iters printed as one JSON line (append with --out).

Usage:
  python scripts/config4_bench.py --steps 5                   # TPU
  python scripts/config4_bench.py --mesh 60,20 --steps 3 --cpu  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="600,200")
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--dt", type=float, default=0.005)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--solver", type=int, default=1, help="1=FGMRES")
    ap.add_argument("--prec", type=int, default=1, help="1=blockTriangular")
    ap.add_argument("--basis", type=int, default=30)
    ap.add_argument("--schur", choices=("mass", "cahouet", "pcd"),
                    default="cahouet")
    ap.add_argument("--lp-cycles", type=int, default=1)
    ap.add_argument("--ir", nargs="?", const="float32", default=None,
                    choices=("float32", "mixed"))
    ap.add_argument("--ramp", action="store_true",
                    help="reference-faithful per-step Re continuation "
                    "(1,11,...,991: 100 tangent solves per step) instead "
                    "of direct mode")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions
    from navier_stokes_solver_tpu.precond import PrecondConfig

    mx, my = (int(v) for v in args.mesh.split(","))
    opts = SolverOptions(
        mesh_size=(mx, my),
        Re=args.re,
        solver_type=args.solver,
        tolerance=args.tol,
        preconditioner_type=args.prec,
        time_span=args.steps * args.dt,
        time_step=args.dt,
        verbose=True,
        krylov_basis=args.basis,
        precond_config=PrecondConfig(
            schur_mode=args.schur,
            cc_lp_cycles=args.lp_cycles,
            krylov_cycle_dtype=args.ir,
        ),
    )
    s = NSSolver(opts)
    t0 = time.perf_counter()
    s.setup()
    t_setup = time.perf_counter() - t0

    # the reference time loop (NSSolver.cpp:799-837) with per-step walls
    s.time = 0.0
    s.time_step_index = 0
    per_step, iters, newts = [], [], []
    t0 = time.perf_counter()
    for k in range(args.steps):
        mark = len(s.history)
        ts0 = time.perf_counter()
        s.time += args.dt
        s.time_step_index += 1
        s.solution_old = s.solution
        s.solve_newton(ramp=args.ramp)
        s.apply_first = False
        s.compute_lift_drag()
        per_step.append(time.perf_counter() - ts0)
        solves = [h for h in s.history[mark:] if "krylov_iters" in h]
        iters.append(sum(h["krylov_iters"] for h in solves))
        newts.append(len(solves))
        print(f"step {k + 1}/{args.steps}: {per_step[-1]:.1f} s, "
              f"{iters[-1]} outers / {newts[-1]} solves, "
              f"drag_force={s.drag_force:.6g}", flush=True)
    wall = time.perf_counter() - t0
    s.compute_drag_coeff()
    s.compute_lift_coeff()

    srt = sorted(per_step)
    median = srt[len(srt) // 2]
    out = {
        "metric": (
            f"config4_unsteady_per_step_{mx}x{my}_Q3Q2_Re{args.re:g}"
            f"_dt{args.dt:g}_{'ramp' if args.ramp else 'direct'}_host"
        ),
        "value": round(median, 3),
        "unit": "s/step",
        "extra": {
            "n_dofs": s.n_dofs,
            "setup_s": round(t_setup, 1),
            "wall_s": round(wall, 1),
            "per_step_s": [round(v, 2) for v in per_step],
            "krylov_iters_per_step": iters,
            "newton_solves_per_step": newts,
            "drag_coeff": s.drag_coeff,
            "lift_coeff": s.lift_coeff,
            "tol": args.tol,
            "solver": args.solver,
            "prec": args.prec,
            "schur": args.schur,
            "lp_cycles": args.lp_cycles,
            "ir": args.ir,
            "basis": args.basis,
            "nu": s.nu,
            "note": "direct mode: one Newton solve/step at the ramp's "
            "final viscosity (nu=1/991 for Re=1000); the reference "
            "replays the full Re continuation every step",
        },
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

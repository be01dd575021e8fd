#!/usr/bin/env python
"""BASELINE config-3 lift/drag trajectory on the -M simplex backend.

Reproduces the reference's flagship unsteady artifact: the per-step
lift/drag coefficient history appended to ``{drag,lift}_coefficient_<Re>.txt``
(NSSolver.cpp:976-1018).  The reference's recorded artifact
(lab_new/lift_drag_data/drag_coefficient_0.20.txt, 31 values) comes from
``-M -T 0.31,0.01 -r 1.0`` runs: the CLI ``-r 1.0`` target makes the
per-step ramp solve once at nu=1.0 and ``get_reynolds()`` names the file
0.20 (U_avg = 2/3 * 0.3, D = 0.1).

Default drive: fused on-device time loop (``solve_fused``) at the SLURM
benchmark shape (run_sim_unsteady.sh:21: -m 60,40 -s 1 -p 1 -t 1e-9);
``--host`` switches to the host-driven reference-faithful path (per-step
Re continuation).  Prints one JSON line with per-step walls and writes
the coefficient files to --outdir.

Usage:
  python scripts/config3_liftdrag.py --mesh 60,40 --re 1.0 -T 0.31,0.01
  python scripts/config3_liftdrag.py --re 100 -T 0.1,0.01   (config-3 Re=100)
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
    ap.add_argument("--mesh", default="60,40")
    ap.add_argument("--mesh-file", default=None,
                    help="gmsh .msh file (the reference's real -M path, "
                    "test.cpp:147 hardcodes ../mesh/new_mesh.msh); "
                    "overrides --mesh's internal triangulation")
    ap.add_argument("--re", type=float, default=1.0)
    ap.add_argument("-T", "--time", default="0.31,0.01")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--solver", type=int, default=1)
    ap.add_argument("--prec", type=int, default=1)
    ap.add_argument("--host", action="store_true",
                    help="host-driven solve() (per-step Re ramp) instead "
                    "of the fused scan")
    ap.add_argument("--chunk-steps", type=int, default=1,
                    help="fused: time steps per device call")
    ap.add_argument("--krylov-maxiter", type=int, default=2000,
                    help="fused: per-Newton Krylov cap (bounds one "
                    "dispatch's device time together with --newton-max)")
    ap.add_argument("--newton-max", type=int, default=None)
    ap.add_argument("--outdir", default="lift_drag_out")
    ap.add_argument("--ckpt", default=None,
                    help="fused: checkpoint dir; resumes automatically if "
                    "a checkpoint exists (elastic restart across worker "
                    "faults)")
    ap.add_argument("--segment-steps", type=int, default=None,
                    help="fused: stop (exit code 3, checkpoint written) "
                    "after this many steps this process -- keeps each TPU "
                    "client session short; relaunch to continue")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--schur", choices=("mass", "cahouet", "pcd"),
                    default="mass",
                    help="Schur treatment (PrecondConfig.schur_mode); "
                    "'cahouet' is the h/dt-robust unsteady choice")
    ap.add_argument("--lp-cycles", type=int, default=None,
                    help="PrecondConfig.cc_lp_cycles: replace the nested "
                    "Lp solve of the cahouet/pcd leg with N "
                    "residual-corrected cycles")
    ap.add_argument("--direct-lu", action="store_true",
                    help="PrecondConfig.direct_lu: dense f32 LU of the "
                    "saddle Jacobian as the preconditioner (exact solve; "
                    "outer counts collapse to a handful per tangent)")
    ap.add_argument("--consistent", action="store_true",
                    help="Jacobian-consistent Newton continuity rhs "
                    "(SolverOptions.consistent_continuity): stabilizes "
                    "the trajectory against the reference's x2-per-step "
                    "divergence mode (docs/PERF.md round 4)")
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    mx, my = (int(v) for v in args.mesh.split(","))
    span, dt = (float(v) for v in args.time.split(","))
    precond_cfg = None
    if args.schur != "mass" or args.lp_cycles is not None or args.direct_lu:
        from navier_stokes_solver_tpu.precond import PrecondConfig

        kw = {"schur_mode": args.schur, "direct_lu": args.direct_lu}
        if args.lp_cycles is not None:
            kw["cc_lp_cycles"] = args.lp_cycles
        precond_cfg = PrecondConfig(**kw)
    opts = SolverOptions(
        mesh_size=(mx, my), read_mesh_from_file=True,
        mesh_file_name=args.mesh_file or "",
        Re=args.re, solver_type=args.solver, tolerance=args.tol,
        preconditioner_type=args.prec, time_span=span, time_step=dt,
        verbose=bool(os.environ.get("NSTPU_CONFIG3_VERBOSE")),
        output_dir=args.outdir,
        consistent_continuity=args.consistent,
        precond_config=precond_cfg,
    )
    s = NSSolver(opts)
    s.setup()
    os.makedirs(args.outdir, exist_ok=True)

    n_steps = int(round(span / dt))
    t0 = time.perf_counter()
    if args.host:
        # reference-faithful host loop (per-step Re ramp, NSSolver.cpp:799)
        s.solve()
    else:
        s.solve_fused(
            chunk_steps=args.chunk_steps,
            krylov_maxiter=args.krylov_maxiter,
            newton_max=args.newton_max,
            checkpoint_dir=args.ckpt,
            max_steps_this_call=args.segment_steps,
        )
    wall = time.perf_counter() - t0
    seg_walls = [wall]
    if args.ckpt:
        # accumulate per-segment walls across resumed processes
        wp = os.path.join(args.ckpt, "walls.json")
        if os.path.exists(wp):
            with open(wp) as f:
                seg_walls = json.load(f) + seg_walls
        os.makedirs(args.ckpt, exist_ok=True)
        with open(wp, "w") as f:
            json.dump(seg_walls, f)
        wall = sum(seg_walls)
    steps = [h for h in s.history if h.get("phase") == "step"]
    if not args.host and s.time_step_index < n_steps:
        print(json.dumps({
            "partial": True,
            "steps_done": s.time_step_index,
            "n_steps": n_steps,
            "segment_wall_s": round(wall, 2),
        }))
        return 3
    # append the per-step coefficient history to the reference's per-Re
    # files through the production writer (NSSolver.cpp:976-1018): restore
    # each step's forces onto the solver and call write_lift_drag_to_file
    for h in steps:
        s.drag_force, s.lift_force = h["drag_force"], h["lift_force"]
        s.compute_drag_coeff()
        s.compute_lift_coeff()
        s.write_lift_drag_to_file(args.outdir)

    mesh_tag = (
        os.path.splitext(os.path.basename(args.mesh_file))[0]
        if args.mesh_file
        else f"{mx}x{my}"
    )
    print(json.dumps({
        "metric": f"config3_{mesh_tag}_re{args.re}_"
        f"{'host' if args.host else 'fused'}"
        f"{'_consistent' if args.consistent else ''}",
        "value": round(wall, 2),
        "unit": "s",
        "extra": {
            "n_steps": n_steps,
            "n_dofs": s.n_dofs,
            "schur": args.schur,
            "lp_cycles": args.lp_cycles,
            "direct_lu": args.direct_lu,
            "segment_walls_s": [round(w, 2) for w in seg_walls],
            "s_per_step": round(wall / max(1, n_steps), 3),
            "tol": args.tol,
            "drag_coeff_last": s.drag_coeff,
            "lift_coeff_last": s.lift_coeff,
            "krylov_iters_per_step": [
                h.get("krylov_iters") for h in steps
            ][:40],
            "device": str(jax.devices()[0]),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

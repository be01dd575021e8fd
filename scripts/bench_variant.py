#!/usr/bin/env python
"""One-off bench-config variants for same-day A/B pairs on the TPU.

Same solve as bench.py (stationary 100x70 Q3/Q2 Re=100 FGMRES +
blockTriangular tol 1e-12) with PrecondConfig knobs exposed, printing the
same one-line JSON.  Use alongside a same-session bench.py control run --
cross-day walls are worker-variance noise (docs/PERF.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--basis", type=int, default=60)
    ap.add_argument("--ir", default=None, choices=("float32", "mixed"))
    ap.add_argument("--tri-rel-u", type=float, default=None)
    ap.add_argument("--tri-rel-p", type=float, default=None)
    ap.add_argument("--tri-rel-u-stokes", type=float, default=None)
    ap.add_argument("--tri-rel-p-stokes", type=float, default=None)
    ap.add_argument("--mesh", default="100,70")
    ap.add_argument("--tol", type=float, default=1e-12)
    ap.add_argument("--schur", default="mass", choices=("mass", "cahouet", "pcd"))
    ap.add_argument(
        "--inner-mode", default="auto", choices=("auto", "krylov", "fixed"),
        help="blockTriangular inner solves: nested Krylov (reference "
        "semantics) vs fixed V-cycle sweeps (PrecondConfig.inner_mode)",
    )
    ap.add_argument("--fixed-f-cycles", type=int, default=2)
    ap.add_argument("--ir-eta", type=float, default=None)
    ap.add_argument("--prec", type=int, default=1, choices=(0, 1, 2),
                    help="preconditioner (-p): 0 blockDiagonal, "
                    "1 blockTriangular, 2 aSIMPLE")
    ap.add_argument("--stokes-schur", default="shat",
                    choices=("shat", "mass"),
                    help="aSIMPLE Stokes-regime Schur surrogate "
                    "(PrecondConfig.asimple_stokes_schur)")
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--solver", type=int, default=1, choices=(0, 1, 2),
                    help="Krylov method (-s): 0 GMRES, 1 FGMRES, 2 BiCGStab")
    ap.add_argument("--deg", default="3,2",
                    help="velocity,pressure degrees (reference generated-"
                    "mesh default 3,2; -M parity 2,1)")
    ap.add_argument(
        "--skip-futile", action="store_true",
        help="elide the reference's futile repeat Stokes-regime tangent "
        "solves (SolverOptions.skip_futile_stokes; bench.py's tuned "
        "branch default)",
    )
    ap.add_argument(
        "--warmup", action="store_true",
        help="absorb the one-time per-process worker session stall "
        "(tiny matmul + one un-timed assemble) before the timed solve, "
        "so phase timings measure the solver (docs/PERF.md config-1 "
        "stall finding)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (iteration-count A/Bs; walls are "
        "meaningless there)",
    )
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
    from navier_stokes_solver_tpu.precond import PrecondConfig

    mx, my = (int(v) for v in args.mesh.split(","))
    cfg = PrecondConfig(
        krylov_cycle_dtype=args.ir,
        tri_rel_u=args.tri_rel_u,
        tri_rel_p=args.tri_rel_p,
        tri_rel_u_stokes=args.tri_rel_u_stokes,
        tri_rel_p_stokes=args.tri_rel_p_stokes,
        schur_mode=args.schur,
        inner_mode=args.inner_mode,
        fixed_f_cycles=args.fixed_f_cycles,
        ir_eta=args.ir_eta,
        asimple_stokes_schur=args.stokes_schur,
    )
    dv, dp = (int(v) for v in args.deg.split(","))
    opts = SolverOptions(
        mesh_size=(mx, my), degree_velocity=dv, degree_pressure=dp,
        Re=args.re, solver_type=args.solver, tolerance=args.tol,
        preconditioner_type=args.prec,
        verbose=bool(os.environ.get("NSTPU_VARIANT_VERBOSE")),
        krylov_basis=args.basis, precond_config=cfg,
        skip_futile_stokes=args.skip_futile,
    )
    if args.warmup:
        # absorb the per-process worker session stall + executable loads
        # outside the timed window: tiny matmul, then one throwaway
        # first-assemble on an identically-shaped solver
        import jax.numpy as jnp

        a = jnp.ones((128, 128))
        jnp.dot(a, a).block_until_ready()
        w = NSSolverStationary(opts)
        w.setup()
        w.assemble_system(stokes=True, lifting=True)
        del w
    s = NSSolverStationary(opts)
    s.setup()
    t0 = time.perf_counter()
    s.solve_newton()
    wall = time.perf_counter() - t0
    s.compute_lift_drag()
    s.compute_drag_coeff()
    iters = [
        h["krylov_iters"] for h in s.history if "krylov_iters" in h
    ]
    print(
        json.dumps(
            {
                "metric": f"bench_variant_{mx}x{my}_s{args.solver}"
                f"_p{args.prec}"
                f"_b{args.basis}"
                f"_ir{args.ir}_trelu{args.tri_rel_u}_trelp{args.tri_rel_p}"
                f"_schur{args.schur}_ss{args.stokes_schur}"
                f"_im{args.inner_mode}"
                + ("_skipfutile" if args.skip_futile else ""),
                "value": round(wall, 2),
                "unit": "s",
                "extra": {
                    "total_krylov_iters": int(sum(iters)),
                    "per_solve": iters,
                    "drag_coeff": s.drag_coeff,
                    "phase_timings": s.timer.summary(),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

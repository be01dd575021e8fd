#!/usr/bin/env python
"""Headline benchmark: full stationary solve at the reference's
strong-scaling configuration.

Reference anchor (BASELINE.md / performance_log.csv): stationary solver,
100x70 mesh (Q3/Q2, 154,244 DoFs), target Re = 100, FGMRES +
blockTriangular, tolerance 1e-12, full-run wall clock.  The 4-process CPU
reference measures ~777.3 s (1 proc: 5294.75 s).  ``vs_baseline`` is the
speedup of this single-TPU-chip run over the 4-process reference.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_4PROC_SECONDS = 777.3  # performance_log.csv:55-57 (FGMRES, prec=1)


def main():
    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
    from navier_stokes_solver_tpu.precond import PrecondConfig

    # NSTPU_BENCH_PARITY=1: the reference-faithful measurement -- basis 30
    # (the deal.II restart default), no skip_futile_stokes, no GMRES-IR,
    # reference inner tolerances.  "The reference's algorithm on TPU",
    # recorded side-by-side with the tuned headline (docs/PERF.md).
    parity = bool(os.environ.get("NSTPU_BENCH_PARITY"))
    if parity:
        os.environ["NSTPU_BENCH_NO_SKIP"] = "1"
        os.environ["NSTPU_BENCH_NO_IR"] = "1"

    opts = SolverOptions(
        mesh_size=(100, 70),
        degree_velocity=3,
        degree_pressure=2,
        Re=100.0,
        solver_type=1,  # FGMRES
        tolerance=1e-12,
        preconditioner_type=1,  # blockTriangular
        verbose=bool(os.environ.get("NSTPU_BENCH_VERBOSE")),
        # perf-tuned restart depth (docs/PERF.md): the mass-Schur
        # preconditioned saddle system needs a Krylov space deeper than
        # the deal.II-default 30-vector restart; measured at this config
        # the first Stokes tangent solve drops 973 -> 399 outer
        # iterations and 60 -> 45 s wall.  Fields are identical (same
        # operator, same tolerance); SolverOptions default stays 30.
        krylov_basis=30 if parity else 60,
        # Skip the reference's futile repeat Stokes-regime solves: the
        # Stokes rhs is state-independent, so after the first accepted
        # Stokes solution every further Stokes-regime tangent solve is
        # rejected by the strict-< line search (32x12 A/B: 340 -> 224
        # outers, 11 -> 3 tangent solves, fields to 2e-9; docs/PERF.md
        # round 4).  NSTPU_BENCH_NO_SKIP=1 restores the
        # reference-faithful waste.
        skip_futile_stokes=not os.environ.get("NSTPU_BENCH_NO_SKIP"),
        # GMRES-IR: f32 outer restart cycles with f64 restart residuals
        # and solution accumulation (krylov/solvers.py::LowCycle) -- same
        # absolute tolerance, automatic host fallback to f64 cycles on
        # stall.  Disable with NSTPU_BENCH_NO_IR=1 for the f64-outer
        # reference measurement.
        # Stokes-regime-only tight inners: the mass-Schur Stokes outer
        # count is h-inflated at the reference's rel-1e-2 inners (110
        # outers at 100x70 vs 59 at rel 1e-4, wall -25%); Newton-regime
        # solves see no benefit and keep the reference tolerances.  Full
        # 100x70 continuation: 537 -> 449 outers, wall -12% (CPU-measured
        # A/B, docs/PERF.md).
        precond_config=(
            None
            if os.environ.get("NSTPU_BENCH_NO_IR")
            else PrecondConfig(
                krylov_cycle_dtype="float32",
                tri_rel_u_stokes=1e-4,
                tri_rel_p_stokes=1e-4,
            )
        ),
    )
    # The axon TPU worker occasionally dies mid-run ("kernel fault" /
    # UNAVAILABLE) and recovers after a few minutes; retry once from
    # scratch (compiled programs are in the persistent cache, so the
    # retry costs only the solve time).
    import jax.errors

    # Absorb the one-time remote-worker session-establishment stall before
    # the timed region: the first device call of a fresh process measures
    # 60-124 s of session setup that a warm process pays 0.4 s for
    # (docs/PERF.md, config-1 notes).  A trivial matmul establishes the
    # session; the solve programs themselves come from the persistent
    # compilation cache.  Benchmarks are warm-measurement by doctrine
    # (docs/PERF.md "worker-state variance"): the stall is per-process
    # plumbing, not solver work.
    import jax.numpy as jnp

    warm = jnp.ones((256, 256))
    (warm @ warm).block_until_ready()

    # Median-of-N: run the full solve N times (fresh solver state each
    # pass) and report the MEDIAN wall.  The first pass still pays
    # per-process executable loads (seconds per program on the remote
    # worker) and any residual session plumbing; later passes are the
    # fully-warm regime docs/PERF.md A/Bs are quoted in.  The median (not
    # the min) is the headline so a single fast tail can't stand in for a
    # representative wall; every pass is recorded in ``extra.run_walls_s``
    # and the min is reported separately as ``best_wall_s``.
    n_passes = int(os.environ.get("NSTPU_BENCH_PASSES", "3"))
    failures = 0
    runs = []
    solver = None
    while len(runs) < n_passes:
        # only the last pass's solver is kept (for lift/drag below);
        # dropping the previous one releases its device buffers so pass
        # k+1 never times against pass k's resident MG chain
        solver = None
        s = NSSolverStationary(opts)
        s.setup()
        t0 = time.perf_counter()
        try:
            s.solve_newton()
            wall = time.perf_counter() - t0
            runs.append(wall)
            solver = s
        except jax.errors.JaxRuntimeError as e:
            failures += 1
            if failures >= 3:
                if runs:
                    print(
                        f"TPU runtime error ({e}); reporting the "
                        f"{len(runs)} completed pass(es)",
                        file=sys.stderr,
                    )
                    solver = s if s.history else None
                    break
                raise
            print(f"TPU runtime error ({e}); retrying", file=sys.stderr)
            time.sleep(420)
    if solver is None or not solver.history:
        # the final pass died mid-solve: redo one solve for the
        # lift/drag + history fields (walls above are already recorded)
        solver = NSSolverStationary(opts)
        solver.setup()
        solver.solve_newton()
    elapsed = sorted(runs)[len(runs) // 2]  # median (upper on even N)

    solver.compute_lift_drag()
    solver.compute_drag_coeff()
    solver.compute_lift_coeff()

    total_krylov = sum(
        h["krylov_iters"] for h in solver.history if "krylov_iters" in h
    )
    n_dofs = solver.space.n_dofs
    result = {
        "metric": "stationary_solve_wallclock_100x70_Q3Q2_FGMRES_blockTriangular_tol1e-12_Re100"
        + ("_parity" if parity else ""),
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_4PROC_SECONDS / elapsed, 3),
        "extra": {
            "n_dofs": n_dofs,
            "total_krylov_iters": total_krylov,
            "newton_solves": len(solver.history),
            "dof_krylov_throughput_per_s": round(
                n_dofs * total_krylov / max(elapsed, 1e-9), 1
            ),
            "drag_coeff": solver.drag_coeff,
            "lift_coeff": solver.lift_coeff,
            "phase_timings": solver.timer.summary(),
            "run_walls_s": [round(w, 3) for w in runs],
            "best_wall_s": round(min(runs), 3),
            "headline_is": f"median_of_{len(runs)}",
            "device": str(jax.devices()[0]),
            "dtype": str(solver.disc.dtype),
            "vs_baseline_1proc": round(5294.75 / elapsed, 3),  # FGMRES 1-proc
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""North-star measurements (BASELINE.json): per-time-step wall clock and
Krylov iterations for the unsteady 300x100 Re=100 run (fused on-device
steps, host-chunked for the TPU per-call budget), plus the stationary
300x100 FGMRES+aSIMPLE config.

Usage:
  python scripts/northstar.py unsteady [--mesh 300,100] [--steps 10]
  python scripts/northstar.py stationary [--mesh 300,100] [--tol 1e-10]

Prints one JSON line per run; append to PERF_NORTHSTAR.json manually or
via --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_jax():
    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def run_unsteady(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops import make_disc
    from navier_stokes_solver_tpu.precond.mg import attach_mg
    from navier_stokes_solver_tpu.timeloop import (
        initial_state,
        make_time_step,
        run_time_loop,
    )

    mx, my = (int(v) for v in args.mesh.split(","))
    geo = make_channel_geometry(mx, my)
    space = make_fe_space(geo, 3, 2)
    disc = attach_mg(make_disc(space))
    n_dofs = space.n_dofs
    # the reference's per-step ramp current_Re = 1 : +10 : target
    # (NSSolver.cpp:684) tops out at the largest 1+10k <= target, so
    # Re=100 -> nu = 1/91, Re=1000 -> nu = 1/991.  --re/--dt override for
    # the other BASELINE configs (config 4: 600x200 Re=1000 dt=0.005).
    nu = 1.0 / (1.0 + 10.0 * int((args.re - 1.0) // 10.0))
    dt = args.dt

    cfg = _precond_cfg(args)
    # One fused step must stay within the TPU per-call execution budget:
    # bound Newton x Krylov per call (steps that hit the cap report their
    # residual; warm-started steady stepping converges well below it).
    step = make_time_step(
        disc,
        solver_type=1,
        prec_type=1,
        tol=args.tol,
        newton_max=args.newton_max,
        krylov_maxiter=args.krylov_maxiter,
        basis=args.basis,
        precond_cfg=cfg,
        consistent=args.consistent,
    )
    ts = initial_state(disc)

    # cold start: the reference's first-iteration Stokes-with-BC solve
    # (NSSolver.cpp:695-706), host-chunked so no single device call can
    # exceed the budget
    from navier_stokes_solver_tpu.api import kernels
    from navier_stokes_solver_tpu.ops import Blocks

    t0 = time.perf_counter()
    amp = 0.3
    rhs, _ = kernels.assemble_kernel(
        disc, nu, 1.0 / dt, initial_state(disc).solution,
        jnp.zeros((2,) + disc.NV), amp, stokes=True,
    )
    sol0 = Blocks(u=disc.zeros_u(), p=disc.zeros_p())
    first = True
    for _ in range(40 * max(1, 60 // args.init_maxiter)):
        sol0, info = kernels.solve_kernel(
            disc, nu, 1.0 / dt, initial_state(disc).solution, rhs, sol0,
            amp, args.tol, stokes=True, solver_type=1, prec_type=1,
            variant="unsteady", maxiter=args.init_maxiter,
            project_x0=first, basis=args.init_basis,
            precond_cfg=cfg,
        )
        first = False
        if bool(info.converged) or int(info.iters) < args.init_maxiter:
            break
    # real device->host fetch: block_until_ready may return before the
    # remote execution completes (docs/PERF.md round-4 fused-simplex
    # isolation), which would both corrupt walls and let dispatches pile
    # up on the worker
    jax.device_get(sol0.p[..., :1])
    t_init = time.perf_counter() - t0
    ts = ts._replace(solution=sol0)

    # one step to compile + warm, then timed steps (1 device call per step)
    t0 = time.perf_counter()
    ts, _ = run_time_loop(step, ts, nu, dt, 1)
    jax.device_get(ts.time)
    t_compile_step = time.perf_counter() - t0

    per_step = []
    iters = []
    newts = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        ts, h = run_time_loop(step, ts, nu, dt, 1)
        jax.device_get(ts.time)
        per_step.append(time.perf_counter() - t0)
        iters.append(int(jnp.ravel(h["krylov_iters"])[0]))
        newts.append(int(jnp.ravel(h["newton_iters"])[0]))

    per_step_sorted = sorted(per_step)
    median = per_step_sorted[len(per_step) // 2]
    out = {
        "metric": (
            f"unsteady_per_step_wallclock_{mx}x{my}_Q3Q2_Re{args.re:g}_fused"
            + (f"_dt{args.dt:g}" if args.dt != 0.01 else "")
            + ("_consistent" if args.consistent else "")
        ),
        "value": round(median, 3),
        "unit": "s/step",
        "extra": {
            "n_dofs": n_dofs,
            "steps_timed": args.steps,
            "per_step_s": [round(v, 3) for v in per_step],
            "krylov_iters_per_step": iters,
            "newton_iters_per_step": newts,
            "stokes_init_s": round(t_init, 1),
            "first_step_s_incl_compile": round(t_compile_step, 1),
            "dof_step_throughput_per_s": round(n_dofs / median, 1),
            "drag_force": float(ts.drag),
            "lift_force": float(ts.lift),
            "tol": args.tol,
            "schur": args.schur,
            "ir": args.ir,
            "basis": args.basis,
            "lp_cycles": args.lp_cycles,
        },
    }
    print(json.dumps(out))
    return out


def _precond_cfg(args):
    tri_stokes = getattr(args, "tri_stokes", None)
    if (
        args.ir is None
        and args.schur == "mass"
        and args.lp_cycles is None
        and tri_stokes is None
    ):
        return None
    from navier_stokes_solver_tpu.precond import PrecondConfig

    return PrecondConfig(
        krylov_cycle_dtype=args.ir,
        schur_mode=args.schur,
        cc_lp_cycles=args.lp_cycles,
        tri_rel_u_stokes=tri_stokes,
        tri_rel_p_stokes=tri_stokes,
    )


def run_stationary(args):
    setup_jax()
    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
    from navier_stokes_solver_tpu.api.base import PRECONDITIONER_NAMES

    mx, my = (int(v) for v in args.mesh.split(","))
    opts = SolverOptions(
        mesh_size=(mx, my),
        Re=100.0,
        solver_type=1,
        tolerance=args.tol,
        preconditioner_type=args.prec,  # 2 = aSIMPLE (BASELINE config 2)
        verbose=True,
        krylov_basis=max(args.basis, 60),
        precond_config=_precond_cfg(args),
    )
    s = NSSolverStationary(opts)
    s.setup()
    t0 = time.perf_counter()
    s.solve_newton()
    elapsed = time.perf_counter() - t0
    s.compute_lift_drag()
    s.compute_drag_coeff()
    total_k = sum(h.get("krylov_iters", 0) for h in s.history)
    out = {
        "metric": f"stationary_solve_wallclock_{mx}x{my}_Q3Q2_FGMRES_"
        f"{PRECONDITIONER_NAMES[args.prec]}_tol{args.tol:g}_Re100",
        "value": round(elapsed, 3),
        "unit": "s",
        "extra": {
            "n_dofs": s.n_dofs,
            "total_krylov_iters": total_k,
            "drag_coeff": s.drag_coeff,
            "per_solve_iters": [h.get("krylov_iters", 0) for h in s.history],
            "basis": max(args.basis, 60),
            "ir": args.ir,
            "tri_stokes": args.tri_stokes,
            "phase_timings": s.timer.summary(),
        },
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["unsteady", "stationary"])
    ap.add_argument("--mesh", default="300,100")
    ap.add_argument("--re", type=float, default=100.0,
                    help="target Reynolds number (the quasi-steady nu is "
                    "the reference ramp's top, 1+10k <= Re)")
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--krylov-maxiter", type=int, default=100)
    ap.add_argument("--newton-max", type=int, default=3)
    ap.add_argument("--basis", type=int, default=30)
    ap.add_argument("--init-maxiter", type=int, default=60,
                    help="Krylov iterations per device call in the "
                    "host-chunked Stokes init (lower for big meshes so "
                    "one call stays within the TPU per-call budget)")
    ap.add_argument("--init-basis", type=int, default=60,
                    help="restart basis for the Stokes init solve")
    ap.add_argument("--ir", nargs="?", const="float32", default=None,
                    choices=("float32", "mixed"),
                    help="GMRES-IR reduced-precision outer cycles")
    ap.add_argument("--schur", choices=("mass", "cahouet", "pcd"), default="mass")
    ap.add_argument("--lp-cycles", type=int, default=None,
                    help="fixed Lp V-cycles per Schur leg instead of the "
                    "nested Lp solve (PrecondConfig.cc_lp_cycles)")
    ap.add_argument("--prec", type=int, default=2,
                    help="stationary preconditioner id (2 = aSIMPLE, the "
                    "literal BASELINE config-2 pairing; 1 = blockTriangular)")
    ap.add_argument("--tri-stokes", type=float, default=None,
                    help="Stokes-regime-only blockTriangular/aSIMPLE inner "
                    "relative tolerance override (h-flat Stokes outer "
                    "counts at 1e-4; PrecondConfig.tri_rel_*_stokes)")
    ap.add_argument("--consistent", action="store_true",
                    help="Jacobian-consistent Newton continuity rhs "
                    "(stabilizes trajectories against the reference's "
                    "x2-per-step mode; docs/PERF.md round 4)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    out = run_unsteady(args) if args.which == "unsteady" else run_stationary(args)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

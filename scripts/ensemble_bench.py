#!/usr/bin/env python
"""BASELINE config-5 measurement: batched Reynolds-sweep ensemble.

The reference runs parameter sweeps as separate SLURM jobs (one binary
per Reynolds number, run_sim_steady.sh:20-27); the TPU-native analog is
ONE vmap-batched fused unsteady step advancing B simulations at once
(ensemble/sweep.py), optionally sharded over an 'ens' mesh axis on a
pod.  This script measures single-chip ensemble throughput:
member-steps per second and per-member overhead vs a B=1 control.

Host-chunked stepping (one device call per time step) keeps each XLA
execution inside the TPU per-call budget.

Usage:
  python scripts/ensemble_bench.py [--mesh 60,40] [--batch 64]
      [--steps 5] [--tol 1e-9] [--cpu]

Prints one JSON line.
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--newton-max", type=int, default=3)
    ap.add_argument("--krylov-maxiter", type=int, default=200)
    ap.add_argument("--re-min", type=float, default=20.0)
    ap.add_argument("--re-max", type=float, default=100.0)
    ap.add_argument("--schur", default="cahouet",
                    choices=("mass", "cahouet", "pcd"),
                    help="Schur treatment (cahouet keeps the per-member "
                    "outer counts dt-robust, docs/PERF.md)")
    ap.add_argument("--control", action="store_true",
                    help="also time a B=1 run for the batching-overhead ratio")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from navier_stokes_solver_tpu.ensemble.sweep import (
        initial_ensemble_state,
        make_ensemble_step,
    )
    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops import make_disc
    from navier_stokes_solver_tpu.precond import PrecondConfig
    from navier_stokes_solver_tpu.precond.mg import attach_mg
    from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step

    mx, my = (int(v) for v in args.mesh.split(","))
    disc = attach_mg(make_disc(make_fe_space(make_channel_geometry(mx, my), 2, 1)))
    n_dofs = 2 * int(np.prod(disc.NV)) + int(np.prod(disc.NP))
    kw = dict(
        solver_type=1, prec_type=1, tol=args.tol,
        newton_max=args.newton_max, krylov_maxiter=args.krylov_maxiter,
        precond_cfg=PrecondConfig(schur_mode=args.schur, cc_lp_cycles=1),
    )
    B = args.batch
    nus = jnp.asarray(
        1.0 / np.linspace(args.re_min, args.re_max, B), disc.dtype
    )

    step = jax.jit(make_ensemble_step(disc, **kw))
    ts = initial_ensemble_state(disc, B)

    # warm-up step (compile; not timed)
    t0 = time.perf_counter()
    ts = step(ts, nus, args.dt)
    jax.block_until_ready(ts.solution.u)
    compile_s = time.perf_counter() - t0

    per_step = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        ts = step(ts, nus, args.dt)
        jax.block_until_ready(ts.solution.u)
        per_step.append(time.perf_counter() - t0)

    control_s = None
    if args.control:
        sstep = jax.jit(make_time_step(disc, **kw))
        t1 = initial_state(disc)
        t1 = sstep(t1, float(nus[B // 2]), args.dt)  # warm-up
        jax.block_until_ready(t1.solution.u)
        walls = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            t1 = sstep(t1, float(nus[B // 2]), args.dt)
            jax.block_until_ready(t1.solution.u)
            walls.append(time.perf_counter() - t0)
        control_s = float(np.median(walls))

    med = float(np.median(per_step))
    out = {
        "metric": f"ensemble_sweep_{mx}x{my}_B{B}_tol{args.tol}_schur{args.schur}",
        "value": round(B / med, 2),
        "unit": "member-steps/s",
        "extra": {
            "n_dofs_per_member": n_dofs,
            "batch": B,
            "steps_timed": args.steps,
            "per_step_s": [round(v, 3) for v in per_step],
            "median_step_s": round(med, 3),
            "compile_plus_first_step_s": round(compile_s, 1),
            "krylov_iters_last_step": int(np.max(np.asarray(ts.stats.krylov_iters))),
            "drag_finite": bool(np.all(np.isfinite(np.asarray(ts.drag)))),
            "dof_member_steps_per_s": round(n_dofs * B / med, 1),
            "single_run_step_s": control_s,
            "batch_efficiency_vs_single": (
                round(control_s * B / med, 2) if control_s else None
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Strong/weak scaling sweep on the VIRTUAL CPU device mesh.

The single-chip environment cannot produce real multi-chip scaling
walls; what it CAN validate -- and what this harness records so a real
TPU-pod run is turn-key -- is the *solver-side* scaling contract:

* the decomposed solves run the identical algorithm at every tile
  count (shard_map tiles + ppermute seams + seam-weighted psum dots,
  dist/halo.py), so outer Krylov iteration counts must be INVARIANT
  (to roundoff) in the number of tiles -- the quantity that determines
  parallel efficiency once per-tile compute shrinks;
* the per-row artifact uses the reference's exact CSV schema
  (performance_log.csv: ``time,proc,dim_x,dim_y,solver,prec``;
  run_sim_steady.sh:29-37) so the analysis notebook and
  scripts/analyze_performance.py consume it unchanged.

``time`` rows produced here are VIRTUAL-DEVICE walls (8 XLA:CPU
threads emulating devices on however many cores the host has) -- they
are NOT performance claims and the JSON summary labels them so.  On a
real pod, run the same command without --cpu-virtual and the rows
become real.

Usage:
    python scripts/scaling_virtual.py --devices 1,2,4,8 \
        --mesh 64,32 --tol 1e-8 --re 30 --csv scaling_virtual_log.csv
    python scripts/scaling_virtual.py --weak --devices 1,2,4,8 \
        --base 16,10   # ~constant cells/device (weak_scalability_log.csv)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma list of x-strip tile counts")
    ap.add_argument("--mesh", default="64,32", help="strong-scaling mesh")
    ap.add_argument("--base", default="16,10",
                    help="weak mode: per-device mesh (scaled in x)")
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--re", type=float, default=30.0)
    ap.add_argument("--solver", type=int, default=1)
    ap.add_argument("--prec", type=int, default=1)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--degrees", default="3,2")
    ap.add_argument(
        "--simplex", action="store_true",
        help="-M simplex backend (P2/P1 x-strip decomposition, "
        "dist/simplex.py).  Disables the dense Schur legs at EVERY tile "
        "count (they are single-tile-only, so leaving them on at dd=1 "
        "would conflate the backend change with the decomposition)",
    )
    ap.add_argument("--csv", default="scaling_virtual_log.csv")
    ap.add_argument("--no-cpu-virtual", action="store_true",
                    help="use the real platform/devices (pod mode)")
    args = ap.parse_args(argv)

    if not args.no_cpu_virtual:
        ndev = max(int(d) for d in args.devices.split(","))
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(ndev, 8)}"
            ).strip()
    import jax

    if not args.no_cpu_virtual:
        jax.config.update("jax_platforms", "cpu")
        # multi-device XLA:CPU programs must not come from the persistent
        # cache (collective-rendezvous aborts / silent field corruption on
        # cache-loaded executables; tests/conftest.py, CLAUDE.md)
        jax.config.update("jax_compilation_cache_dir", None)

    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions

    dv, dp = (int(v) for v in args.degrees.split(","))
    rows, summary = [], []
    for n in (int(d) for d in args.devices.split(",")):
        if args.weak:
            bx, by = (int(v) for v in args.base.split(","))
            mx, my = bx * n, by
        else:
            mx, my = (int(v) for v in args.mesh.split(","))
        opts = SolverOptions(
            mesh_size=(mx, my), Re=args.re, solver_type=args.solver,
            tolerance=args.tol, preconditioner_type=args.prec,
            degree_velocity=dv, degree_pressure=dp, verbose=False,
            dd=None if n == 1 else (n, 1),
            read_mesh_from_file=args.simplex,
            dense_schur=not args.simplex,
        )
        s = NSSolverStationary(opts)
        s.setup()
        t0 = time.perf_counter()
        s.solve_newton()
        wall = time.perf_counter() - t0
        s.compute_lift_drag()
        iters = sum(h.get("krylov_iters", 0) for h in s.history)
        per_solve = [h.get("krylov_iters") for h in s.history]
        rows.append((round(wall, 3), n, mx, my, args.solver, args.prec))
        summary.append(
            dict(proc=n, mesh=[mx, my], wall_s=round(wall, 3),
                 total_krylov_iters=iters, per_solve_iters=per_solve,
                 drag_force=s.drag_force)
        )
        print(f"  {n} tiles: {iters} outers, wall {wall:.1f} s "
              f"(mesh {mx}x{my})", file=sys.stderr)

    new = not os.path.exists(args.csv)
    with open(args.csv, "a") as f:
        if new:
            f.write("time,proc,dim_x,dim_y,solver,prec\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")

    base_iters = summary[0]["total_krylov_iters"]
    drift = max(
        abs(s_["total_krylov_iters"] - base_iters) for s_ in summary
    )
    print(json.dumps({
        "metric": ("weak" if args.weak else "strong")
        + "_scaling_iteration_invariance",
        "value": drift,
        "unit": "max_outer_iter_drift_vs_1tile",
        "extra": {
            "rows": summary,
            "virtual_devices": not args.no_cpu_virtual,
            "note": (
                "walls are VIRTUAL-device (XLA:CPU thread) times, not "
                "performance claims; the recorded invariant is the outer "
                "iteration count across tile counts"
                if not args.no_cpu_virtual else "real-device walls"
            ),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

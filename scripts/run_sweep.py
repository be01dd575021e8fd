#!/usr/bin/env python
"""Reynolds-sweep ensemble runner.

TPU-native replacement for the reference's per-parameter SLURM jobs
(run_sim_steady.sh sweeps): B unsteady simulations integrate
simultaneously, vmapped over viscosity and (optionally) sharded across the
device mesh's 'ens' axis.  Prints per-member drag/lift histories as JSON.

Usage:
    python scripts/run_sweep.py --re 20,40,60,80 -m 48,16 -T 0.1,0.01
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
    ap.add_argument("--re", default="20,40,60,80",
                    help="comma-separated target Reynolds numbers")
    ap.add_argument("-m", "--mesh-size", default="48,16")
    ap.add_argument("-T", "--timespan-step", default="0.1,0.01")
    ap.add_argument("-s", "--solver", type=int, default=1)
    ap.add_argument("-p", "--preconditioner", type=int, default=2)
    ap.add_argument("-t", "--tolerance", type=float, default=1e-8)
    ap.add_argument("--degrees", default="2,1")
    ap.add_argument("--shard", action="store_true",
                    help="shard members over the device mesh 'ens' axis")
    args = ap.parse_args(argv)

    import jax

    from navier_stokes_solver_tpu.dist import make_mesh
    from navier_stokes_solver_tpu.ensemble.sweep import run_sweep
    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops import make_disc

    res = [float(v) for v in args.re.split(",")]
    # unsteady parity: the fused step solves at the ramp's effective Re
    nus = [1.0 / (1.0 + 10.0 * ((r - 1.0) // 10.0)) if r >= 1 else 1.0 / r
           for r in res]
    nx, ny = (int(v) for v in args.mesh_size.split(","))
    dv, dp = (int(v) for v in args.degrees.split(","))
    T, dt = (float(v) for v in args.timespan_step.split(","))
    n_steps = int(round(T / dt))

    disc = make_disc(make_fe_space(make_channel_geometry(nx, ny), dv, dp))
    mesh = None
    if args.shard:
        n_ens = min(len(nus), len(jax.devices()))
        mesh = make_mesh(n_x=1, n_ens=n_ens)

    t0 = time.perf_counter()
    final, hist = run_sweep(
        disc, nus, dt, n_steps, mesh=mesh,
        solver_type=args.solver, prec_type=args.preconditioner,
        tol=args.tolerance,
    )
    elapsed = time.perf_counter() - t0

    import numpy as np

    out = {
        "wall_s": round(elapsed, 3),
        "n_members": len(nus),
        "n_steps": n_steps,
        "members": [
            {
                "Re_target": res[b],
                "nu": nus[b],
                "drag": np.asarray(hist["drag"])[:, b].tolist(),
                "lift": np.asarray(hist["lift"])[:, b].tolist(),
            }
            for b in range(len(nus))
        ],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

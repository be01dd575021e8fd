#!/usr/bin/env python
"""Reproduction experiment for the reference's only recorded numerical
artifacts: lab_new/lift_drag_data/{drag,lift}_coefficient_0.20.txt.

The artifact: 31 appended lines per file; drag = [4.37332e-05, 326.341,
0 x29], lift = [8.42639e-05, 3.24669, 0 x29]
(drag_coefficient_0.20.txt:1-31).

Reverse-engineering the config (see docs/FIDELITY.md for the full
analysis): the filename Reynolds is ``get_reynolds() = 0.02 / nu``
(NSSolver.cpp:756-758 with U_avg = 0.2), so "0.20" requires nu = 0.1 =
1/10.  The committed unsteady ramp ``current_Re = 1, 11, 21, ...``
(NSSolver.cpp:684) never visits 10, so the artifact predates it; the
stationary solver's ramp *starts* at 10 (NSSolverStationary.cpp:662),
strongly suggesting an earlier unsteady version did too.  This script
replays that trajectory with our parity solver: per-step Newton at
nu = 0.1, reference defaults otherwise (100x100 Q3/Q2 mesh, FGMRES +
blockDiagonal, tol 1e-6 -- test.cpp:25-34), 3 steps of dt = 0.01
(the artifact's information is exhausted by step 2: the trailing 29
zeros are exact zeros, physically impossible for this flow, consistent
with later appended runs on an untagged -M mesh -- the files are opened
with std::ios::app, NSSolver.cpp:989).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="100,100")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--prec", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    mx, my = (int(v) for v in args.mesh.split(","))
    opts = SolverOptions(
        mesh_size=(mx, my),
        Re=10.0,  # with the legacy ramp below this lands on nu = 1/10
        solver_type=1,
        tolerance=args.tol,
        preconditioner_type=args.prec,
        time_span=args.steps * 0.01,
        time_step=0.01,
        verbose=True,
    )
    solver = NSSolver(opts)

    # Legacy-ramp reproduction: current_Re starts at 10 (the stationary
    # ramp start, NSSolverStationary.cpp:662) instead of 1, so the final
    # per-step viscosity is nu = 0.1 and get_reynolds() = 0.20 -- the only
    # assignment consistent with the artifact's filename.
    import navier_stokes_solver_tpu.api.unsteady as unsteady_mod

    orig = unsteady_mod.NSSolver.solve_newton

    def legacy_solve_newton(self, *, ramp=True):
        # ``ramp`` mirrors NSSolver.solve_newton's signature (direct mode,
        # api/unsteady.py); the legacy reproduction always ramps.
        del ramp
        target = self.Re
        self.Re = target  # ramp below
        # replicate solve_newton with ramp start 10
        self.log("=" * 47)
        first = not hasattr(self, "_legacy_started")
        self._legacy_started = True
        current_Re = 10.0
        while current_Re <= target:
            self.nu = 1.0 / current_Re
            self.log(f"Solving for Re = {self.get_reynolds()}")
            n_iter = 0
            residual_norm = self.NEWTON_TOL + 1
            prev_residual = 0.0
            while n_iter < self.NEWTON_MAX_ITERS and residual_norm > self.NEWTON_TOL:
                if not getattr(self, "_legacy_assembled", False):
                    self._legacy_assembled = True
                    stokes_now = n_iter == 0
                    residual_norm = self.assemble_system(
                        stokes_now, lifting=stokes_now and self.apply_first
                    )
                else:
                    stokes_now = False
                    residual_norm = self.assemble_system(False, lifting=False)
                prev_residual = (
                    residual_norm + 1 if n_iter == 0 else prev_residual
                )
                self.log(f"Newton {n_iter} ||r|| = {residual_norm:.6e}")
                if residual_norm > self.NEWTON_TOL:
                    k = self.solve_system(
                        stokes_now, lifting=stokes_now and self.apply_first
                    )
                    if k == 0:
                        break
                    ev = self.solution
                    alpha = 1.0
                    while alpha > 1e-12:
                        self.solution = self.K.update_solution(
                            ev, self.delta, alpha
                        )
                        residual_norm = self.assemble_system(False, lifting=False)
                        if residual_norm <= prev_residual:
                            break
                        alpha *= 0.1
                    prev_residual = residual_norm
                else:
                    break
                n_iter += 1
            current_Re += 10.0

    unsteady_mod.NSSolver.solve_newton = legacy_solve_newton
    try:
        solver.setup()
        solver.solve()
    finally:
        unsteady_mod.NSSolver.solve_newton = orig

    steps = [h for h in solver.history if h.get("phase") == "step"]
    drag = [h["drag_coeff"] for h in steps]
    lift = [h["lift_coeff"] for h in steps]
    print("reynolds (filename key):", f"{solver.get_reynolds():.2f}")
    print("drag_coeff history:", drag)
    print("lift_coeff history:", lift)
    ref_drag = [4.37332e-05, 326.341]
    ref_lift = [8.42639e-05, 3.24669]
    print("reference artifact :", ref_drag, ref_lift)
    out = {
        "reynolds": solver.get_reynolds(),
        "drag": drag,
        "lift": lift,
        "ref_drag": ref_drag,
        "ref_lift": ref_lift,
        "mesh": [mx, my],
        "tol": args.tol,
        "prec": args.prec,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()

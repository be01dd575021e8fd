#!/usr/bin/env python
"""Time the assemble_kernel at the bench shape under the current
NSTPU_MATMUL_PRECISION setting (A/B harness for the f64-assemble
precision-sensitivity question; see docs/PERF.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")


def main():
    import jax

    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
    from navier_stokes_solver_tpu.api.kernels import assemble_kernel

    prec = os.environ.get("NSTPU_MATMUL_PRECISION", "float32")
    opts = SolverOptions(
        mesh_size=(100, 70), degree_velocity=3, degree_pressure=2, Re=100.0
    )
    solver = NSSolverStationary(opts)
    solver.setup()
    disc, st = solver.disc, solver.solution

    for stokes in (True, False):
        # warm-up / compile
        rhs, rn = assemble_kernel(
            disc, 0.01, 0.0, st, st.u, 1.0, stokes=stokes
        )
        rn.block_until_ready()
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            rhs, rn = assemble_kernel(
                disc, 0.01, 0.0, st, st.u, 1.0, stokes=stokes
            )
        rn.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(
            f"precision={prec} stokes={stokes}: {dt * 1e3:.1f} ms/call "
            f"(rn={float(rn):.6e})",
            flush=True,
        )


if __name__ == "__main__":
    main()

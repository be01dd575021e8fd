"""TPU-native incompressible Navier-Stokes framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
HliasGit/navier_stokes_solver reference (deal.II/Trilinos/MPI, C++):
stationary and time-dependent solves of the 2D incompressible
Navier-Stokes equations on the Schaefer-Turek "flow past a cylinder in a
channel" geometry, with Newton linearization + backtracking line search,
Reynolds/inlet continuation, selectable Krylov methods (GMRES / FGMRES /
BiCGStab) over the 2x2 block system, and three block preconditioners
(blockDiagonal, blockTriangular, aSIMPLE).

Architecture (TPU-first, not a port):
  - matrix-free cell-local operator application on a structured quad grid
    (stride-slice gather + batched einsum + dilated-pad scatter; no global
    sparse matrix is ever assembled)  [replaces deal.II/Trilinos assembly+SpMV]
  - jit-compiled Krylov iterations as ``lax.while_loop`` over (u, p) pytrees
  - domain decomposition via ``jax.sharding`` / ``shard_map`` over a device
    mesh (the analog of the reference's MPI rank decomposition)
  - fp64 by default (the reference's tolerances go down to 1e-12), with an
    fp32 path for throughput experiments.

Reference parity citations use the form ``file:line`` against the mounted
reference repo (e.g. ``NSSolver.cpp:313``).
"""

import os

# The reference solves with absolute tolerances down to 1e-12
# (performance_analysis.ipynb strong-scaling setup); fp64 is required.
# Set NSTPU_DISABLE_X64=1 to experiment with fp32-only throughput.
if not os.environ.get("NSTPU_DISABLE_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# TPU MXU passes for f32 contractions: XLA's DEFAULT precision lowers
# f32 dot/einsum operands to single-pass bfloat16 multiplies on TPU, so
# the "f32" preconditioner vmult (PrecondConfig.vmult_dtype), the MG
# V-cycle and the GMRES-IR f32 restart cycles were silently running
# bf16-quality arithmetic on device -- weaker inner solves / Arnoldi
# subspaces and h-inflated outer iteration counts relative to the same
# f32 program on CPU (true f32 there; measured at the 100x70 bench:
# 1744 TPU outers vs 697 CPU-predicted for the identical config).
# "float32" = HIGHEST (6-pass bf16 emulation of full f32); set
# NSTPU_MATMUL_PRECISION=bfloat16_3x (HIGH) or =default to experiment.
# f64 contractions are unaffected by this flag.
_prec = os.environ.get("NSTPU_MATMUL_PRECISION", "float32")
if _prec != "default":
    import jax

    jax.config.update("jax_default_matmul_precision", _prec)

# Persistent compilation cache: the nested-Krylov programs are large and the
# (remote) TPU compiler is slow; cache compiled executables across processes.
if not os.environ.get("NSTPU_DISABLE_COMPILE_CACHE"):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

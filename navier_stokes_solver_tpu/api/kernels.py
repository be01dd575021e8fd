"""Jit-compiled device kernels shared by the solver classes.

The fidelity path keeps the reference's *outer* control flow (continuation,
Newton, line search -- small trip counts, data-dependent) on the host, while
every numerical step below it (assembly-equivalent residual evaluation,
Krylov solves with nested preconditioner solves) is a single compiled XLA
program.  The fused fully-on-device step for the performance path lives in
``timeloop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.krylov import bicgstab, fgmres, gmres
from navier_stokes_solver_tpu.ops import Blocks, matfree, norm
from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.precond import (
    LinearContext,
    make_krylov_lo,
    make_preconditioner,
)


def _ops_for(disc):
    """Backend kernels: structured lattice (matfree) or simplex mesh."""
    if isinstance(disc, Disc):
        return matfree
    from navier_stokes_solver_tpu.unstructured import ops as simplex_ops

    return simplex_ops

__all__ = [
    "assemble_kernel",
    "solve_kernel",
    "solve_kernel_lu",
    "update_solution",
    "lift_drag_kernel",
    "LU_COMPILER_OPTIONS",
]

_SOLVERS = {0: gmres, 1: fgmres, 2: bicgstab}

# Scoped-VMEM headroom for programs containing the dense LU
# factorization (PrecondConfig.direct_lu): XLA:TPU's
# ``LuDecompositionBlock`` custom call stages an [n, 128] panel (plus
# pivot vectors) in scoped VMEM, which exceeds the default 16 MiB limit
# for n >~ 15k -- measured 21.6 MiB at n = 21,997 (the 60x40 -M disc),
# "Ran out of memory in memory space vmem".  48 MiB compiles and runs
# correctly (v5e VMEM is 128 MiB).  The option is TPU-only (CPU/GPU
# clients reject it), so the LU-enabled jits below attach it lazily
# after the backend is known -- never at import (no device query).
LU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 49152}


def lu_compiler_options():
    """``LU_COMPILER_OPTIONS`` on the tpu backend, else None."""
    return LU_COMPILER_OPTIONS if jax.default_backend() == "tpu" else None


@partial(jax.jit, static_argnames=("stokes", "consistent"))
def assemble_kernel(
    disc, nu, inv_dt, st: Blocks, u_old, inlet_amp, *, stokes,
    consistent=False,
):
    """Residual assembly + norm (the reference's assemble_system + l2_norm,
    NSSolver.cpp:700-707).  ``consistent`` flips the Newton continuity rhs
    to the Jacobian-consistent sign (matfree.py::residual)."""
    ops = _ops_for(disc)
    linq = None if stokes else ops.eval_state(disc, st)
    dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    rhs = ops.residual(
        disc, nu, inv_dt, st, u_old, dF, stokes=stokes, inlet_amp=inlet_amp,
        consistent=consistent,
    )
    return rhs, norm(rhs)


_SOLVE_STATIC = (
    "stokes", "solver_type", "prec_type", "variant", "precond_cfg", "basis",
)


def _solve_kernel(
    disc,
    nu,
    inv_dt,
    st: Blocks,
    rhs: Blocks,
    delta_prev: Blocks,
    inlet_amp,
    tol,
    *,
    stokes: bool,
    solver_type: int,
    prec_type: int,
    variant: str,
    maxiter: int,
    project_x0: bool = True,
    precond_cfg=None,
    basis: int = 30,
):
    """One tangent solve (NSSolver::solve_system, NSSolver.cpp:601-672).

    The Krylov initial guess mirrors deal.II's ``apply_boundary_values``
    side effect: constrained entries of the persistent ``delta_owned`` are
    set to the boundary values, interior entries warm-start from the
    previous solve.  ``project_x0=False`` skips that projection -- used by
    continuation chunks of one logical solve, whose iterate must pass
    through untouched.  The flag is *traced* (a device select, not part of
    the jit cache key): the first-chunk and continuation-chunk dispatches
    of a tangent solve share one compiled program, halving the number of
    large executables the remote TPU worker must load per run (each load
    measured ~10-18 s at the bench size; docs/PERF.md).  ``maxiter`` is
    traced too -- it only gates ``lax.while_loop`` conditions, so chunked
    dispatches of any length (including the final partial chunk) reuse the
    same executable.
    """
    ops = _ops_for(disc)
    linq = None if stokes else ops.eval_state(disc, st)
    dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    ctx = LinearContext(
        disc=disc, nu=nu, inv_dt=inv_dt, stokes=stokes, linq=linq, diag_f=dF,
        state_u=None if stokes else st.u, ops=ops,
    )
    M = make_preconditioner(prec_type, ctx, variant=variant, cfg=precond_cfg)

    def A(x: Blocks) -> Blocks:
        return ops.apply_jacobian(disc, nu, inv_dt, linq, dF, x, stokes=stokes)

    proj = jnp.asarray(project_x0, dtype=bool)
    g = ops.dirichlet_values(disc, inlet_amp)
    x0u = jnp.where(disc.u_dirichlet, g, delta_prev.u)
    u_active = getattr(disc, "u_active", None)
    if u_active is not None:
        x0u = jnp.where(u_active, x0u, 0.0)
        x0p = jnp.where(disc.p_active, delta_prev.p, 0.0)
    else:
        x0p = delta_prev.p
    x0 = Blocks(
        u=jnp.where(proj, x0u, delta_prev.u),
        p=jnp.where(proj, x0p, delta_prev.p),
    )

    kw = {} if solver_type == 2 else {"basis": basis}  # bicgstab: no basis
    if solver_type != 2:
        # GMRES-IR: optional reduced-precision restart cycles
        # (PrecondConfig.krylov_cycle_dtype; None for bicgstab)
        kw["lo"] = make_krylov_lo(
            prec_type, ctx, variant=variant, cfg=precond_cfg
        )
    delta, info = _SOLVERS[solver_type](
        A, rhs, x0, tol=tol, maxiter=maxiter, M=M, **kw
    )
    return delta, info


solve_kernel = jax.jit(_solve_kernel, static_argnames=_SOLVE_STATIC)

_solve_kernel_lu_jit = None


def solve_kernel_lu(*args, **kwargs):
    """``solve_kernel`` compiled with scoped-VMEM headroom for the dense
    LU custom call (identical program; TPU-only compiler option attached
    lazily once the backend is known)."""
    global _solve_kernel_lu_jit
    if _solve_kernel_lu_jit is None:
        _solve_kernel_lu_jit = jax.jit(
            _solve_kernel,
            static_argnames=_SOLVE_STATIC,
            compiler_options=lu_compiler_options(),
        )
    return _solve_kernel_lu_jit(*args, **kwargs)


@jax.jit
def update_solution(evaluation_point: Blocks, delta: Blocks, alpha) -> Blocks:
    """solution = evaluation_point + alpha * delta (NSSolver.cpp:729-731)."""
    return Blocks(
        u=evaluation_point.u + alpha * delta.u,
        p=evaluation_point.p + alpha * delta.p,
    )


@jax.jit
def lift_drag_kernel(disc, nu, st: Blocks):
    return _ops_for(disc).lift_drag_forces(disc, nu, st)

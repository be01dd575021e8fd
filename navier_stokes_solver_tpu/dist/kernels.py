"""Sharded host-driven solver kernels (distributed stationary/unsteady path).

The reference runs its benchmarks distributed at every rank count through
the ordinary solver path (NSSolverStationary.cpp:579-647 under MPI,
performance_log.csv; the ``-M`` unsteady run on 128 ranks,
run_sim_unsteady.sh:21 with partitioning NSSolver.cpp:144-209); here the
same host-driven lifecycle (``NSSolverBase`` continuation / Newton / line
search) drives tangent solves whose every numerical step runs inside one
``shard_map`` region over the device mesh: cell-local operators with
``ppermute`` seam exchanges, seam-weighted ``psum`` inner products, the
decomposed preconditioner (geometric-MG chain on the structured lattice,
``dist.halo.decompose_disc``; P2->P1 p-MG strips on the ``-M`` simplex
backend, ``dist.simplex.decompose_simplex_disc``), and ``psum``-reduced
lift/drag.

``DistKernels`` mirrors the ``api.kernels`` module surface, so the solver
classes switch between single-chip and distributed execution by swapping
one attribute (``NSSolverBase.K``).  State (solution / rhs / delta) is held
tile-stacked ``[n_tiles, ...]`` and sharded over the mesh axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from navier_stokes_solver_tpu.krylov import bicgstab, fgmres, gmres
from navier_stokes_solver_tpu.ops import Blocks, matfree
from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.precond import (
    LinearContext,
    make_krylov_lo,
    make_preconditioner,
)


def _backend_ops(sdisc):
    """Backend kernel module (mirrors api.kernels._ops_for)."""
    if isinstance(sdisc, Disc):
        return matfree
    from navier_stokes_solver_tpu.unstructured import ops as simplex_ops

    return simplex_ops

try:  # JAX >= 0.6
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["DistKernels"]

_SOLVERS = {0: gmres, 1: fgmres, 2: bicgstab}


def _tile(tree):
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _stack(tree):
    return jax.tree_util.tree_map(lambda a: a[None], tree)


class DistKernels:
    """Drop-in replacement for ``api.kernels`` over a decomposed Disc."""

    def __init__(self, sdisc, mesh: Mesh):
        self.ops = _backend_ops(sdisc)
        axes = tuple(
            a
            for a, n in (
                (sdisc.halo_axis_y, sdisc.halo_ny),
                (sdisc.halo_axis, sdisc.halo_n),
            )
            if a is not None and n > 1
        )
        self.mesh = mesh
        self.spec = P() if not axes else P(axes if len(axes) > 1 else axes[0])
        self._jit_cache: dict = {}

    # -- helpers -------------------------------------------------------
    def _smap(self, fn, n_sharded: int, n_scalar: int, out_specs):
        """shard_map with ``n_sharded`` tile-stacked args followed by
        ``n_scalar`` replicated scalars."""
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(self.spec,) * n_sharded + (P(),) * n_scalar,
            out_specs=out_specs,
            check_vma=False,
        )

    # -- api.kernels surface -------------------------------------------
    def assemble_kernel(
        self, sdisc, nu, inv_dt, st, u_old, inlet_amp, *, stokes,
        consistent=False,
    ):
        key = ("assemble", stokes, consistent)
        if key not in self._jit_cache:
            ops = self.ops

            def local(sdisc_sh, st_sh, u_old_sh, nu, inv_dt, inlet_amp):
                disc = _tile(sdisc_sh)
                st = _tile(st_sh)
                u_old = _tile(u_old_sh)
                linq = None if stokes else ops.eval_state(disc, st)
                dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
                rhs = ops.residual(
                    disc, nu, inv_dt, st, u_old, dF,
                    stokes=stokes, inlet_amp=inlet_amp,
                    consistent=consistent,
                )
                dot = ops.make_dot(disc)
                rn = jnp.sqrt(dot(rhs, rhs))
                return _stack(rhs), rn

            self._jit_cache[key] = jax.jit(
                self._smap(local, 3, 3, (self.spec, P()))
            )
        return self._jit_cache[key](sdisc, st, u_old, nu, inv_dt, inlet_amp)

    def solve_kernel(
        self,
        sdisc,
        nu,
        inv_dt,
        st,
        rhs,
        delta_prev,
        inlet_amp,
        tol,
        *,
        stokes,
        solver_type,
        prec_type,
        variant,
        maxiter,
        project_x0=True,
        precond_cfg=None,
        basis=30,
    ):
        key = (
            "solve", stokes, solver_type, prec_type, variant,
            precond_cfg, basis,
        )
        if key not in self._jit_cache:
            ops = self.ops

            def local(
                sdisc_sh, st_sh, rhs_sh, delta_sh,
                nu, inv_dt, inlet_amp, tol, proj, maxiter,
            ):
                disc = _tile(sdisc_sh)
                st = _tile(st_sh)
                rhs = _tile(rhs_sh)
                delta_prev = _tile(delta_sh)
                linq = None if stokes else ops.eval_state(disc, st)
                dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
                ctx = LinearContext(
                    disc=disc, nu=nu, inv_dt=inv_dt, stokes=stokes,
                    linq=linq, diag_f=dF,
                    state_u=None if stokes else st.u, ops=ops,
                )
                M = make_preconditioner(
                    prec_type, ctx, variant=variant, cfg=precond_cfg
                )

                def A(x):
                    return ops.apply_jacobian(
                        disc, nu, inv_dt, linq, dF, x, stokes=stokes
                    )

                # traced first-chunk flag: one compiled program serves the
                # projected first chunk and the continuation chunks (see
                # api.kernels.solve_kernel)
                g = ops.dirichlet_values(disc, inlet_amp)
                x0u = jnp.where(disc.u_dirichlet, g, delta_prev.u)
                u_active = getattr(disc, "u_active", None)
                if u_active is not None:
                    x0u = jnp.where(u_active, x0u, 0.0)
                    x0p = jnp.where(disc.p_active, delta_prev.p, 0.0)
                else:  # simplex backend: every kept node is active
                    x0p = delta_prev.p
                x0 = Blocks(
                    u=jnp.where(proj, x0u, delta_prev.u),
                    p=jnp.where(proj, x0p, delta_prev.p),
                )

                kw = {} if solver_type == 2 else {"basis": basis}
                if solver_type != 2:
                    kw["lo"] = make_krylov_lo(
                        prec_type, ctx, variant=variant, cfg=precond_cfg
                    )
                delta, info = _SOLVERS[solver_type](
                    A, rhs, x0, tol=tol, maxiter=maxiter, M=M,
                    dot=ops.make_dot(disc), **kw
                )
                return _stack(delta), info

            self._jit_cache[key] = jax.jit(
                self._smap(local, 4, 6, (self.spec, P()))
            )
        return self._jit_cache[key](
            sdisc, st, rhs, delta_prev, nu, inv_dt, inlet_amp, tol,
            jnp.asarray(project_x0, dtype=bool), jnp.asarray(maxiter),
        )

    def update_solution(self, evaluation_point, delta, alpha):
        # elementwise: safe on the stacked/sharded layout directly
        from navier_stokes_solver_tpu.api.kernels import update_solution

        return update_solution(evaluation_point, delta, alpha)

    def lift_drag_kernel(self, sdisc, nu, st):
        key = ("lift_drag",)
        if key not in self._jit_cache:
            ops = self.ops

            def local(sdisc_sh, st_sh, nu):
                disc = _tile(sdisc_sh)
                st = _tile(st_sh)
                return ops.lift_drag_forces(disc, nu, st)

            self._jit_cache[key] = jax.jit(self._smap(local, 2, 1, (P(), P())))
        return self._jit_cache[key](sdisc, st, nu)

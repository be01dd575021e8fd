"""Fused on-device Newton / implicit-Euler stepping.

Differences from the host-driven fidelity path (api.unsteady), by design:

  * no per-step Reynolds continuation ramp -- the fused step solves at the
    target viscosity directly, warm-started from the previous step (the ramp
    only matters for cold starts, which ``make_stokes_init`` covers);
  * Newton, backtracking line search (accept on ||r|| <= prev,
    NSSolver.cpp:727-742) and the Krylov stagnation break (iters == 0)
    run inside ``lax.while_loop``s;
  * lift/drag (NSSolver.cpp:839-938) is computed on device each step and
    streamed out of ``lax.scan``.

Everything here is ensemble-friendly: ``nu`` / ``dt`` are runtime scalars, so
``jax.vmap`` over a batch of states + viscosities gives the Reynolds-sweep
mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from navier_stokes_solver_tpu.krylov import bicgstab, fgmres, gmres
from navier_stokes_solver_tpu.ops import Blocks, make_dot, matfree
from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.precond import LinearContext, make_preconditioner


def _ops_for(disc):
    """Backend kernels: structured lattice (matfree) or simplex mesh
    (mirrors api.kernels._ops_for; kept local to avoid importing the api
    package from the timeloop layer)."""
    if isinstance(disc, Disc):
        return matfree
    from navier_stokes_solver_tpu.unstructured import ops as simplex_ops

    return simplex_ops

__all__ = [
    "TimeState",
    "StepStats",
    "initial_state",
    "make_time_step",
    "make_stokes_init",
    "run_time_loop",
]

_SOLVERS = {0: gmres, 1: fgmres, 2: bicgstab}


class StepStats(NamedTuple):
    newton_iters: jax.Array
    krylov_iters: jax.Array  # total across Newton iterations
    final_residual: jax.Array


class TimeState(NamedTuple):
    solution: Blocks
    time: jax.Array
    step: jax.Array
    drag: jax.Array
    lift: jax.Array
    stats: StepStats


def initial_state(disc) -> TimeState:
    zero = Blocks(u=disc.zeros_u(), p=disc.zeros_p())
    z = jnp.zeros((), disc.dtype)
    return TimeState(
        solution=zero,
        time=z,
        step=jnp.zeros((), jnp.int32),
        drag=z,
        lift=z,
        stats=StepStats(
            newton_iters=jnp.zeros((), jnp.int32),
            krylov_iters=jnp.zeros((), jnp.int32),
            final_residual=z,
        ),
    )


def _solve_tangent(
    disc,
    nu,
    inv_dt,
    sol: Blocks,
    rhs: Blocks,
    delta0: Blocks,
    *,
    stokes,
    solver_type,
    prec_type,
    tol,
    maxiter,
    variant="unsteady",
    basis=30,
    precond_cfg=None,
):
    from navier_stokes_solver_tpu.precond import make_krylov_lo

    ops = _ops_for(disc)
    linq = None if stokes else ops.eval_state(disc, sol)
    dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    ctx = LinearContext(
        disc=disc, nu=nu, inv_dt=inv_dt, stokes=stokes, linq=linq, diag_f=dF,
        state_u=None if stokes else sol.u, ops=ops,
    )
    M = make_preconditioner(prec_type, ctx, variant=variant, cfg=precond_cfg)
    A = lambda x: ops.apply_jacobian(
        disc, nu, inv_dt, linq, dF, x, stokes=stokes
    )
    kw = {} if solver_type == 2 else {"basis": basis}
    if solver_type != 2:
        kw["lo"] = make_krylov_lo(
            prec_type, ctx, variant=variant, cfg=precond_cfg
        )
    return _SOLVERS[solver_type](
        A, rhs, delta0, tol=tol, maxiter=maxiter, M=M, dot=make_dot(disc), **kw
    )


def make_time_step(
    disc: Disc,
    *,
    solver_type: int = 1,
    prec_type: int = 1,
    tol: float = 1e-9,
    newton_max: int = 10,
    newton_tol: float = 1e-9,
    krylov_maxiter: int = 2000,
    inlet_amp: float = 0.3,
    basis: int = 30,
    precond_cfg=None,
    consistent: bool = False,
):
    """Build ``step(state, nu, dt) -> TimeState`` (jit/vmap/shard friendly).

    ``inlet_amp``: inlet amplitude U_m lifted into the Dirichlet rows on
    the very first assembly of the run (``apply_first`` semantics,
    NSSolver.cpp:573-580; U_m = 0.3 per NSSolver.hpp:88); afterwards the
    increment formulation keeps boundary updates at zero.

    ``consistent``: Jacobian-consistent Newton continuity rhs
    (ops/matfree.py::residual) -- stabilizes long trajectories against the
    reference's exactly-x2-per-step divergence mode."""

    ops = _ops_for(disc)

    def assemble(sol: Blocks, u_old, nu, inv_dt, amp=0.0):
        dot = make_dot(disc)
        linq = ops.eval_state(disc, sol)
        dF = ops.diag_F(disc, nu, inv_dt, linq, stokes=False)
        rhs = ops.residual(
            disc, nu, inv_dt, sol, u_old, dF, stokes=False, inlet_amp=amp,
            consistent=consistent,
        )
        return rhs, jnp.sqrt(dot(rhs, rhs))

    def step(ts: TimeState, nu, dt) -> TimeState:
        inv_dt = 1.0 / dt
        u_old = ts.solution.u

        amp0 = jnp.where(ts.step == 0, inlet_amp, 0.0)
        rhs0, rn0 = assemble(ts.solution, u_old, nu, inv_dt, amp0)

        def newton_cond(c):
            sol, rhs, rn, prev, n_iter, kry, stall = c
            return (n_iter < newton_max) & (rn > newton_tol) & (~stall)

        def newton_body(c):
            sol, rhs, rn, prev, n_iter, kry, stall = c
            prev = jnp.where(n_iter == 0, rn + 1.0, prev)
            delta, info = _solve_tangent(
                disc,
                nu,
                inv_dt,
                sol,
                rhs,
                Blocks(u=jnp.zeros_like(sol.u), p=jnp.zeros_like(sol.p)),
                stokes=False,
                solver_type=solver_type,
                prec_type=prec_type,
                tol=tol,
                maxiter=krylov_maxiter,
                basis=basis,
                precond_cfg=precond_cfg,
            )
            stall = info.iters == 0

            # backtracking line search (NSSolver.cpp:727-742)
            def ls_cond(l):
                alpha, best_sol, best_rhs, best_rn, accepted = l
                return (~accepted) & (alpha > 1e-12)

            def ls_body(l):
                alpha, _, _, _, _ = l
                trial = Blocks(
                    u=sol.u + alpha * delta.u, p=sol.p + alpha * delta.p
                )
                t_rhs, t_rn = assemble(trial, u_old, nu, inv_dt)
                accepted = t_rn <= prev
                return (alpha * 0.1, trial, t_rhs, t_rn, accepted)

            _, new_sol, new_rhs, new_rn, _ = lax.while_loop(
                ls_cond, ls_body, (jnp.asarray(1.0, rn.dtype), sol, rhs, rn, False)
            )
            return (
                new_sol,
                new_rhs,
                new_rn,
                new_rn,
                n_iter + 1,
                kry + info.iters,
                stall,
            )

        sol, rhs, rn, prev, n_iter, kry, stall = lax.while_loop(
            newton_cond,
            newton_body,
            (ts.solution, rhs0, rn0, rn0 + 1.0, jnp.int32(0), jnp.int32(0), False),
        )

        drag, lift = ops.lift_drag_forces(disc, nu, sol)
        return TimeState(
            solution=sol,
            time=ts.time + dt,
            step=ts.step + 1,
            drag=drag,
            lift=lift,
            stats=StepStats(
                newton_iters=n_iter, krylov_iters=kry, final_residual=rn
            ),
        )

    return step


def make_stokes_init(
    disc: Disc,
    *,
    solver_type: int = 1,
    prec_type: int = 1,
    tol: float = 1e-9,
    krylov_maxiter: int = 2000,
    inlet_amp: float = 0.3,
    basis: int = 30,
    precond_cfg=None,
):
    """Cold-start Stokes solve with the inlet profile lifted (the reference's
    first Newton iteration of the first time step, NSSolver.cpp:695-706)."""

    ops = _ops_for(disc)

    def init(nu) -> Blocks:
        dF = ops.diag_F(disc, nu, 0.0, None, stokes=True)
        rhs = ops.residual(
            disc,
            nu,
            0.0,
            None,
            disc.zeros_u(),
            dF,
            stokes=True,
            inlet_amp=inlet_amp,
        )
        g = ops.dirichlet_values(disc, inlet_amp)
        x0 = Blocks(
            u=jnp.where(disc.u_dirichlet, g, 0.0),
            p=disc.zeros_p(),
        )
        zero = Blocks(u=jnp.zeros_like(x0.u), p=jnp.zeros_like(x0.p))
        sol, _ = _solve_tangent(
            disc,
            nu,
            0.0,
            zero,
            rhs,
            x0,
            stokes=True,
            solver_type=solver_type,
            prec_type=prec_type,
            tol=tol,
            maxiter=krylov_maxiter,
            basis=basis,
            precond_cfg=precond_cfg,
        )
        return sol

    return init


def run_time_loop(
    step_fn, ts0: TimeState, nu, dt, n_steps: int, *, chunk: int | None = None,
    progress=None, on_chunk=None, compiler_options=None,
):
    """Run ``n_steps`` implicit-Euler steps as ``lax.scan``s; streams
    per-step (drag, lift, newton_iters, krylov_iters).

    ``chunk``: steps per device call.  The TPU runtime kills single XLA
    executions running longer than a few minutes; chunking bounds the
    per-call device time with host-carried state between calls --
    *bitwise* identical to one long scan (the chunk boundary only cuts the
    scan carry, it does not change any step's computation).  At most two
    programs compile (the chunk length and one remainder).  None = one
    scan over all steps.

    ``progress``: optional ``fn(steps_done, n_steps, chunk_wall_s)``
    called after each retired chunk (host side; chunked path only) --
    lets long runs log per-dispatch walls so a worker fault is
    attributable to the step that hit it.

    ``on_chunk``: optional ``fn(ts, out_host)`` called after each retired
    chunk with the current ``TimeState`` and that chunk's host-fetched
    per-step outputs ``(drag, lift, newton_iters, krylov_iters)`` --
    the checkpoint hook for elastic restart of long runs.

    ``compiler_options``: per-compile XLA options for the scan programs
    (the direct-LU scoped-VMEM headroom, api/kernels.py); None keeps the
    default eager-``lax.scan`` compilation path unchanged.
    """

    def body(ts, _):
        ts = step_fn(ts, nu, dt)
        out = (ts.drag, ts.lift, ts.stats.newton_iters, ts.stats.krylov_iters)
        return ts, out

    def scan_k(ts, k):
        return lax.scan(body, ts, None, length=k)

    if compiler_options is not None:
        scan_k = jax.jit(
            scan_k, static_argnums=(1,), compiler_options=compiler_options
        )

    # on_chunk (the checkpoint hook) must fire even when a single chunk
    # covers the whole call (e.g. max_steps_this_call == chunk_steps) --
    # only the hook-free case may take the unchunked fast path
    if (chunk is None or chunk >= n_steps) and on_chunk is None:
        final, (drag, lift, ni, ki) = scan_k(ts0, n_steps)
    else:
        import time as _time

        import numpy as np

        ts = ts0
        outs = []
        remaining = n_steps
        while remaining > 0:
            k = min(chunk or n_steps, remaining)
            t0 = _time.perf_counter()
            ts, out = scan_k(ts, k)
            # retire this device call before the next dispatch with a REAL
            # device->host value fetch: under the remote (axon) runtime
            # block_until_ready returns before the execution has actually
            # completed, so 31 chunk dispatches would queue up and occupy
            # the worker back-to-back for tens of minutes -- which is
            # exactly the unattended-execution pattern the worker kills
            # (observed: per-chunk walls of 0.0 s followed by UNAVAILABLE
            # at the final fetch).  Fetching the (tiny) per-step outputs
            # both bounds the queue depth to one in-flight program and
            # streams the stats to the host as the run progresses, so no
            # device buffers accumulate across dispatches and a later
            # worker fault cannot lose already-completed steps.
            out_host = jax.device_get(out)
            outs.append(out_host)
            remaining -= k
            if on_chunk is not None:
                on_chunk(ts, out_host)
            if progress is not None:
                progress(n_steps - remaining, n_steps,
                         _time.perf_counter() - t0)
        final = ts
        drag, lift, ni, ki = (
            np.concatenate([np.atleast_1d(np.asarray(o[i])) for o in outs])
            for i in range(4)
        )
    return final, {
        "drag": drag,
        "lift": lift,
        "newton_iters": ni,
        "krylov_iters": ki,
    }

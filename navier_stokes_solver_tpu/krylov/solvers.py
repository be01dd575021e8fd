"""Krylov solvers as jit-compiled ``lax.while_loop`` iterations over pytrees.

Semantics mirror the deal.II solvers the reference dispatches to
(NSSolver.cpp:601-672):

  * absolute tolerance on the residual norm (``SolverControl(maxit, tol)``;
    the CLI ``-t`` flag is an absolute tolerance);
  * an initial check at step 0 -- a converged initial guess reports 0
    iterations, which the reference's Newton loop uses as a stagnation
    signal (NSSolver.cpp:721-722);
  * GMRES is left-preconditioned with a restart basis of 30 vectors
    (deal.II ``SolverGMRES`` defaults; its convergence check sees the
    preconditioned residual), FGMRES is right-preconditioned (basis 30),
    BiCGStab and CG monitor the true residual.

All operators/preconditioners are callables ``x -> y`` over arbitrary
pytrees (here: ``Blocks`` or bare velocity/pressure arrays).  Everything is
fixed-shape: Krylov bases are stacked leading-dimension pytrees updated with
``dynamic_update_index_in_dim``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["SolveInfo", "LowCycle", "gmres", "fgmres", "bicgstab", "cg"]

Op = Callable


class LowCycle(NamedTuple):
    """Low-precision restart-cycle configuration for GMRES-IR.

    Restarted GMRES recomputes the true residual at every restart; running
    the Arnoldi cycles in reduced precision while keeping that restart
    residual (and the solution accumulation) in the operator precision is
    exactly GMRES-based iterative refinement (Carson & Higham, SIAM
    J. Sci. Comput. 40(2), 2018).  On TPU f64 is emulated, so f32 cycles
    cut the per-iteration cost of the matvec, the basis updates and the
    orthogonalization contractions by the emulation factor while the
    converged residual still reaches f64 tolerances.

    ``matvec``/``M``/``dot`` operate in ``dtype``.  ``eta`` floors the
    in-cycle (estimated) residual reduction: a single f32 cycle cannot
    meaningfully reduce the residual below ~eps_f32 relative to the restart
    residual, so the cycle stops early at ``eta * beta`` and returns to the
    f64 restart.  ``stall``: if a full cycle fails to reduce the true
    residual below ``stall *`` its previous value, the solve stops reporting
    non-convergence (callers fall back to full-precision cycles).
    """

    matvec: Op
    M: Op | None = None
    dot: Op | None = None
    dtype: Any = None  # default float32
    eta: float = 1e-6
    stall: float = 0.99


class SolveInfo(NamedTuple):
    iters: jax.Array  # int32: deal.II solver_control.last_step()
    converged: jax.Array  # bool: res <= tol AND finite (never true on breakdown)
    resnorm: jax.Array  # final (estimated) residual norm
    # bool: the iteration broke down (non-finite residual / vanishing pivot)
    # before reaching the tolerance -- deal.II's SolverControl would throw
    # ``NoConvergence`` here (check_failure); callers must not treat the
    # returned iterate as a converged solve.
    failed: jax.Array = jnp.bool_(False)


# ---------------------------------------------------------------------------
# pytree vector helpers
# ---------------------------------------------------------------------------


def tvdot(x, y):
    leaves_x = jax.tree_util.tree_leaves(x)
    leaves_y = jax.tree_util.tree_leaves(y)
    return sum(jnp.vdot(a, b) for a, b in zip(leaves_x, leaves_y))


def tnorm(x):
    return jnp.sqrt(tvdot(x, x))


def taxpy(a, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)


def tscale(a, x):
    return jax.tree_util.tree_map(lambda xi: a * xi, x)


def tsub(x, y):
    return jax.tree_util.tree_map(lambda a, b: a - b, x, y)


def tadd(x, y):
    return jax.tree_util.tree_map(lambda a, b: a + b, x, y)


def tzeros(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def _stack_zeros(x, n):
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros((n,) + l.shape, l.dtype), x
    )


def _get(V, i):
    return jax.tree_util.tree_map(
        lambda l: lax.dynamic_index_in_dim(l, i, 0, keepdims=False), V
    )


def _set(V, i, x):
    return jax.tree_util.tree_map(
        lambda l, xi: lax.dynamic_update_index_in_dim(l, xi, i, 0), V, x
    )


def _identity(x):
    return x


def _cast_tree(x, dtype):
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), x)


_EPS_BREAKDOWN = 1e-300


# ---------------------------------------------------------------------------
# (F)GMRES
# ---------------------------------------------------------------------------


def _gmres_core(
    matvec: Op,
    b,
    x0,
    *,
    tol,
    maxiter: int,
    M: Op | None,
    basis: int,
    flexible: bool,
    dot: Op | None = None,
    lo: "LowCycle | None" = None,
):
    """Shared GMRES/FGMRES implementation with restarts and Givens updates.

    ``lo``: run the Arnoldi restart cycles in reduced precision (GMRES-IR;
    see ``LowCycle``).  The restart residual ``b - A x`` and the solution
    accumulation stay in the operator precision.
    """
    M = M or _identity
    dot = dot or tvdot
    nrm = lambda x: jnp.sqrt(dot(x, x))
    hi_dtype = jnp.result_type(*[l.dtype for l in jax.tree_util.tree_leaves(b)])
    if lo is not None:
        wd = jnp.dtype(lo.dtype) if lo.dtype is not None else jnp.dtype(jnp.float32)
        w_mv = lo.matvec
        w_M = lo.M or _identity
        w_dot = lo.dot or tvdot
    else:
        wd = hi_dtype
        w_mv = matvec
        w_M = M
        w_dot = dot
    w_nrm = lambda x: jnp.sqrt(w_dot(x, x))

    def initial_residual(x):
        r = tsub(b, matvec(x))
        if not flexible:
            if lo is not None:
                r = jax.tree_util.tree_map(
                    lambda a: a.astype(hi_dtype), w_M(_cast_tree(r, wd))
                )
            else:
                r = M(r)
        return r

    def arnoldi_cycle(r, beta, inner_tol, iters, init_done):
        """One Arnoldi restart cycle in the working precision.

        ``r``/``beta``: start residual and its norm (working dtype).
        Returns ``(corr, iters, res, done)`` -- the correction to add to
        the iterate, the updated iteration count, the in-cycle (Givens)
        residual estimate, and the in-cycle stop flag.
        """
        dtype = wd
        v0 = tscale(1.0 / jnp.maximum(beta, _EPS_BREAKDOWN), r)
        V = _set(_stack_zeros(r, basis + 1), 0, v0)
        Z = _stack_zeros(r, basis) if flexible else None
        R = jnp.zeros((basis + 1, basis), dtype)
        cs = jnp.zeros(basis, dtype)
        sn = jnp.zeros(basis, dtype)
        g = jnp.zeros(basis + 1, dtype).at[0].set(beta)
        tol_w = jnp.asarray(inner_tol, dtype)
        nrm = w_nrm
        dot = w_dot
        M = w_M
        matvec = w_mv

        def arnoldi_cond(c):
            V, Z, R, cs, sn, g, j, it, res, done = c
            return (~done) & (j < basis) & (it < maxiter)

        # Batched CGS2 orthogonalization: all <v_i, w> in ONE contraction
        # over the stacked basis (rows beyond j are zero vectors, so their
        # coefficients vanish without masking), then one rank-1-stack
        # update, repeated once for stability (classical Gram-Schmidt with
        # reorthogonalization).  Sequential modified Gram-Schmidt costs
        # O(j) dependent reductions per iteration -- measured ~10x the
        # per-iteration wall at basis 100 in emulated f64 on TPU; CGS2 is
        # two MXU-shaped contractions.
        dotb = jax.vmap(dot, in_axes=(0, None))

        def orth_pass(V, w):
            h = dotb(V, w)  # [basis+1]
            w = jax.tree_util.tree_map(
                lambda wl, Vl: wl
                - jnp.tensordot(h, Vl, axes=[[0], [0]]).astype(wl.dtype),
                w,
                V,
            )
            return w, h

        def arnoldi_body(c):
            V, Z, R, cs, sn, g, j, it, res, done = c
            vj = _get(V, j)
            if flexible:
                zj = M(vj)
                Z_new = _set(Z, j, zj)
                w = matvec(zj)
            else:
                Z_new = Z
                w = M(matvec(vj))

            w, h1 = orth_pass(V, w)
            w, h2 = orth_pass(V, w)
            col = (h1 + h2).astype(dtype)
            hj1 = nrm(w)
            col = col.at[j + 1].set(hj1)
            V_new = _set(V, j + 1, tscale(1.0 / jnp.maximum(hj1, _EPS_BREAKDOWN), w))

            # apply stored Givens rotations to the new column
            def rot(i, col):
                a = col[i]
                bb = col[i + 1]
                return col.at[i].set(cs[i] * a + sn[i] * bb).at[i + 1].set(
                    -sn[i] * a + cs[i] * bb
                )

            col = lax.fori_loop(0, j, rot, col)
            # new rotation annihilating col[j+1]
            a, bb = col[j], col[j + 1]
            denom = jnp.sqrt(a * a + bb * bb)
            c_new = jnp.where(denom > 0, a / jnp.maximum(denom, _EPS_BREAKDOWN), 1.0)
            s_new = jnp.where(denom > 0, bb / jnp.maximum(denom, _EPS_BREAKDOWN), 0.0)
            col = col.at[j].set(c_new * a + s_new * bb).at[j + 1].set(0.0)
            g_new = (
                g.at[j].set(c_new * g[j])
                .at[j + 1].set(-s_new * g[j])
            )
            res_new = jnp.abs(g_new[j + 1])
            R_new = R.at[:, j].set(col[: basis + 1])
            it_new = it + 1
            done_new = (res_new <= tol_w) | ~jnp.isfinite(res_new)
            return (
                V_new,
                Z_new,
                R_new,
                cs.at[j].set(c_new),
                sn.at[j].set(s_new),
                g_new,
                j + 1,
                it_new,
                res_new,
                done_new,
            )

        init = (V, Z, R, cs, sn, g, jnp.int32(0), iters, beta, init_done)
        V, Z, R, cs, sn, g, j, iters, res, done = lax.while_loop(
            arnoldi_cond, arnoldi_body, init
        )

        # solve the (masked) triangular system R[:j,:j] y = g[:j]
        idx = jnp.arange(basis)
        Rj = R[:basis, :basis]
        Rj = jnp.where((idx[:, None] < j) & (idx[None, :] < j), Rj, 0.0)
        Rj = Rj + jnp.diag(jnp.where(idx < j, 0.0, 1.0).astype(dtype))
        gj = jnp.where(idx < j, g[:basis], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rj, gj, lower=False)
        y = jnp.where(jnp.isfinite(y), y, 0.0)

        # corr = sum_i y_i (Z|V)_i as one stacked contraction (y is zero
        # beyond j by construction)
        src = Z if flexible else V
        yk = y if flexible else jnp.concatenate([y, jnp.zeros((1,), dtype)])
        corr = jax.tree_util.tree_map(
            lambda Sl: jnp.tensordot(yk, Sl, axes=[[0], [0]]), src
        )
        return corr, iters, res, done

    def add_corr(x, corr):
        return jax.tree_util.tree_map(
            lambda xl, cl: xl + cl.astype(xl.dtype), x, corr
        )

    if lo is None:
        # ---- full-precision restarted GMRES (reference semantics) ----
        def cycle(x, iters):
            r = initial_residual(x)
            beta = nrm(r)
            corr, iters, res, done = arnoldi_cycle(
                r, beta, tol, iters, beta <= tol
            )
            return add_corr(x, corr), iters, res, done

        # initial convergence check (deal.II SolverControl step 0)
        r0 = initial_residual(x0)
        beta0 = nrm(r0)

        def outer_cond(c):
            x, iters, res, done = c
            return (~done) & (iters < maxiter)

        def outer_body(c):
            x, iters, res, done = c
            return cycle(x, iters)

        x, iters, res, done = lax.while_loop(
            outer_cond, outer_body, (x0, jnp.int32(0), beta0, beta0 <= tol)
        )
        # ``done`` also fires on a non-finite residual (to stop the loop);
        # report that as a breakdown, not as convergence (deal.II
        # check_failure analog).
        finite = jnp.isfinite(res)
        return x, SolveInfo(
            iters=iters, converged=done & finite, resnorm=res, failed=~finite
        )

    # ---- GMRES-IR: low-precision cycles, full-precision restarts ----
    def cycle_lo(x, iters, stall_ref):
        r_hi = initial_residual(x)
        beta_hi = nrm(r_hi)
        finite = jnp.isfinite(beta_hi)
        # stop before the cycle when converged, broken down, or when the
        # previous full cycle failed to reduce the true residual (the
        # attainable-reduction floor of the low-precision inner solve)
        stop = (beta_hi <= tol) | ~finite | (beta_hi > lo.stall * stall_ref)
        r = _cast_tree(r_hi, wd)
        beta = beta_hi.astype(wd)
        # one low-precision cycle cannot reduce the residual below
        # ~eps(lo) relative to the restart residual: stop the cycle at
        # eta * beta and return to the f64 restart
        inner_tol = jnp.maximum(
            jnp.asarray(tol, hi_dtype), lo.eta * beta_hi
        ).astype(wd)
        corr, iters, _res, _done = arnoldi_cycle(r, beta, inner_tol, iters, stop)
        # keep the iterate frozen on a stopped cycle (a skipped cycle's
        # zero-weight contraction over a non-finite basis would yield NaN)
        x_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stop, a, b), x, add_corr(x, corr)
        )
        return x_new, iters, beta_hi, beta_hi, stop

    def outer_cond(c):
        x, iters, res, stall_ref, done = c
        return (~done) & (iters < maxiter)

    def outer_body(c):
        x, iters, res, stall_ref, done = c
        return cycle_lo(x, iters, stall_ref)

    inf = jnp.asarray(jnp.inf, hi_dtype)
    x, iters, res, _sr, done = lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.int32(0), inf, inf, jnp.bool_(False)),
    )
    # exits: converged (res <= tol), non-finite (breakdown), stall (the
    # cycles stopped making progress -- callers fall back to lo=None), or
    # maxiter.  The final ``res`` is always the true recomputed residual.
    finite = jnp.isfinite(res)
    return x, SolveInfo(
        iters=iters,
        converged=done & finite & (res <= tol),
        resnorm=res,
        failed=~finite,
    )


def gmres(matvec, b, x0, *, tol, maxiter=1000, M=None, basis=30, dot=None, lo=None):
    """Left-preconditioned restarted GMRES (deal.II ``SolverGMRES``)."""
    return _gmres_core(
        matvec, b, x0, tol=tol, maxiter=maxiter, M=M, basis=basis,
        flexible=False, dot=dot, lo=lo,
    )


def fgmres(matvec, b, x0, *, tol, maxiter=1000, M=None, basis=30, dot=None, lo=None):
    """Flexible (right-preconditioned) GMRES (deal.II ``SolverFGMRES``)."""
    return _gmres_core(
        matvec, b, x0, tol=tol, maxiter=maxiter, M=M, basis=basis,
        flexible=True, dot=dot, lo=lo,
    )


# ---------------------------------------------------------------------------
# BiCGStab
# ---------------------------------------------------------------------------


def bicgstab(matvec, b, x0, *, tol, maxiter=1000, M=None, dot=None):
    """Preconditioned BiCGStab (deal.II ``SolverBicgstab``), true-residual check."""
    M = M or _identity
    dot = dot or tvdot
    nrm = lambda x: jnp.sqrt(dot(x, x))
    r = tsub(b, matvec(x0))
    rbar = r
    res0 = nrm(r)

    def cond(c):
        x, r, p, v, rho, alpha, omega, it, res, done, failed = c
        return (~done) & (~failed) & (it < maxiter)

    def body(c):
        x, r, p, v, rho, alpha, omega, it, res, done, failed = c
        rho_new = dot(rbar, r)
        beta = (rho_new / rho) * (alpha / omega)
        p_new = taxpy(beta, tsub(p, tscale(omega, v)), r)
        y = M(p_new)
        v_new = matvec(y)
        denom = dot(rbar, v_new)
        alpha_new = rho_new / denom
        s = tsub(r, tscale(alpha_new, v_new))
        z = M(s)
        t = matvec(z)
        tt = dot(t, t)
        omega_new = dot(t, s) / tt
        x_new = tadd(x, tadd(tscale(alpha_new, y), tscale(omega_new, z)))
        r_new = tsub(s, tscale(omega_new, t))
        res_new = nrm(r_new)
        it_new = it + 1
        failed_new = (
            (jnp.abs(rho_new) < _EPS_BREAKDOWN)
            | (jnp.abs(denom) < _EPS_BREAKDOWN)
            | (jnp.abs(tt) < _EPS_BREAKDOWN)
            | ~jnp.isfinite(res_new)
        )
        # freeze the iterate on breakdown (keep the best finite state)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda ai, bi: jnp.where(failed_new, bi, ai), a, b
        )
        x_new, r_new, p_new, v_new = (
            sel(x_new, x), sel(r_new, r), sel(p_new, p), sel(v_new, v)
        )
        res_new = jnp.where(failed_new, res, res_new)
        return (
            x_new, r_new, p_new, v_new, rho_new, alpha_new, omega_new,
            it_new, res_new, res_new <= tol, failed_new,
        )

    one = jnp.asarray(1.0, res0.dtype)
    init = (
        x0, r, tzeros(r), tzeros(r), one, one, one,
        jnp.int32(0), res0, res0 <= tol, jnp.bool_(False),
    )
    x, r, p, v, rho, alpha, omega, it, res, done, failed = lax.while_loop(
        cond, body, init
    )
    return x, SolveInfo(iters=it, converged=done, resnorm=res, failed=failed)


# ---------------------------------------------------------------------------
# CG
# ---------------------------------------------------------------------------


def cg(matvec, b, x0, *, tol, maxiter=1000, M=None, dot=None):
    """Preconditioned CG (deal.II ``SolverCG``), true-residual check."""
    M = M or _identity
    dot = dot or tvdot
    nrm = lambda x: jnp.sqrt(dot(x, x))
    r = tsub(b, matvec(x0))
    res0 = nrm(r)
    z = M(r)
    rz0 = dot(r, z)

    def cond(c):
        x, r, z, d, rz, it, res, done, failed = c
        return (~done) & (~failed) & (it < maxiter)

    def body(c):
        x, r, z, d, rz, it, res, done, failed = c
        q = matvec(d)
        dq = dot(d, q)
        alpha = rz / dq
        x_new = taxpy(alpha, d, x)
        r_new = taxpy(-alpha, q, r)
        res_new = nrm(r_new)
        z_new = M(r_new)
        rz_new = dot(r_new, z_new)
        d_new = taxpy(rz_new / rz, d, z_new)
        # breakdown guard: on a vanishing curvature or non-finite update,
        # freeze the iterate (best achievable) and stop.
        ok = jnp.isfinite(res_new) & (jnp.abs(dq) > _EPS_BREAKDOWN)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda ai, bi: jnp.where(ok, ai, bi), a, b
        )
        x_new, r_new, z_new, d_new = (
            sel(x_new, x), sel(r_new, r), sel(z_new, z), sel(d_new, d)
        )
        res_new = jnp.where(ok, res_new, res)
        rz_new = jnp.where(ok, rz_new, rz)
        return (
            x_new, r_new, z_new, d_new, rz_new, it + 1, res_new,
            res_new <= tol, ~ok,
        )

    init = (
        x0, r, z, z, rz0, jnp.int32(0), res0, res0 <= tol, jnp.bool_(False)
    )
    x, r, z, d, rz, it, res, done, failed = lax.while_loop(cond, body, init)
    return x, SolveInfo(iters=it, converged=done, resnorm=res, failed=failed)

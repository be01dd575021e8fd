"""Krylov solvers vs numpy direct solves on random systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.krylov import bicgstab, cg, fgmres, gmres


def _random_system(n=40, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    if spd:
        A = A @ A.T + n * np.eye(n)
    else:
        A = A + n * np.eye(n)  # diagonally dominant, nonsymmetric
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), np.linalg.solve(A, b)


@pytest.mark.parametrize("solver", [gmres, fgmres, bicgstab])
def test_nonsymmetric_solvers(solver):
    A, b, x_ref = _random_system()
    mv = lambda x: A @ x
    x, info = jax.jit(
        lambda b: solver(mv, b, jnp.zeros_like(b), tol=1e-10, maxiter=500)
    )(b)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
    assert int(info.iters) > 0


def test_cg_spd():
    A, b, x_ref = _random_system(spd=True)
    mv = lambda x: A @ x
    x, info = cg(mv, b, jnp.zeros_like(b), tol=1e-10, maxiter=500)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)


@pytest.mark.parametrize("solver", [gmres, fgmres, bicgstab, cg])
def test_zero_initial_residual_reports_zero_iters(solver):
    """deal.II SolverControl checks at step 0; the reference's Newton loop
    treats 0 iterations as a stagnation break (NSSolver.cpp:721-722)."""
    A, b, x_ref = _random_system(spd=True)
    mv = lambda x: A @ x
    x, info = solver(mv, jnp.asarray(x_ref), jnp.asarray(x_ref), tol=1e-8, maxiter=50)
    # b = x_ref here with A x0 != b in general; instead pass consistent pair:
    x, info = solver(mv, A @ jnp.asarray(x_ref), jnp.asarray(x_ref), tol=1e-6, maxiter=50)
    assert int(info.iters) == 0
    assert bool(info.converged)


@pytest.mark.parametrize("solver", [gmres, fgmres])
def test_gmres_restart(solver):
    """Convergence must survive restarts (basis smaller than n)."""
    A, b, x_ref = _random_system(n=60, seed=3)
    mv = lambda x: A @ x
    x, info = solver(mv, b, jnp.zeros_like(b), tol=1e-9, maxiter=2000, basis=8)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)


@pytest.mark.parametrize("solver", [gmres, fgmres, bicgstab])
def test_preconditioned_iterations_drop(solver):
    A, b, x_ref = _random_system(n=80, seed=1)
    mv = lambda x: A @ x
    dinv = 1.0 / jnp.diag(A)
    M = lambda x: dinv * x
    x0 = jnp.zeros_like(b)
    _, info_plain = solver(mv, b, x0, tol=1e-9, maxiter=2000)
    x, info_prec = solver(mv, b, x0, tol=1e-9, maxiter=2000, M=M)
    assert bool(info_prec.converged)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)
    assert int(info_prec.iters) <= int(info_plain.iters)


def test_pytree_operands():
    """Solvers operate on arbitrary pytrees (the Blocks use case)."""
    A, b, x_ref = _random_system(n=30, seed=2)
    split = 12
    mvt = lambda t: {
        "a": (A @ jnp.concatenate([t["a"], t["b"]]))[:split],
        "b": (A @ jnp.concatenate([t["a"], t["b"]]))[split:],
    }
    bt = {"a": b[:split], "b": b[split:]}
    x0 = {"a": jnp.zeros(split), "b": jnp.zeros(len(b) - split)}
    x, info = fgmres(mvt, bt, x0, tol=1e-10, maxiter=500)
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.concatenate([x["a"], x["b"]]), x_ref, atol=1e-8
    )


def test_chunked_fgmres_equals_continuous():
    """Chunked execution (the TPU per-call-budget workaround) must be
    EXACTLY a restarted solve: two maxiter-60 calls, the second
    warm-started, reproduce one maxiter-120 run bit-for-bit (chunks are
    multiples of the restart basis 30)."""
    rng = np.random.default_rng(7)
    n = 80
    A = jnp.asarray(rng.standard_normal((n, n)) + 4.0 * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: A @ x
    x0 = jnp.zeros(n)

    x_cont, info_cont = fgmres(mv, b, x0, tol=1e-30, maxiter=120)
    x1, i1 = fgmres(mv, b, x0, tol=1e-30, maxiter=60)
    x2, i2 = fgmres(mv, b, x1, tol=1e-30, maxiter=60)
    assert int(i1.iters) == 60 and int(i2.iters) == 60
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x_cont))


@pytest.mark.parametrize("solver", [gmres, fgmres])
def test_gmres_ir_low_precision_cycles(solver):
    """GMRES-IR: f32 restart cycles + f64 restart residuals reach f64
    tolerances (Carson & Higham iterative refinement; krylov.LowCycle)."""
    from navier_stokes_solver_tpu.krylov import LowCycle

    A, b, x_ref = _random_system(n=60, seed=3)
    mv = lambda x: A @ x
    A32 = A.astype(jnp.float32)
    lo = LowCycle(matvec=lambda x: A32 @ x, dtype=jnp.float32)
    x, info = jax.jit(
        lambda b: solver(
            mv, b, jnp.zeros_like(b), tol=1e-12, maxiter=500, basis=20, lo=lo
        )
    )(b)
    assert bool(info.converged)
    # the converged residual is the true f64 residual, not an estimate
    r = np.linalg.norm(np.asarray(b) - np.asarray(A) @ np.asarray(x))
    assert r <= 1.2e-12
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)


def test_gmres_ir_zero_initial_residual_reports_zero_iters():
    from navier_stokes_solver_tpu.krylov import LowCycle

    A, b, x_ref = _random_system(n=30, seed=4)
    mv = lambda x: A @ x
    A32 = A.astype(jnp.float32)
    lo = LowCycle(matvec=lambda x: A32 @ x, dtype=jnp.float32)
    x, info = fgmres(
        mv, b, jnp.asarray(x_ref), tol=1e-6, maxiter=100, basis=10, lo=lo
    )
    assert int(info.iters) == 0
    assert bool(info.converged)


def test_gmres_ir_preconditioned_pytree():
    """IR with a (low-precision) preconditioner over pytree operands."""
    from navier_stokes_solver_tpu.krylov import LowCycle

    A, b, x_ref = _random_system(n=50, seed=5)
    n1 = 20
    mv = lambda t: {"a": (A @ jnp.concatenate([t["a"], t["b"]]))[:n1],
                    "b": (A @ jnp.concatenate([t["a"], t["b"]]))[n1:]}
    dinv = 1.0 / jnp.diag(A)
    M = lambda t: {"a": t["a"] * dinv[:n1].astype(t["a"].dtype),
                   "b": t["b"] * dinv[n1:].astype(t["b"].dtype)}
    A32 = A.astype(jnp.float32)
    mv32 = lambda t: {"a": (A32 @ jnp.concatenate([t["a"], t["b"]]))[:n1],
                      "b": (A32 @ jnp.concatenate([t["a"], t["b"]]))[n1:]}
    lo = LowCycle(matvec=mv32, M=M, dtype=jnp.float32)
    bt = {"a": b[:n1], "b": b[n1:]}
    x, info = fgmres(
        mv, bt, jax.tree_util.tree_map(jnp.zeros_like, bt),
        tol=1e-11, maxiter=400, basis=15, M=M, lo=lo,
    )
    assert bool(info.converged)
    xs = np.concatenate([np.asarray(x["a"]), np.asarray(x["b"])])
    np.testing.assert_allclose(xs, x_ref, atol=1e-8)

"""Fused on-device time stepping: convergence, robustness, scan loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import make_disc
from navier_stokes_solver_tpu.timeloop import (
    initial_state,
    make_time_step,
    run_time_loop,
)


def _disc(nx=24, ny=10):
    return make_disc(make_fe_space(make_channel_geometry(nx, ny), 2, 1))


def test_fused_step_converges_asimple():
    disc = _disc()
    step = make_time_step(
        disc, solver_type=1, prec_type=2, tol=1e-10, newton_max=5, krylov_maxiter=300
    )
    ts = jax.jit(step)(initial_state(disc), 0.01, 0.01)
    assert int(ts.step) == 1
    assert float(ts.stats.final_residual) < 1e-9
    assert np.isfinite(float(ts.drag))
    assert np.isfinite(float(ts.lift))


@pytest.mark.parametrize("prec", [0, 1])
def test_fused_step_finite_all_preconditioners(prec):
    """Regression: the first Newton step from a zero state has a zero
    pressure rhs; inner solves with relative tolerance 0 used to run to
    breakdown and poison the solve with NaNs."""
    disc = _disc(16, 8)
    step = make_time_step(
        disc, solver_type=1, prec_type=prec, tol=1e-6, newton_max=2, krylov_maxiter=50
    )
    ts = jax.jit(step)(initial_state(disc), 0.01, 0.01)
    assert np.isfinite(float(ts.stats.final_residual))
    assert np.isfinite(float(jnp.abs(ts.solution.u).max()))
    assert np.isfinite(float(jnp.abs(ts.solution.p).max()))


def test_run_time_loop_streams_history():
    disc = _disc(16, 8)
    step = make_time_step(
        disc, solver_type=1, prec_type=2, tol=1e-8, newton_max=3, krylov_maxiter=200
    )
    final, hist = run_time_loop(step, initial_state(disc), 0.01, 0.01, 3)
    assert int(final.step) == 3
    assert hist["drag"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(hist["drag"])))
    assert np.all(np.isfinite(np.asarray(hist["lift"])))


def test_run_time_loop_chunked_bitwise_equal():
    """Host-chunked fused loop == one long scan, bitwise: the chunk
    boundary only cuts the scan carry (device-call budget guard for long
    runs; the chunked-FGMRES equivalence cousin)."""
    disc = _disc(16, 8)
    step = make_time_step(
        disc, solver_type=1, prec_type=1, tol=1e-8, newton_max=3, krylov_maxiter=200
    )
    f1, h1 = run_time_loop(step, initial_state(disc), 0.01, 0.01, 5)
    f2, h2 = run_time_loop(step, initial_state(disc), 0.01, 0.01, 5, chunk=2)
    np.testing.assert_array_equal(np.asarray(h1["drag"]), np.asarray(h2["drag"]))
    np.testing.assert_array_equal(np.asarray(h1["lift"]), np.asarray(h2["lift"]))
    np.testing.assert_array_equal(
        np.asarray(f1.solution.u), np.asarray(f2.solution.u)
    )
    np.testing.assert_array_equal(
        np.asarray(f1.solution.p), np.asarray(f2.solution.p)
    )
    assert int(f2.step) == 5


def test_solve_fused_checkpoint_resume_equivalence(tmp_path):
    """An elastic-restart run (two processes' worth of solve_fused calls
    through a checkpoint dir) reproduces the single-call run bitwise:
    same fields, same per-step history (worker-fault recovery path)."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    def opts():
        return SolverOptions(
            mesh_size=(16, 8), Re=10.0, solver_type=1, tolerance=1e-8,
            preconditioner_type=1, time_span=0.04, time_step=0.01,
        )

    ref = NSSolver(opts())
    ref.setup()
    ref.solve_fused(newton_max=3, krylov_maxiter=200)
    ref_steps = [h for h in ref.history if h.get("phase") == "step"]
    assert len(ref_steps) == 4

    ck = str(tmp_path / "ck")
    s1 = NSSolver(opts())
    s1.setup()
    s1.solve_fused(newton_max=3, krylov_maxiter=200,
                   checkpoint_dir=ck, max_steps_this_call=2)
    assert s1.time_step_index == 2  # partial

    s2 = NSSolver(opts())
    s2.setup()
    s2.solve_fused(newton_max=3, krylov_maxiter=200, checkpoint_dir=ck)
    assert s2.time_step_index == 4
    res_steps = [h for h in s2.history if h.get("phase") == "step"]
    assert len(res_steps) == 4
    for a, b in zip(ref_steps, res_steps):
        assert a["drag_force"] == b["drag_force"]
        assert a["lift_force"] == b["lift_force"]
        assert a["krylov_iters"] == b["krylov_iters"]
    np.testing.assert_array_equal(
        np.asarray(ref.solution.u), np.asarray(s2.solution.u)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.solution.p), np.asarray(s2.solution.p)
    )


def test_solve_direct_matches_fused():
    """Host-driven direct mode (one Newton solve per step at the ramp's
    final viscosity, adaptive-chunked device calls) is the numerical twin
    of the fused on-device loop: same per-step drag/lift to solver
    tolerance."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    def opts():
        return SolverOptions(
            mesh_size=(16, 8), Re=10.0, solver_type=1, tolerance=1e-10,
            preconditioner_type=1, time_span=0.03, time_step=0.01,
        )

    a = NSSolver(opts())
    a.setup()
    a.solve(direct=True)
    a_steps = [h for h in a.history if h.get("phase") == "step"]

    b = NSSolver(opts())
    b.setup()
    b.solve_fused(krylov_maxiter=400)
    b_steps = [h for h in b.history if h.get("phase") == "step"]

    assert len(a_steps) == len(b_steps) == 3
    for ha, hb in zip(a_steps, b_steps):
        da, db = ha["drag_force"], hb["drag_force"]
        la, lb = ha["lift_force"], hb["lift_force"]
        assert abs(da - db) <= 1e-6 * max(1.0, abs(da))
        assert abs(la - lb) <= 1e-6 * max(1.0, abs(la))

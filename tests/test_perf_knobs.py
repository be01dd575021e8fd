"""Performance knobs must not change converged answers.

The perf configuration surface (outer restart basis, inner tolerances,
inner mode) only reshapes the iteration path; the solved system and its
tolerance are identical, so fields must agree to solver tolerance.
"""

import numpy as np
import pytest

from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
from navier_stokes_solver_tpu.precond.blocks import PrecondConfig

BASE = dict(
    mesh_size=(20, 8),
    degree_velocity=2,
    degree_pressure=1,
    Re=10.0,
    solver_type=1,
    tolerance=1e-10,
    preconditioner_type=1,
    verbose=False,
)


def _solve(**kw):
    s = NSSolverStationary(SolverOptions(**{**BASE, **kw}))
    s.setup()
    s.solve_newton()
    s.compute_lift_drag()
    return s


def test_restart_basis_invariance():
    a = _solve()
    b = _solve(krylov_basis=60)
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)
    # deeper restarts cannot need more iterations
    ita = sum(h["krylov_iters"] for h in a.history)
    itb = sum(h["krylov_iters"] for h in b.history)
    assert itb <= ita


def test_skip_futile_stokes_invariance():
    """Skipping the reference's repeat Stokes-regime solves (state-
    independent rhs; updates always rejected by the strict-< line search)
    must reproduce the reference fields while skipping at least one full
    solve and never increasing total outer iterations."""
    a = _solve()
    b = _solve(skip_futile_stokes=True)
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)
    skipped = [h for h in b.history if h.get("phase") == "stokes_skipped"]
    assert skipped, "expected at least one skipped Stokes solve"
    ita = sum(h.get("krylov_iters", 0) for h in a.history)
    itb = sum(h.get("krylov_iters", 0) for h in b.history)
    assert itb < ita


def test_inner_tolerance_invariance():
    a = _solve()
    b = _solve(precond_config=PrecondConfig(tri_rel_u=1e-4, tri_rel_p=1e-4))
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)


def test_gmres_ir_invariance():
    """f32 outer cycles (GMRES-IR) must converge to the same fields as the
    f64 outer at identical absolute tolerance."""
    a = _solve()
    b = _solve(precond_config=PrecondConfig(krylov_cycle_dtype="float32"))
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-7)
    np.testing.assert_allclose(pb, pa, atol=1e-6)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)


def test_tri_rel_zero_rejected():
    with pytest.raises(ValueError, match="tri_rel_u"):
        _solve(precond_config=PrecondConfig(tri_rel_u=0.0))


def test_cahouet_schur_invariance_unsteady():
    """The Cahouet-Chabard Schur mode must reach the same converged step
    fields as the reference's pressure-mass Schur (same operator, same
    absolute tolerance), typically in fewer outer iterations."""
    from navier_stokes_solver_tpu.api import NSSolver

    common = dict(
        mesh_size=(20, 8),
        degree_velocity=2,
        degree_pressure=1,
        Re=10.0,
        solver_type=1,
        tolerance=1e-9,
        preconditioner_type=1,
        verbose=False,
        time_span=0.02,
        time_step=0.01,
    )
    res = {}
    for name, cfg in (
        ("mass", None),
        ("cahouet", PrecondConfig(schur_mode="cahouet")),
    ):
        s = NSSolver(SolverOptions(precond_config=cfg, **common))
        s.setup()
        s.solve()
        it = sum(h.get("krylov_iters", 0) for h in s.history)
        res[name] = (*s.fields(), it, s.drag_force)
    # both solves converge each step to |r| <= 1e-9; the field difference
    # is that residual amplified by the system's conditioning (pressure is
    # the weakly-controlled inf-sup block -- measured ~2e-5 at this size)
    np.testing.assert_allclose(res["cahouet"][0], res["mass"][0], atol=1e-5)
    np.testing.assert_allclose(res["cahouet"][1], res["mass"][1], atol=1e-3)
    np.testing.assert_allclose(
        res["cahouet"][3], res["mass"][3], rtol=1e-4, atol=1e-12
    )
    # the Laplacian leg is why the mode exists: it must not cost outer
    # iterations (measured 407 -> 212 at this config)
    assert res["cahouet"][2] <= res["mass"][2]


def test_tri_rel_stokes_override_invariance():
    """Stokes-regime-only inner-tolerance overrides (the bench's tuned
    configuration) must not change converged answers, and can only cut
    iterations on the Stokes-regime solves."""
    a = _solve()
    b = _solve(precond_config=PrecondConfig(
        tri_rel_u_stokes=1e-4, tri_rel_p_stokes=1e-4,
    ))
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)
    ita = sum(h["krylov_iters"] for h in a.history)
    itb = sum(h["krylov_iters"] for h in b.history)
    assert itb <= ita


def test_tri_rel_stokes_zero_rejected():
    with pytest.raises(ValueError, match="tri_rel_u_stokes"):
        _solve(precond_config=PrecondConfig(tri_rel_u_stokes=0.0))


def test_asimple_stokes_override_invariance():
    """The Stokes-regime tight-inner override also applies to the
    stationary aSIMPLE inner FGMRES(F)/CG(S) solves (reference rel 1e-1,
    NSSolverStationary.hpp:290-305); answers must be unchanged."""
    a = _solve(preconditioner_type=2)
    b = _solve(
        preconditioner_type=2,
        precond_config=PrecondConfig(
            tri_rel_u_stokes=1e-4, tri_rel_p_stokes=1e-4
        ),
    )
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_allclose(ub, ua, atol=1e-8)
    np.testing.assert_allclose(pb, pa, atol=1e-7)
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)


def test_adaptive_chunk_len_sizing():
    """Adaptive Krylov chunk sizing (api/base.py): one conservative
    restart cycle before any measurement; afterwards fills
    KRYLOV_CALL_BUDGET_S of device time, clamped to [basis,
    KRYLOV_CHUNK_MAX] and always a basis multiple."""
    s = NSSolverStationary(SolverOptions(**BASE))
    basis = 30
    # no measurement yet -> one KRYLOV_CHUNK-derived cycle
    assert s._adaptive_chunk_len(basis) == basis * max(
        1, s.KRYLOV_CHUNK // basis
    )
    # 0.1 s/iter, 75 s budget -> 750 iters -> 25 cycles of 30
    s._chunk_iter_wall_s = 0.1
    assert s._adaptive_chunk_len(basis) == 750
    # very slow iterations -> floor of one cycle (per-call kill budget)
    s._chunk_iter_wall_s = 10.0
    assert s._adaptive_chunk_len(basis) == basis
    # very fast iterations -> ceiling KRYLOV_CHUNK_MAX
    s._chunk_iter_wall_s = 1e-6
    cl = s._adaptive_chunk_len(basis)
    assert cl <= s.KRYLOV_CHUNK_MAX and cl % basis == 0
    # deep basis: never below one restart cycle even past the cap
    s._chunk_iter_wall_s = 10.0
    assert s._adaptive_chunk_len(2000) == 2000


def test_forced_chunk_matches_adaptive_fields(monkeypatch):
    """NSTPU_KRYLOV_CHUNK-forced chunking and adaptive chunking must
    produce identical fields: chunks are restart-aligned, so any chunk
    schedule is the same restarted solve (test_chunked_fgmres_equals_
    continuous is the kernel-level pin; this is the solver-level one)."""
    monkeypatch.setenv("NSTPU_KRYLOV_CHUNK", "120")
    a = _solve()
    monkeypatch.setenv("NSTPU_KRYLOV_CHUNK", "30")
    b = _solve()
    ua, pa = a.fields()
    ub, pb = b.fields()
    np.testing.assert_array_equal(ub, ua)
    np.testing.assert_array_equal(pb, pa)

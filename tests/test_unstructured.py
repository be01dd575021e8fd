"""Unstructured P2/P1 simplex backend (the -M path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry
from navier_stokes_solver_tpu.ops import Blocks
from navier_stokes_solver_tpu.unstructured import (
    make_simplex_disc,
    triangulate_channel,
)
from navier_stokes_solver_tpu.unstructured import ops as uops
from navier_stokes_solver_tpu.unstructured.elements import make_simplex_tables


def _disc(nx=16, ny=8, with_cylinder=True):
    geo = make_channel_geometry(nx, ny, with_cylinder=with_cylinder)
    return make_simplex_disc(*triangulate_channel(geo)), geo


def test_p2_partition_of_unity():
    t = make_simplex_tables()
    np.testing.assert_allclose(t.phi_v.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.phi_p.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.dphi_v.sum(axis=1), 0.0, atol=1e-12)
    # quadrature integrates degree-5 exactly: check x^2 y^2 over the triangle
    x, y = t.q_xy[:, 0], t.q_xy[:, 1]
    np.testing.assert_allclose(
        (t.w_q * x**2 * y**2).sum(), 1.0 / 180.0, rtol=1e-12
    )


def test_mass_matrix_total_is_domain_area():
    disc, geo = _disc()
    ones = jnp.ones((disc.n_nodes_p,), disc.dtype)
    area = float(uops.apply_Mp(disc, 1.0, ones).sum())
    expected = geo.n_active_cells * geo.hx * geo.hy
    np.testing.assert_allclose(area, expected, rtol=1e-12)


def test_divergence_of_constant_field_vanishes():
    disc, _ = _disc()
    u = jnp.ones((2, disc.n_nodes_v), disc.dtype)
    div = uops.apply_B(disc, u, stokes=False)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-12)


def test_poiseuille_is_exact_ns_solution():
    """On the plain channel (no cylinder) the parabolic profile with linear
    pressure is an exact stationary NS solution representable in P2/P1; the
    interior weak residual must vanish to machine precision."""
    disc, geo = _disc(12, 6, with_cylinder=False)
    nu = 0.05
    H = 0.41
    um = 1.0
    y = disc.coords_v[:, 1]
    x_p = disc.coords_p[:, 0]
    u_ex = jnp.stack([4 * um * y * (H - y) / H**2, jnp.zeros_like(y)])
    # dp/dx = -8 nu um / H^2, anchored so p(outlet) = p_out = 1
    dpdx = -8 * nu * um / H**2
    p_ex = 1.0 + dpdx * (x_p - geo.x1)
    st = Blocks(u=u_ex, p=jnp.asarray(p_ex, disc.dtype))

    dF = uops.diag_F(disc, nu, 0.0, uops.eval_state(disc, st), stokes=False)
    r = uops.residual(
        disc, nu, 0.0, st, jnp.zeros_like(u_ex), dF,
        stokes=False, inlet_amp=0.0,
    )
    # Dirichlet rows carry diag * g (g = 0 here); interior rows must vanish
    np.testing.assert_allclose(np.asarray(r.u), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r.p), 0.0, atol=1e-10)


def test_jacobian_matches_residual_differencing():
    """J(u) dv ~ -(R(u + e dv) - R(u)) / e with the residual's sign
    convention (rhs = -R)."""
    disc, _ = _disc(8, 4)
    rng = np.random.default_rng(0)
    nu, inv_dt = 0.05, 10.0
    u0 = Blocks(
        u=jnp.asarray(0.1 * rng.standard_normal((2, disc.n_nodes_v))),
        p=jnp.asarray(0.1 * rng.standard_normal(disc.n_nodes_p)),
    )
    dv = Blocks(
        u=jnp.asarray(rng.standard_normal((2, disc.n_nodes_v))),
        p=jnp.asarray(rng.standard_normal(disc.n_nodes_p)),
    )
    # keep the perturbation off the constrained rows
    dv = Blocks(u=jnp.where(disc.u_dirichlet, 0.0, dv.u), p=dv.p)

    linq = uops.eval_state(disc, u0)
    dF = uops.diag_F(disc, nu, inv_dt, linq, stokes=False)
    Jdv = uops.apply_jacobian(disc, nu, inv_dt, linq, dF, dv, stokes=False)

    eps = 1e-7
    u_old = jnp.zeros_like(u0.u)

    def neg_res(st):
        return uops.residual(
            disc, nu, inv_dt, st, u_old, dF, stokes=False, inlet_amp=0.0
        )

    r0 = neg_res(u0)
    r1 = neg_res(Blocks(u=u0.u + eps * dv.u, p=u0.p + eps * dv.p))
    fd_u = (np.asarray(r0.u) - np.asarray(r1.u)) / eps
    # the reference flips the continuity sign in the Newton Jacobian
    # (NSSolver.cpp:461-463) while the residual keeps +div: the pressure
    # row of J equals +d(rhs)/du, the velocity rows equal -d(rhs)/du
    fd_p = (np.asarray(r1.p) - np.asarray(r0.p)) / eps
    mask = ~np.asarray(disc.u_dirichlet)
    np.testing.assert_allclose(
        np.asarray(Jdv.u)[:, mask], fd_u[:, mask], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(Jdv.p), fd_p, rtol=2e-5, atol=2e-5)

    # consistent=True restores true Newton: J dv = -d(rhs)/du on ALL rows
    # (the reference's +div rhs row makes the divergence double per
    # accepted Newton step; see ops/matfree.py::residual)
    def neg_res_c(st):
        return uops.residual(
            disc, nu, inv_dt, st, u_old, dF, stokes=False, inlet_amp=0.0,
            consistent=True,
        )

    r0c = neg_res_c(u0)
    r1c = neg_res_c(Blocks(u=u0.u + eps * dv.u, p=u0.p + eps * dv.p))
    fd_pc = (np.asarray(r0c.p) - np.asarray(r1c.p)) / eps
    np.testing.assert_allclose(np.asarray(Jdv.p), fd_pc, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r0c.u), np.asarray(r0.u))


def test_simplex_solver_matches_structured_drag():
    """Coarse-mesh stationary solve: the simplex backend's drag coefficient
    must land near the structured backend's (different discretizations of
    the same problem -- loose agreement)."""
    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions

    common = dict(mesh_size=(24, 10), Re=10.0, solver_type=1,
                  tolerance=1e-8, preconditioner_type=2, verbose=False)
    s_tri = NSSolverStationary(SolverOptions(read_mesh_from_file=True, **common))
    s_tri.setup()
    s_tri.solve_newton()
    s_tri.compute_lift_drag()
    s_tri.compute_drag_coeff()

    s_q = NSSolverStationary(
        SolverOptions(degree_velocity=2, degree_pressure=1,
                      multigrid=False, **common)
    )
    s_q.setup()
    s_q.solve_newton()
    s_q.compute_lift_drag()
    s_q.compute_drag_coeff()

    assert np.isfinite(s_tri.drag_coeff)
    # voxelized-cylinder coarse meshes: expect O(10%) agreement
    np.testing.assert_allclose(s_tri.drag_coeff, s_q.drag_coeff, rtol=0.2)


@pytest.mark.parametrize("stokes", [True, False])
def test_simplex_jacobian_matches_dense_oracle(stokes):
    """Matrix-free simplex apply_jacobian vs an independent dense assembly
    (explicit loops, tests/reference_fem_tri.py) on a tiny mesh."""
    from tests.reference_fem_tri import DenseTriNS

    disc, _geo = _disc(5, 3)
    oracle = DenseTriNS(disc)
    rng = np.random.default_rng(4)
    nu, inv_dt = 0.04, 10.0
    uk = rng.standard_normal((2, disc.n_nodes_v))
    xu = rng.standard_normal((2, disc.n_nodes_v))
    xp = rng.standard_normal(disc.n_nodes_p)

    A = oracle.assemble_jacobian(uk, nu, inv_dt, stokes=stokes)
    y_dense = A @ oracle.flat(xu, xp)

    st = Blocks(u=jnp.asarray(uk), p=jnp.zeros(disc.n_nodes_p, disc.dtype))
    linq = None if stokes else uops.eval_state(disc, st)
    dF = uops.diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    y = uops.apply_jacobian(
        disc, nu, inv_dt, linq, dF,
        Blocks(u=jnp.asarray(xu), p=jnp.asarray(xp)), stokes=stokes,
    )
    got = oracle.flat(np.asarray(y.u), np.asarray(y.p))
    np.testing.assert_allclose(got, y_dense, atol=1e-11)
    # kept Dirichlet diagonal equals the matrix-free diag extraction
    mask = np.asarray(disc.u_dirichlet)
    d_dense = np.diag(A)[: 2 * disc.n_nodes_v].reshape(2, disc.n_nodes_v)
    np.testing.assert_allclose(
        np.asarray(dF)[:, mask], d_dense[:, mask], atol=1e-11
    )


def test_simplex_schur_legs_match_dense_oracle():
    """Matrix-free simplex apply_Lp / apply_Fp / apply_Mp_raw / diag_Lp vs
    independent dense assemblies (tests/reference_fem_tri.py) with the
    symmetric outlet-elimination convention."""
    from tests.reference_fem_tri import DenseTriNS

    disc, _geo = _disc(5, 3)
    oracle = DenseTriNS(disc)
    rng = np.random.default_rng(7)
    free = ~np.asarray(disc.p_outlet)
    assert free.sum() < disc.n_nodes_p  # the outlet column exists
    xp = rng.standard_normal(disc.n_nodes_p)

    L = oracle.assemble_fp(free, nu=1.0, inv_dt=0.0)
    np.testing.assert_allclose(
        np.asarray(uops.apply_Lp(disc, jnp.asarray(xp))), L @ xp, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(uops.diag_Lp(disc)), np.diag(L), atol=1e-11
    )

    nu, inv_dt = 0.04, 10.0
    uk = rng.standard_normal((2, disc.n_nodes_v))
    linq = uops.eval_state(
        disc, Blocks(u=jnp.asarray(uk), p=jnp.zeros(disc.n_nodes_p, disc.dtype))
    )
    F = oracle.assemble_fp(free, nu=nu, inv_dt=inv_dt, uk=uk)
    np.testing.assert_allclose(
        np.asarray(uops.apply_Fp(disc, nu, inv_dt, linq, jnp.asarray(xp))),
        F @ xp,
        atol=1e-11,
    )

    M = oracle.assemble_fp(free, nu=0.0, inv_dt=1.0)
    np.testing.assert_allclose(
        np.asarray(uops.apply_Mp_raw(disc, jnp.asarray(xp))), M @ xp, atol=1e-11
    )
    # Stokes limit: Fp(nu, inv_dt=0, linq=None) == nu * Lp on free rows
    got = np.asarray(uops.apply_Fp(disc, nu, 0.0, None, jnp.asarray(xp)))
    np.testing.assert_allclose(got[free], nu * (L @ xp)[free], atol=1e-11)


@pytest.mark.parametrize("schur", ["cahouet", "pcd"])
def test_simplex_upgraded_schur_matches_mass_dynamics(schur):
    """The Cahouet-Chabard / PCD Schur treatments on the -M backend are
    preconditioner changes only: the converged unsteady trajectory must
    match the mass-Schur run (same system, same tolerance)."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions
    from navier_stokes_solver_tpu.precond import PrecondConfig

    common = dict(mesh_size=(16, 8), Re=5.0, time_span=0.02, time_step=0.01,
                  solver_type=1, tolerance=1e-10, preconditioner_type=1,
                  verbose=False, multigrid=False, read_mesh_from_file=True)
    a = NSSolver(SolverOptions(**common))
    a.setup()
    a.solve()

    b = NSSolver(
        SolverOptions(precond_config=PrecondConfig(schur_mode=schur), **common)
    )
    b.setup()
    b.solve()
    np.testing.assert_allclose(b.drag_force, a.drag_force, rtol=1e-6)


def test_simplex_cahouet_ignores_lp_cycles():
    """``cc_lp_cycles`` must be a no-op on the -M backend: its Lp
    preconditioner is point Jacobi (no pressure V-cycle), and N Jacobi
    sweeps scaled by 1/dt poison the Schur leg (measured on the 60x40
    Re-ramp: 25-30 -> 500-2000 outers/solve).  The gate in
    precond.blocks._make_p_solver keeps the nested FGMRES Lp solve, so
    iteration counts and dynamics match the cycles=None run exactly."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions
    from navier_stokes_solver_tpu.precond import PrecondConfig

    common = dict(mesh_size=(16, 8), Re=5.0, time_span=0.02, time_step=0.01,
                  solver_type=1, tolerance=1e-10, preconditioner_type=1,
                  verbose=False, multigrid=False, read_mesh_from_file=True)

    runs = {}
    for key, cycles in (("nested", None), ("cycles", 1)):
        s = NSSolver(SolverOptions(
            precond_config=PrecondConfig(schur_mode="cahouet",
                                         cc_lp_cycles=cycles),
            **common,
        ))
        s.setup()
        s.solve()
        iters = [h["krylov_iters"] for h in s.history
                 if h.get("phase") in ("stokes", "ns")]
        runs[key] = (iters, s.drag_force)

    assert runs["cycles"][0] == runs["nested"][0]
    np.testing.assert_allclose(runs["cycles"][1], runs["nested"][1],
                               rtol=1e-12)


def test_p_multigrid_transfers_and_strength():
    """P2->P1 p-multigrid (unstructured/pmg.py): transfers are exact
    transposes, and the two-level cycle beats point Jacobi by a wide
    margin as an inner-solve preconditioner (the simplex analog of the
    structured AMG/ILU equivalence layer, NSSolverStationary.hpp:225)."""
    import jax.numpy as jnp

    from navier_stokes_solver_tpu.geometry import make_channel_geometry
    from navier_stokes_solver_tpu.krylov import fgmres
    from navier_stokes_solver_tpu.unstructured import (
        make_simplex_disc,
        triangulate_channel,
    )
    from navier_stokes_solver_tpu.unstructured import ops as sops
    from navier_stokes_solver_tpu.unstructured.pmg import (
        make_p_vcycle,
        prolong,
        restrict,
    )

    geo = make_channel_geometry(24, 12)
    nodes, tri, be, bt = triangulate_channel(geo)
    disc = make_simplex_disc(nodes, tri, be, bt, jnp.float64)
    rng = np.random.default_rng(0)

    # <P xc, yf> == <xc, P^T yf>
    xc = jnp.asarray(rng.standard_normal((2, disc.n_nodes_p)))
    yf = jnp.asarray(rng.standard_normal((2, disc.n_nodes_v)))
    np.testing.assert_allclose(
        float(jnp.vdot(prolong(disc, xc), yf)),
        float(jnp.vdot(xc, restrict(disc, yf))),
        rtol=1e-12,
    )
    # prolongation is exact on P1 (a linear function)
    lin = jnp.stack([disc.coords_p[:, 0] + 2 * disc.coords_p[:, 1],
                     disc.coords_p[:, 1]])
    lin_f = jnp.stack([disc.coords_v[:, 0] + 2 * disc.coords_v[:, 1],
                       disc.coords_v[:, 1]])
    np.testing.assert_allclose(
        np.asarray(prolong(disc, lin)), np.asarray(lin_f), atol=1e-12
    )

    nu = 0.1
    dF = sops.diag_F(disc, nu, 0.0, None, stokes=True)
    A = lambda x: sops.apply_F(disc, nu, 0.0, None, x, stokes=True, bc_diag=dF)
    b = jnp.asarray(rng.standard_normal((2, disc.n_nodes_v)))
    b = jnp.where(disc.u_dirichlet, 0.0, b)
    bn = float(jnp.linalg.norm(b))
    _, ij = fgmres(A, b, jnp.zeros_like(b), tol=1e-6 * bn, maxiter=300,
                   M=lambda x: x / dF)
    M = make_p_vcycle(disc, nu, 0.0, None, stokes=True, diag_f=dF, dtype=None)
    _, ip = fgmres(A, b, jnp.zeros_like(b), tol=1e-6 * bn, maxiter=300, M=M)
    assert bool(ip.converged)
    assert int(ip.iters) * 3 < int(ij.iters)  # measured: 6 vs 129


def test_gather_scatter_matches_segment_sum():
    """The padded-gather scatter inverse (SimplexDisc.gather_*) must agree
    with the segment_sum fallback on every operator that scatters; keeping
    scatter/sort HLO out of the hot TPU programs must not change values."""
    from navier_stokes_solver_tpu.unstructured import pmg

    disc, _ = _disc()
    slow = disc.replace(gather_v=None, gather_p=None, gather_ev=None)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2, disc.n_nodes_v)))
    p = jnp.asarray(rng.standard_normal(disc.n_nodes_p))
    linq = uops.eval_state(disc, Blocks(u=u, p=p))
    checks = [
        lambda d: uops.apply_F(
            d, 0.01, 10.0, linq, u, stokes=False, bc_diag=2.0
        ),
        lambda d: uops.apply_B(d, u, stokes=False),
        lambda d: uops.apply_Bt(d, p),
        lambda d: uops.apply_Mp(d, 0.01, p),
        lambda d: uops.diag_F(d, 0.01, 10.0, linq, stokes=False),
        lambda d: uops.diag_Mp(d, 0.01),
        lambda d: pmg.restrict(d, u),
    ]
    for fn in checks:
        np.testing.assert_allclose(
            np.asarray(fn(disc)), np.asarray(fn(slow)), atol=1e-13
        )


def test_simplex_fused_matches_host_drag():
    """The fused on-device time loop must run on the simplex backend
    (backend-dispatched ops in timeloop/fused.py) and integrate the same
    implicit-Euler dynamics as the host fidelity path."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    common = dict(mesh_size=(16, 8), Re=5.0, time_span=0.02, time_step=0.01,
                  solver_type=1, tolerance=1e-10, preconditioner_type=2,
                  verbose=False, multigrid=False, read_mesh_from_file=True)
    host = NSSolver(SolverOptions(**common))
    host.setup()
    host.solve()

    fused = NSSolver(SolverOptions(**common))
    fused.setup()
    fused.solve_fused(newton_max=10, newton_tol=1e-9)

    np.testing.assert_allclose(fused.drag_force, host.drag_force, rtol=1e-4)


def test_simplex_ensemble_sweep_matches_individual():
    """vmap Reynolds sweep over the simplex backend (BASELINE config 5
    analog on the -M path): each batch member matches its standalone fused
    run."""
    import jax

    from navier_stokes_solver_tpu.ensemble.sweep import run_sweep
    from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step

    disc, _ = _disc()
    kw = dict(solver_type=1, prec_type=2, tol=1e-9, newton_max=3,
              krylov_maxiter=200)
    nus = [0.05, 0.1]
    final, hist = run_sweep(disc, nus, 0.01, 2, **kw)
    assert hist["drag"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(hist["drag"])))

    step = make_time_step(disc, **kw)
    for b, nu in enumerate(nus):
        ts = initial_state(disc)
        for _ in range(2):
            ts = jax.jit(step)(ts, nu, 0.01)
        np.testing.assert_allclose(
            float(ts.drag), float(final.drag[b]), rtol=1e-6, atol=2e-9
        )

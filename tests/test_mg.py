"""Geometric multigrid (ILU/AMG equivalence layer) unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_solver_tpu.elements import make_taylor_hood
from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.krylov import fgmres
from navier_stokes_solver_tpu.krylov.solvers import tnorm
from navier_stokes_solver_tpu.ops import Blocks, make_disc, residual, diag_F
from navier_stokes_solver_tpu.ops.matfree import apply_F
from navier_stokes_solver_tpu.precond.mg import (
    _interp_1d,
    attach_mg,
    make_mg_vcycle,
    mg_level_shapes,
)


def test_interp_1d_reproduces_polynomials():
    """Transfer matrices must be exact on the piecewise-polynomial space:
    interpolating a global polynomial of degree <= deg between any two grids
    reproduces it exactly."""
    deg = 3
    nodes = make_taylor_hood(3, 2).nodes_v
    for n_src, n_dst in [(4, 8), (8, 4), (5, 9), (10, 5)]:
        P = _interp_1d(n_src, n_dst, deg, nodes)

        def coords(n):
            return np.concatenate(
                [[(c + t) / n for t in nodes[:-1]] for c in range(n)] + [[1.0]]
            )

        xs, xd = coords(n_src), coords(n_dst)
        for k in range(deg + 1):
            np.testing.assert_allclose(P @ xs**k, xd**k, atol=1e-12)


def test_hierarchy_shapes():
    """Aspect-aware coarsening (precond.mg._coarse_shape): halve only the
    smaller-h direction while anisotropy exceeds 1.5x, both otherwise."""
    from navier_stokes_solver_tpu.precond.mg import _coarse_shape

    disc = attach_mg(make_disc(make_fe_space(make_channel_geometry(64, 24), 2, 1)))
    shapes = mg_level_shapes(disc)
    assert shapes[0] == (64, 24)
    assert len(shapes) >= 3
    W, H = 2.2, 0.41
    for (fx, fy), (cx, cy) in zip(shapes, shapes[1:]):
        assert (cx, cy) == _coarse_shape(fx, fy, W / fx, H / fy)
        assert (cx, cy) != (fx, fy) and cx <= fx and cy <= fy
    # the channel is anisotropic (hy < hx at 64x24): the first step must
    # semi-coarsen y only
    assert shapes[1] == (64, 12)


def test_vcycle_accelerates_velocity_solve():
    """FGMRES on the Stokes velocity block: the MG V-cycle must beat point
    Jacobi by a wide margin in iteration count."""
    disc0 = make_disc(make_fe_space(make_channel_geometry(48, 16), 2, 1))
    disc = attach_mg(disc0)
    nu = 0.1
    dF = diag_F(disc, nu, 0.0, None, stokes=True)
    A = lambda x: apply_F(disc, nu, 0.0, None, x, stokes=True, bc_diag=dF)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((2,) + disc.NV))
    b = jnp.where(disc.u_active & ~disc.u_dirichlet, b, 0.0)
    x0 = jnp.zeros_like(b)
    tol = 1e-8 * float(tnorm(b))

    M_mg = make_mg_vcycle(disc, nu, 0.0, None, stokes=True)
    _, info_mg = fgmres(A, b, x0, tol=tol, maxiter=500, M=M_mg)
    dinv = 1.0 / dF
    _, info_j = fgmres(A, b, x0, tol=tol, maxiter=500, M=lambda x: dinv * x)

    assert bool(info_mg.converged)
    assert int(info_mg.iters) * 3 < int(info_j.iters) or not bool(info_j.converged)
    assert int(info_mg.iters) < 60


def test_vcycle_newton_regime_finite():
    """Convection-linearized operator with restricted state: V-cycle output
    stays finite and reduces the residual."""
    disc = attach_mg(make_disc(make_fe_space(make_channel_geometry(32, 12), 2, 1)))
    nu, inv_dt = 0.01, 100.0
    rng = np.random.default_rng(5)
    u_state = jnp.asarray(0.1 * rng.standard_normal((2,) + disc.NV))
    u_state = jnp.where(disc.u_active, u_state, 0.0)
    from navier_stokes_solver_tpu.ops import eval_state

    linq = eval_state(disc, Blocks(u=u_state, p=jnp.zeros(disc.NP, disc.dtype)))
    dF = diag_F(disc, nu, inv_dt, linq, stokes=False)
    A = lambda x: apply_F(disc, nu, inv_dt, linq, x, stokes=False, bc_diag=dF)
    b = jnp.asarray(rng.standard_normal((2,) + disc.NV))
    b = jnp.where(disc.u_active & ~disc.u_dirichlet, b, 0.0)
    M = make_mg_vcycle(disc, nu, inv_dt, u_state, stokes=False)
    x = M(b)
    assert np.all(np.isfinite(np.asarray(x)))
    r = b - A(x)
    assert float(tnorm(r)) < 0.5 * float(tnorm(b))


def test_all_smoothers_contract_stokes():
    """Every V-cycle smoother variant must contract the Stokes block.
    (On the aspect-aware hierarchy Chebyshev-Jacobi and cell-block Schwarz
    are near-equal; the production default 'gmres' must not be worse than
    either -- it is also the only one stable in the NS regime.)"""
    from navier_stokes_solver_tpu.ops.matfree import apply_F

    disc = attach_mg(make_disc(make_fe_space(make_channel_geometry(32, 12), 3, 2)))
    nu = 0.1
    dF = diag_F(disc, nu, 0.0, None, stokes=True)
    A = lambda x: apply_F(disc, nu, 0.0, None, x, stokes=True, bc_diag=dF)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((2,) + disc.NV))
    b = jnp.where(disc.u_active & ~disc.u_dirichlet, b, 0.0)

    from navier_stokes_solver_tpu.krylov.solvers import tnorm

    rates = {}
    for sm in ("jacobi", "schwarz", "gmres"):
        M = make_mg_vcycle(disc, nu, 0.0, None, stokes=True, smoother=sm)
        r = b - A(M(b))
        rates[sm] = float(tnorm(r) / tnorm(b))
    assert all(r < 0.25 for r in rates.values()), rates
    assert rates["gmres"] <= 1.5 * min(rates.values()), rates


def test_schwarz_cell_matrices_match_operator():
    """Assembled local blocks applied cell-by-cell must reproduce apply_F
    on unconstrained rows."""
    from navier_stokes_solver_tpu.ops import Blocks, eval_state
    from navier_stokes_solver_tpu.ops.matfree import (
        apply_F,
        _gather_v,
        _scatter_v,
    )
    from navier_stokes_solver_tpu.precond.schwarz import _cell_matrices

    disc = make_disc(make_fe_space(make_channel_geometry(6, 4), 3, 2))
    nu, inv_dt = 0.07, 20.0
    rng = np.random.default_rng(0)
    u_state = jnp.asarray(0.2 * rng.standard_normal((2,) + disc.NV))
    linq = eval_state(
        disc, Blocks(u=u_state, p=jnp.zeros(disc.NP, disc.dtype))
    )
    A = _cell_matrices(disc, nu, inv_dt, linq, stokes=False)
    n_v = disc.tables.n_v
    free = ~(disc.u_dirichlet | ~disc.u_active)
    x = jnp.asarray(rng.standard_normal((2,) + disc.NV)) * jnp.where(
        free, 1.0, 0.0
    )
    x_loc = _gather_v(disc, x)
    xv = jnp.transpose(x_loc, (2, 3, 1, 0)).reshape(disc.ny, disc.nx, 2 * n_v)
    yv = jnp.einsum("yxij,yxj->yxi", A, xv)
    y_loc = jnp.transpose(
        yv.reshape(disc.ny, disc.nx, 2, n_v), (3, 2, 0, 1)
    )
    y_asm = _scatter_v(disc, y_loc)
    y_ref = apply_F(disc, nu, inv_dt, linq, x, stokes=False)
    np.testing.assert_allclose(
        np.asarray(jnp.where(free, y_asm - y_ref, 0.0)), 0.0, atol=1e-12
    )


def test_lp_vcycle_preconditions_poisson():
    """The pressure-Laplacian V-cycle (Cahouet-Chabard leg) must make an
    FGMRES solve of Lp x = b dramatically cheaper than Jacobi."""
    import jax.numpy as jnp
    from navier_stokes_solver_tpu.krylov import fgmres
    from navier_stokes_solver_tpu.ops.matfree import (
        apply_Lp,
        diag_Lp,
        p_outlet_mask,
    )
    from navier_stokes_solver_tpu.precond.mg import make_lp_vcycle

    geo = make_channel_geometry(48, 24)
    space = make_fe_space(geo, 3, 2)
    disc = attach_mg(make_disc(space))
    assert disc.mg is not None and disc.mg.Ppx is not None
    A = lambda x: apply_Lp(disc, x)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(disc.NP))
    b = jnp.where(disc.p_active & ~p_outlet_mask(disc), b, 0.0)
    tol = 1e-8 * float(jnp.linalg.norm(b))

    M = make_lp_vcycle(disc)
    x, info_mg = fgmres(A, b, jnp.zeros_like(b), tol=tol, maxiter=300, M=M)
    assert bool(info_mg.converged)
    r = float(jnp.linalg.norm(b - A(x)))
    assert r <= 2 * tol

    dinv = 1.0 / diag_Lp(disc)
    _, info_j = fgmres(
        A, b, jnp.zeros_like(b), tol=tol, maxiter=300,
        M=lambda v: dinv * v,
    )
    assert int(info_mg.iters) * 3 <= int(info_j.iters) or not bool(
        info_j.converged
    )

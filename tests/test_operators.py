"""Matrix-free operators vs the independent dense-assembly oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import (
    Blocks,
    apply_Mp,
    apply_jacobian,
    diag_F,
    diag_Mp,
    eval_state,
    lift_drag_forces,
    make_disc,
    residual,
)
from tests.reference_fem import DenseNS


def _setup(nx=14, ny=6, deg=(2, 1), with_cyl=True, seed=0, radius=0.05):
    geo = make_channel_geometry(
        nx, ny, with_cylinder=with_cyl, circle_radius=radius
    )
    sp = make_fe_space(geo, *deg)
    disc = make_disc(sp)
    oracle = DenseNS(sp)
    rng = np.random.default_rng(seed)
    NVy, NVx, NPy, NPx = sp.NVy, sp.NVx, sp.NPy, sp.NPx

    def rand_state():
        u = rng.standard_normal((2, NVy, NVx)) * sp.u_active
        p = rng.standard_normal((NPy, NPx)) * sp.p_active
        return u, p

    return sp, disc, oracle, rand_state


@pytest.mark.parametrize(
    "deg,stokes",
    [((2, 1), True), ((2, 1), False), ((3, 2), False)],
)
def test_jacobian_apply_matches_dense(deg, stokes):
    # the Q3/Q2 oracle is expensive; use a smaller grid with a fatter
    # cylinder so cells still get deleted
    if deg == (3, 2):
        sp, disc, oracle, rand = _setup(nx=8, ny=5, deg=deg, radius=0.08)
    else:
        sp, disc, oracle, rand = _setup(deg=deg)
    uk, pk = rand()
    u_old, _ = rand()
    xu, xp = rand()
    nu, inv_dt = 0.04, 10.0

    A, _, _, diag_kept = oracle.assemble(
        uk, pk, u_old, nu, inv_dt, stokes=stokes, inlet_amp=0.3
    )
    y_dense = A @ oracle.blocks_to_flat(xu, xp)

    st = Blocks(u=jnp.asarray(uk), p=jnp.asarray(pk))
    linq = None if stokes else eval_state(disc, st)
    dF = diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    y = apply_jacobian(
        disc, nu, inv_dt, linq, dF, Blocks(u=jnp.asarray(xu), p=jnp.asarray(xp)),
        stokes=stokes,
    )
    got = oracle.blocks_to_flat(np.asarray(y.u), np.asarray(y.p))
    np.testing.assert_allclose(got, y_dense, atol=1e-11)
    # the kept Dirichlet diagonal must equal the matrix-free diag extraction
    du, _ = oracle.flat_to_blocks(diag_kept)
    mask = np.asarray(sp.u_dirichlet)
    np.testing.assert_allclose(
        np.asarray(dF)[:, mask], du[:, mask], atol=1e-11
    )


@pytest.mark.parametrize("stokes", [True, False])
def test_residual_matches_dense(stokes):
    sp, disc, oracle, rand = _setup()
    uk, pk = rand()
    u_old, _ = rand()
    nu, inv_dt, amp = 0.1, 5.0, 0.3

    _, rhs_dense, _, _ = oracle.assemble(
        uk, pk, u_old, nu, inv_dt, stokes=stokes, inlet_amp=amp
    )
    st = Blocks(u=jnp.asarray(uk), p=jnp.asarray(pk))
    linq = None if stokes else eval_state(disc, st)
    dF = diag_F(disc, nu, inv_dt, linq, stokes=stokes)
    r = residual(
        disc, nu, inv_dt, st, jnp.asarray(u_old), dF,
        stokes=stokes, inlet_amp=amp,
    )
    got = oracle.blocks_to_flat(np.asarray(r.u), np.asarray(r.p))
    np.testing.assert_allclose(got, rhs_dense, atol=1e-11)


def test_consistent_continuity_matches_newton_derivative():
    """The reference's Newton continuity rhs has the WRONG relative sign
    vs its Jacobian (+(q, div du) matrix row, NSSolver.cpp:461-463, against
    a +(q, div u_k) rhs term, :517-519): solving J d = rhs then yields
    div(d) = +div(u_k), doubling the iterate's divergence on every accepted
    full Newton step (the measured exactly-x2-per-step unsteady blowup).
    With ``consistent=True`` the rhs is the true -R on ALL rows: the
    directional derivative of rhs along any v equals -(J v) on the pressure
    rows too.  The pressure rows are linear in u, so one finite difference
    with eps=1 is exact."""
    sp, disc, oracle, rand = _setup()
    uk, pk = rand()
    u_old, _ = rand()
    vu, _ = rand()
    nu, inv_dt = 0.1, 5.0
    st = Blocks(u=jnp.asarray(uk), p=jnp.asarray(pk))
    linq = eval_state(disc, st)
    dF = diag_F(disc, nu, inv_dt, linq, stokes=False)
    Jv = apply_jacobian(
        disc, nu, inv_dt, linq, dF,
        Blocks(u=jnp.asarray(vu), p=jnp.zeros_like(st.p)), stokes=False,
    )

    def rp(consistent, u):
        r = residual(
            disc, nu, inv_dt, Blocks(u=jnp.asarray(u), p=st.p),
            jnp.asarray(u_old), dF, stokes=False, inlet_amp=0.0,
            consistent=consistent,
        )
        return np.asarray(r.p)

    mask = np.asarray(sp.p_active)
    d_ref = rp(False, uk + vu) - rp(False, uk)
    d_con = rp(True, uk + vu) - rp(True, uk)
    jp = np.asarray(Jv.p)
    # reference parity: d(rhs_p) = +(J v)_p -- the inconsistency
    np.testing.assert_allclose(d_ref[mask], jp[mask], atol=1e-11)
    # consistent: d(rhs_p) = -(J v)_p -- true Newton
    np.testing.assert_allclose(d_con[mask], -jp[mask], atol=1e-11)
    # velocity rows are untouched by the flag
    r_ref = residual(disc, nu, inv_dt, st, jnp.asarray(u_old), dF,
                     stokes=False, inlet_amp=0.0, consistent=False)
    r_con = residual(disc, nu, inv_dt, st, jnp.asarray(u_old), dF,
                     stokes=False, inlet_amp=0.0, consistent=True)
    np.testing.assert_allclose(np.asarray(r_ref.u), np.asarray(r_con.u))


def test_diag_matches_dense():
    sp, disc, oracle, rand = _setup()
    uk, pk = rand()
    u_old, _ = rand()
    nu, inv_dt = 0.02, 100.0
    A, _, Mp, _ = oracle.assemble(
        uk, pk, u_old, nu, inv_dt, stokes=False, inlet_amp=0.0
    )
    # dense diag before BC is unavailable post-elimination, so compare on
    # non-Dirichlet active rows only
    st = Blocks(u=jnp.asarray(uk), p=jnp.asarray(pk))
    dF = np.asarray(diag_F(disc, nu, inv_dt, eval_state(disc, st), stokes=False))
    du, _ = oracle.flat_to_blocks(np.diag(A))
    mask = np.asarray(sp.u_active & ~sp.u_dirichlet)
    np.testing.assert_allclose(dF[:, mask], du[:, mask], atol=1e-11)

    dMp = np.asarray(diag_Mp(disc, nu))
    _, dp = oracle.flat_to_blocks(np.diag(Mp))
    np.testing.assert_allclose(dMp[np.asarray(sp.p_active)], dp[np.asarray(sp.p_active)], atol=1e-11)


def test_pressure_mass_matches_dense():
    sp, disc, oracle, rand = _setup()
    uk, pk = rand()
    u_old, _ = rand()
    xu, xp = rand()
    nu = 0.5
    _, _, Mp, _ = oracle.assemble(uk, pk, u_old, nu, 0.0, stokes=False, inlet_amp=0.0)
    y_dense = Mp @ oracle.blocks_to_flat(np.zeros_like(xu), xp)
    _, yp_dense = oracle.flat_to_blocks(y_dense)
    yp = np.asarray(apply_Mp(disc, nu, jnp.asarray(xp)))
    np.testing.assert_allclose(yp, yp_dense, atol=1e-12)


def test_lift_drag_matches_dense():
    sp, disc, oracle, rand = _setup(nx=20, ny=10)
    u, p = rand()
    nu = 1.0 / 90.0
    d_ref, l_ref = oracle.lift_drag(u, p, nu)
    d, l = lift_drag_forces(disc, nu, Blocks(u=jnp.asarray(u), p=jnp.asarray(p)))
    np.testing.assert_allclose(float(d), d_ref, atol=1e-12)
    np.testing.assert_allclose(float(l), l_ref, atol=1e-12)
    assert abs(d_ref) > 0  # the masked faces actually contribute


def test_inactive_lanes_are_identity():
    sp, disc, oracle, rand = _setup()
    assert (~sp.u_active).sum() > 0, "test grid should have a hole"
    xu, xp = rand()
    # put garbage on inactive lanes; operator must return it unchanged
    xu = xu + 7.0 * ~sp.u_active
    xp = xp + 3.0 * ~sp.p_active
    st = Blocks(u=jnp.zeros_like(jnp.asarray(xu)), p=jnp.zeros_like(jnp.asarray(xp)))
    linq = eval_state(disc, st)
    dF = diag_F(disc, 1.0, 0.0, linq, stokes=False)
    y = apply_jacobian(
        disc, 1.0, 0.0, linq, dF, Blocks(u=jnp.asarray(xu), p=jnp.asarray(xp)),
        stokes=False,
    )
    np.testing.assert_allclose(
        np.asarray(y.u)[:, ~sp.u_active], xu[:, ~sp.u_active]
    )
    np.testing.assert_allclose(np.asarray(y.p)[~sp.p_active], xp[~sp.p_active])


def test_forcing_term_projection():
    """Constant body force: the weak-form projection sums to f * |domain|
    per component (partition of unity), and the residual picks it up."""
    import jax.numpy as jnp

    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops import Blocks, make_disc, residual, diag_F

    geo = make_channel_geometry(12, 6, with_cylinder=False)
    space = make_fe_space(geo, 2, 1)
    disc = make_disc(space, forcing=lambda x, y: (2.0 + 0 * x, -1.0 + 0 * x))
    area = geo.n_active_cells * geo.hx * geo.hy
    np.testing.assert_allclose(float(disc.forcing_rhs[0].sum()), 2.0 * area,
                               rtol=1e-12)
    np.testing.assert_allclose(float(disc.forcing_rhs[1].sum()), -1.0 * area,
                               rtol=1e-12)

    zero = Blocks(u=disc.zeros_u(), p=disc.zeros_p())
    dF = diag_F(disc, 0.1, 0.0, None, stokes=True)
    r_f = residual(disc, 0.1, 0.0, zero, zero.u, dF, stokes=True, inlet_amp=0.0)
    disc0 = make_disc(space)
    r_0 = residual(disc0, 0.1, 0.0, zero, zero.u, dF, stokes=True, inlet_amp=0.0)
    diff = np.asarray(r_f.u - r_0.u)
    free = np.asarray(~disc.u_dirichlet)
    np.testing.assert_allclose(
        diff[:, free[0] if free.ndim == 3 else free],
        np.asarray(disc.forcing_rhs)[:, free[0] if free.ndim == 3 else free],
        atol=1e-14,
    )


def test_pressure_laplacian_matches_dense():
    """apply_Lp vs an independent dense loop assembly (the Cahouet-Chabard
    Schur leg -- no reference analog; weak form (grad psi_j, grad psi_i)
    over active cells with symmetric elimination of the outlet column)."""
    from navier_stokes_solver_tpu.ops.matfree import (
        apply_Lp,
        diag_Lp,
        p_outlet_mask,
    )

    sp, disc, oracle, rand_state = _setup(deg=(2, 1))
    geo, t = sp.geo, sp.tables
    NPy, NPx = sp.NPy, sp.NPx
    n = NPy * NPx
    dphi = t.dphi_p.copy()
    dphi[:, :, 0] /= geo.hx
    dphi[:, :, 1] /= geo.hy
    JxW = t.w_q * geo.hx * geo.hy
    L = np.zeros((n, n))
    k = t.deg_p
    for iy in range(geo.ny):
        for ix in range(geo.nx):
            if not geo.cell_active[iy, ix]:
                continue
            nodes = [
                (k * iy + a) * NPx + (k * ix + b)
                for a in range(k + 1)
                for b in range(k + 1)
            ]
            for q in range(t.n_q):
                for i, gi in enumerate(nodes):
                    for j, gj in enumerate(nodes):
                        L[gi, gj] += JxW[q] * np.dot(dphi[q, i], dphi[q, j])
    # symmetric elimination: identity on outlet + non-existent rows/cols
    free = (np.asarray(disc.p_active) & ~np.asarray(p_outlet_mask(disc))).ravel()
    L[~free, :] = 0.0
    L[:, ~free] = 0.0
    L[~free, ~free] = 1.0

    _, p = rand_state()
    got = np.asarray(apply_Lp(disc, jnp.asarray(p)))
    want = (L @ p.ravel()).reshape(NPy, NPx)
    np.testing.assert_allclose(got, want, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(diag_Lp(disc)).ravel(), np.diag(L), atol=1e-12
    )

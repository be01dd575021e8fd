"""Distributed simplex (-M) backend: strip decomposition vs single tile.

The fused time step runs on one device and on a 4-strip decomposition of
the same triangle mesh over the virtual CPU mesh (shard_map + ppermute
seam exchange, dist/simplex.py); fields and forces must agree to solver
tolerance -- the -M analog of test_dist.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.dist import (
    decompose_simplex_disc,
    device_put_dist,
    gather_simplex_blocks,
    init_dist_state,
    make_dd_mesh,
    make_dist_time_step,
    scatter_simplex_blocks,
)
from navier_stokes_solver_tpu.geometry import make_channel_geometry
from navier_stokes_solver_tpu.ops import Blocks
from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step
from navier_stokes_solver_tpu.unstructured import (
    make_simplex_disc,
    triangulate_channel,
)


def _mesh_data(nx=16, ny=8):
    return triangulate_channel(make_channel_geometry(nx, ny))


def test_simplex_scatter_gather_roundtrip():
    data = _mesh_data()
    disc = make_simplex_disc(*data)
    dd = decompose_simplex_disc(*data, n_dev=4)
    rng = np.random.default_rng(0)
    x = Blocks(
        u=jnp.asarray(rng.standard_normal((2, disc.n_nodes_v))),
        p=jnp.asarray(rng.standard_normal(disc.n_nodes_p)),
    )
    back = gather_simplex_blocks(scatter_simplex_blocks(x, dd), dd)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(x.u))
    np.testing.assert_array_equal(np.asarray(back.p), np.asarray(x.p))


def test_simplex_dd_weights_partition_unity():
    """Seam weights sum to exactly 1 over every node's tile copies, so the
    weighted dot equals the global dot."""
    data = _mesh_data()
    disc = make_simplex_disc(*data)
    dd = decompose_simplex_disc(*data, n_dev=4)
    wv = np.asarray(dd.disc.seam_v.weight)
    acc = np.zeros(dd.n_nodes_v_global)
    for t in range(4):
        sel = dd.v_global[t] >= 0
        acc[dd.v_global[t][sel]] += wv[t][sel]
    np.testing.assert_allclose(acc, 1.0)
    # padding slots carry zero weight
    for t in range(4):
        assert np.all(wv[t][dd.v_global[t] < 0] == 0.0)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_simplex_dist_step_matches_single(n_dev):
    data = _mesh_data()
    disc = make_simplex_disc(*data)
    kw = dict(
        solver_type=1, prec_type=2, tol=1e-10, newton_max=3,
        krylov_maxiter=300,
    )
    step = make_time_step(disc, **kw)
    ts = initial_state(disc)
    for _ in range(2):
        ts = jax.jit(step)(ts, 0.05, 0.01)

    dd = decompose_simplex_disc(*data, n_dev=n_dev)
    mesh = make_dd_mesh(n_x=n_dev, devices=jax.devices()[:n_dev])
    sdisc = device_put_dist(dd.disc, mesh)
    dstep = make_dist_time_step(sdisc, mesh, **kw)
    tsd = device_put_dist(init_dist_state(sdisc), mesh)
    for _ in range(2):
        tsd = jax.jit(dstep)(tsd, 0.05, 0.01)

    assert int(np.ravel(np.asarray(tsd.step))[0]) == 2
    sol = gather_simplex_blocks(tsd.solution, dd)
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(ts.solution.u), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol.p), np.asarray(ts.solution.p), atol=1e-6
    )
    np.testing.assert_allclose(
        float(np.ravel(np.asarray(tsd.drag))[0]), float(ts.drag), atol=1e-7
    )
    np.testing.assert_allclose(
        float(np.ravel(np.asarray(tsd.lift))[0]), float(ts.lift), atol=1e-7
    )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_simplex_pmg_transfers_match_under_dd(n_dev):
    """Decomposition-aware P2->P1 transfers: per-strip prolong/restrict
    (pointwise gathers / 1-per-edge-multiplicity weighted sums + seam
    exchange) must reproduce the global transfers at every owned node."""
    from jax.sharding import PartitionSpec as P

    from navier_stokes_solver_tpu.dist.halo import _tile_tree, shard_map
    from navier_stokes_solver_tpu.unstructured import pmg

    data = _mesh_data()
    disc = make_simplex_disc(*data)
    dd = decompose_simplex_disc(*data, n_dev=n_dev)
    mesh = make_dd_mesh(n_x=n_dev, devices=jax.devices()[:n_dev])
    sdisc = device_put_dist(dd.disc, mesh)

    rng = np.random.default_rng(5)
    xc = rng.standard_normal((2, disc.n_nodes_p))
    rf = rng.standard_normal((2, disc.n_nodes_v))

    def sc(vec, ids_pad, n_loc):
        out = np.zeros((ids_pad.shape[0], 2, n_loc))
        for t in range(ids_pad.shape[0]):
            sel = ids_pad[t] >= 0
            out[t][:, sel] = vec[:, ids_pad[t][sel]]
        return jnp.asarray(out)

    xcs = device_put_dist(sc(xc, dd.p_global, dd.disc.n_nodes_p), mesh)
    rfs = device_put_dist(sc(rf, dd.v_global, dd.disc.n_nodes_v), mesh)

    def local(d, a, b):
        tile = _tile_tree(d)
        return (
            jnp.stack([pmg.prolong(tile, a[0])]),
            jnp.stack([pmg.restrict(tile, b[0])]),
        )

    f = shard_map(
        local, mesh=mesh, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x")), check_vma=False,
    )
    pf_s, rc_s = jax.jit(f)(sdisc, xcs, rfs)

    pf = np.asarray(pmg.prolong(disc, jnp.asarray(xc)))
    rc = np.asarray(pmg.restrict(disc, jnp.asarray(rf)))
    pf_s, rc_s = np.asarray(pf_s), np.asarray(rc_s)
    for t in range(n_dev):
        sv = dd.v_global[t] >= 0
        np.testing.assert_allclose(
            pf_s[t][:, sv], pf[:, dd.v_global[t][sv]], atol=1e-12
        )
        sp = dd.p_global[t] >= 0
        np.testing.assert_allclose(
            rc_s[t][:, sp], rc[:, dd.p_global[t][sp]], atol=1e-12
        )


def test_simplex_dist_step_pmg_cahouet_matches_single():
    """Fused step with the P2->P1 p-MG inner preconditioner AND the
    Cahouet-Chabard Schur under strip decomposition (per-tile pmg_*
    tables, seam-aware coarse solve, seam-aware Lp leg) vs the
    single-device run -- the -M analog of MG-under-tiles.  Cahouet is
    also what makes this config *converge* at tol 1e-10 (the mass Schur
    caps out: 900 iters -> res 5e-5; cahouet: 60 -> 7e-11)."""
    from navier_stokes_solver_tpu.precond import PrecondConfig

    data = _mesh_data()
    disc = make_simplex_disc(*data).replace(p_mg=True)
    kw = dict(
        solver_type=1, prec_type=1, tol=1e-10, newton_max=3,
        krylov_maxiter=600,
        precond_cfg=PrecondConfig(schur_mode="cahouet"),
    )
    step = make_time_step(disc, **kw)
    ts = initial_state(disc)
    for _ in range(2):
        ts = jax.jit(step)(ts, 0.05, 0.01)

    dd = decompose_simplex_disc(*data, n_dev=2, global_disc=disc)
    assert dd.disc.p_mg
    mesh = make_dd_mesh(n_x=2, devices=jax.devices()[:2])
    sdisc = device_put_dist(dd.disc, mesh)
    dstep = make_dist_time_step(sdisc, mesh, **kw)
    tsd = device_put_dist(init_dist_state(sdisc), mesh)
    for _ in range(2):
        tsd = jax.jit(dstep)(tsd, 0.05, 0.01)

    sol = gather_simplex_blocks(tsd.solution, dd)
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(ts.solution.u), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol.p), np.asarray(ts.solution.p), atol=1e-6
    )
    np.testing.assert_allclose(
        float(np.ravel(np.asarray(tsd.drag))[0]), float(ts.drag), atol=1e-7
    )


def test_simplex_dd_api_solve_fused_matches_single():
    """SolverOptions.dd on the -M path: the shard_map fused run must
    reproduce the single-device fused run."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    common = dict(mesh_size=(16, 8), Re=5.0, time_span=0.02, time_step=0.01,
                  solver_type=1, tolerance=1e-10, preconditioner_type=2,
                  verbose=False, multigrid=False, read_mesh_from_file=True)
    one = NSSolver(SolverOptions(**common))
    one.setup()
    one.solve_fused(newton_max=5, newton_tol=1e-9)

    dd = NSSolver(SolverOptions(**common, dd=4))
    dd.setup()
    dd.solve_fused(newton_max=5, newton_tol=1e-9)

    np.testing.assert_allclose(dd.drag_force, one.drag_force, atol=1e-8)
    u1, p1 = one.fields()
    u2, p2 = dd.fields()
    np.testing.assert_allclose(u2, u1, atol=1e-7)
    np.testing.assert_allclose(p2, p1, atol=1e-6)


def test_simplex_dd_host_solve_newton_matches_single():
    """Host-driven stationary solve_newton on a decomposed -M disc
    (DistKernels over x-strips) reproduces the single-device solve --
    the -M analog of test_dist's stationary equivalence (the reference's
    -M path is fully rank-parallel, NSSolver.cpp:144-209)."""
    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions

    common = dict(mesh_size=(16, 8), Re=10.0, solver_type=1,
                  tolerance=1e-10, preconditioner_type=2,
                  verbose=False, read_mesh_from_file=True)
    one = NSSolverStationary(SolverOptions(**common)).setup()
    one.solve_newton()
    one.compute_lift_drag()

    dd = NSSolverStationary(SolverOptions(**common, dd=2)).setup()
    dd.solve_newton()
    dd.compute_lift_drag()

    np.testing.assert_allclose(dd.drag_force, one.drag_force, atol=1e-8)
    np.testing.assert_allclose(dd.lift_force, one.lift_force, atol=1e-8)
    u1, p1 = one.fields()
    u2, p2 = dd.fields()
    np.testing.assert_allclose(u2, u1, atol=1e-8)
    np.testing.assert_allclose(p2, p1, atol=1e-7)


def test_simplex_dd_host_unsteady_solve_matches_single():
    """Host-driven unsteady time loop (NSSolver.solve) on a decomposed
    -M disc matches the single-device run step for step."""
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    common = dict(mesh_size=(16, 8), Re=5.0, time_span=0.02, time_step=0.01,
                  solver_type=1, tolerance=1e-10, preconditioner_type=1,
                  verbose=False, read_mesh_from_file=True)
    one = NSSolver(SolverOptions(**common))
    one.setup()
    one.solve()

    dd = NSSolver(SolverOptions(**common, dd=4))
    dd.setup()
    dd.solve()

    np.testing.assert_allclose(dd.drag_force, one.drag_force, atol=1e-8)
    u1, p1 = one.fields()
    u2, p2 = dd.fields()
    np.testing.assert_allclose(u2, u1, atol=1e-7)
    np.testing.assert_allclose(p2, p1, atol=1e-6)

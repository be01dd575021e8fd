"""Distributed (shard_map + halo exchange) vs single-chip equivalence.

The TPU analog of multi-node testing (SURVEY.md section 4): the same fused
time step runs on one device and on a virtual 8-device CPU mesh with real
1-D domain decomposition; fields must agree to solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.dist import (
    decompose_disc,
    device_put_dist,
    gather_blocks,
    init_dist_state,
    make_dist_time_step,
    make_mesh,
    scatter_blocks,
)
from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import Blocks, make_disc
from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step


def _disc(nx=32, ny=12):
    return make_disc(make_fe_space(make_channel_geometry(nx, ny), 2, 1))


def test_decompose_gather_roundtrip():
    disc = _disc()
    sdisc = decompose_disc(disc, 4)
    rng = np.random.default_rng(0)
    x = Blocks(
        u=jnp.asarray(rng.standard_normal((2,) + disc.NV)),
        p=jnp.asarray(rng.standard_normal(disc.NP)),
    )
    xs = scatter_blocks(x, sdisc)
    back = gather_blocks(xs, sdisc)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(x.u))
    np.testing.assert_array_equal(np.asarray(back.p), np.asarray(x.p))


def test_decompose_requires_divisibility():
    disc = _disc(30, 12)
    with pytest.raises(ValueError):
        decompose_disc(disc, 4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_step_matches_single_chip(n_dev):
    disc = _disc()
    kw = dict(solver_type=1, prec_type=2, tol=1e-10, newton_max=3, krylov_maxiter=300)

    step = make_time_step(disc, **kw)
    ts = jax.jit(step)(initial_state(disc), 0.01, 0.01)

    mesh = make_mesh(n_x=n_dev, devices=jax.devices()[:n_dev])
    sdisc = device_put_dist(decompose_disc(disc, n_dev), mesh)
    dstep = make_dist_time_step(sdisc, mesh, **kw)
    tsd = jax.jit(dstep)(device_put_dist(init_dist_state(sdisc), mesh), 0.01, 0.01)

    assert int(tsd.step[0]) == 1
    sol = gather_blocks(tsd.solution, sdisc)
    # iterative solves at tol 1e-10; different reduction orders shift the
    # Krylov trajectory slightly
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(ts.solution.u), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol.p), np.asarray(ts.solution.p), atol=1e-6
    )
    np.testing.assert_allclose(float(tsd.drag[0]), float(ts.drag), atol=1e-7)
    np.testing.assert_allclose(float(tsd.lift[0]), float(ts.lift), atol=1e-7)


@pytest.mark.parametrize("dd", [(4, 1), (4, 2)])
def test_dist_stationary_solve_matches_single_chip(dd):
    """Full distributed stationary solve_newton (the reference's benchmarked
    configuration, NSSolverStationary.cpp:579-647 under MPI) with the
    decomposition-aware multigrid chain active under the tiles."""
    from navier_stokes_solver_tpu.api import NSSolverStationary
    from navier_stokes_solver_tpu.api.base import SolverOptions
    from navier_stokes_solver_tpu.precond.mg import mg_level_shapes

    common = dict(
        mesh_size=(32, 12), Re=30.0, solver_type=1, tolerance=1e-10,
        preconditioner_type=1, verbose=False,
    )
    s1 = NSSolverStationary(SolverOptions(**common)).setup()
    s1.solve_newton()
    s1.compute_lift_drag()
    u1, p1 = s1.fields()

    s2 = NSSolverStationary(SolverOptions(**common, dd=dd)).setup()
    tile = jax.tree_util.tree_map(lambda a: a[0], s2.disc)
    assert len(mg_level_shapes(tile)) >= 2  # MG chain active under tiles
    s2.solve_newton()
    s2.compute_lift_drag()
    u2, p2 = s2.fields()

    np.testing.assert_allclose(u2, u1, atol=1e-8)
    np.testing.assert_allclose(p2, p1, atol=1e-7)
    np.testing.assert_allclose(s2.drag_force, s1.drag_force, atol=1e-8)
    # iteration counts are a first-class observable (solve_system prints
    # them, NSSolver.cpp:670); decomposition must not degrade them
    it1 = [h["krylov_iters"] for h in s1.history if "krylov_iters" in h]
    it2 = [h["krylov_iters"] for h in s2.history if "krylov_iters" in h]
    assert len(it1) == len(it2)
    assert sum(it2) <= sum(it1) * 1.1 + 5


def test_solve_fused_dd_matches_single():
    """API-level fused unsteady run under SolverOptions.dd: the shard_map
    time step must reproduce the single-device fused run."""
    from navier_stokes_solver_tpu.api import NSSolver
    from navier_stokes_solver_tpu.api.base import SolverOptions

    common = dict(
        mesh_size=(32, 12), Re=10.0, solver_type=1, tolerance=1e-9,
        preconditioner_type=1, time_span=0.02, time_step=0.01,
        verbose=False, degree_velocity=2, degree_pressure=1,
    )
    s1 = NSSolver(SolverOptions(**common)).setup()
    s1.solve_fused()
    u1, p1 = s1.fields()
    s2 = NSSolver(SolverOptions(**common, dd=(4, 1))).setup()
    s2.solve_fused()
    u2, p2 = s2.fields()
    np.testing.assert_allclose(u2, u1, atol=1e-6)
    np.testing.assert_allclose(p2, p1, atol=1e-4)
    np.testing.assert_allclose(s2.drag_force, s1.drag_force, atol=1e-6)
    assert s2.time_step_index == 2
    steps = [h for h in s2.history if h.get("phase") == "step"]
    assert len(steps) == 2 and all(
        np.isfinite(h["drag_force"]) for h in steps
    )


def test_solve_fused_dd_checkpoint_resume(tmp_path):
    """Elastic checkpoint/resume of the fused loop UNDER domain
    decomposition: a run split across two solve_fused calls through a
    checkpoint dir reproduces the uninterrupted dd run bitwise (the
    checkpoint stores gathered tile-stacked slabs; resume re-shards
    them over the mesh)."""
    from navier_stokes_solver_tpu.api import NSSolver
    from navier_stokes_solver_tpu.api.base import SolverOptions

    def opts():
        return SolverOptions(
            mesh_size=(32, 12), Re=10.0, solver_type=1, tolerance=1e-9,
            preconditioner_type=1, time_span=0.03, time_step=0.01,
            verbose=False, degree_velocity=2, degree_pressure=1, dd=(4, 1),
        )

    ref = NSSolver(opts()).setup()
    ref.solve_fused(newton_max=3, krylov_maxiter=200)
    ref_steps = [h for h in ref.history if h.get("phase") == "step"]
    assert len(ref_steps) == 3

    ck = str(tmp_path / "ck_dd")
    s1 = NSSolver(opts()).setup()
    s1.solve_fused(newton_max=3, krylov_maxiter=200,
                   checkpoint_dir=ck, max_steps_this_call=1)
    assert s1.time_step_index == 1  # partial
    import os as _os

    # regression: a single-chunk call must still write the checkpoint
    assert _os.path.exists(_os.path.join(ck, "time_state.npz"))

    s2 = NSSolver(opts()).setup()
    s2.solve_fused(newton_max=3, krylov_maxiter=200, checkpoint_dir=ck)
    assert s2.time_step_index == 3
    res_steps = [h for h in s2.history if h.get("phase") == "step"]
    for a, b in zip(ref_steps, res_steps):
        assert a["drag_force"] == b["drag_force"]
        assert a["krylov_iters"] == b["krylov_iters"]
    u1, p1 = ref.fields()
    u2, p2 = s2.fields()
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(p1, p2)


def test_dd_checkpoint_layout_mismatch_raises(tmp_path):
    """A dd checkpoint resumed under a different decomposition must fail
    loudly (the npz stores tile-stacked slabs, not global fields)."""
    import pytest as _pytest

    from navier_stokes_solver_tpu.api import NSSolver
    from navier_stokes_solver_tpu.api.base import SolverOptions

    common = dict(
        mesh_size=(32, 12), Re=10.0, solver_type=1, tolerance=1e-9,
        preconditioner_type=1, time_span=0.02, time_step=0.01,
        verbose=False, degree_velocity=2, degree_pressure=1,
    )
    ck = str(tmp_path / "ck_mismatch")
    s1 = NSSolver(SolverOptions(**common, dd=(4, 1))).setup()
    s1.solve_fused(newton_max=3, krylov_maxiter=200,
                   checkpoint_dir=ck, max_steps_this_call=1)
    s2 = NSSolver(SolverOptions(**common, dd=(2, 1))).setup()
    with _pytest.raises(ValueError, match="dd layout mismatch"):
        s2.solve_fused(newton_max=3, krylov_maxiter=200, checkpoint_dir=ck)


def test_seam_weighted_dot_matches_global():
    from navier_stokes_solver_tpu.ops.matfree import make_dot

    disc = _disc()
    n = 4
    mesh = make_mesh(n_x=n, devices=jax.devices()[:n])
    sdisc = decompose_disc(disc, n)
    rng = np.random.default_rng(1)
    x = Blocks(
        u=jnp.asarray(rng.standard_normal((2,) + disc.NV)),
        p=jnp.asarray(rng.standard_normal(disc.NP)),
    )
    xs = scatter_blocks(x, sdisc)
    expected = float(jnp.vdot(x.u, x.u) + jnp.vdot(x.p, x.p))

    from jax.sharding import PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map

    def local(disc_sh, xs_sh):
        tile = jax.tree_util.tree_map(lambda a: a[0], disc_sh)
        xt = jax.tree_util.tree_map(lambda a: a[0], xs_sh)
        return make_dot(tile)(xt, xt)

    got = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("x"), P("x")),
        out_specs=P(),
        check_vma=False,
    )(sdisc, xs)
    np.testing.assert_allclose(float(got), expected, rtol=1e-12)


def test_dist_2d_step_matches_single_chip():
    disc = _disc(32, 12)
    kw = dict(solver_type=1, prec_type=2, tol=1e-10, newton_max=3, krylov_maxiter=300)
    from navier_stokes_solver_tpu.dist import make_dd_mesh

    step = make_time_step(disc, **kw)
    ts = jax.jit(step)(initial_state(disc), 0.01, 0.01)

    mesh = make_dd_mesh(4, 2)
    sdisc = device_put_dist(decompose_disc(disc, 4, 2), mesh)
    dstep = make_dist_time_step(sdisc, mesh, **kw)
    tsd = jax.jit(dstep)(device_put_dist(init_dist_state(sdisc), mesh), 0.01, 0.01)

    sol = gather_blocks(tsd.solution, sdisc)
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(ts.solution.u), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol.p), np.asarray(ts.solution.p), atol=1e-6
    )
    np.testing.assert_allclose(float(tsd.drag[0]), float(ts.drag), atol=1e-7)


def test_dist_step_cahouet_lp_vcycle_matches_single():
    """Fused unsteady step with the Cahouet-Chabard Schur under 1-D
    decomposition: the (1/dt) Lp^-1 leg runs a pressure V-cycle over the
    decomposed MG chain (seam-weighted restriction + seam sums,
    precond.mg.make_lp_vcycle), and must reproduce the single-device
    cahouet step -- the structured twin of
    test_dist_simplex.test_simplex_dist_step_pmg_cahouet_matches_single."""
    from navier_stokes_solver_tpu.precond import PrecondConfig
    from navier_stokes_solver_tpu.precond.mg import attach_mg, mg_level_shapes

    disc = attach_mg(_disc())
    kw = dict(
        solver_type=1, prec_type=1, tol=1e-10, newton_max=3,
        krylov_maxiter=300,
        precond_cfg=PrecondConfig(schur_mode="cahouet"),
    )
    step = make_time_step(disc, **kw)
    ts = initial_state(disc)
    for _ in range(2):
        ts = jax.jit(step)(ts, 0.01, 0.01)

    mesh = make_mesh(n_x=2, devices=jax.devices()[:2])
    sdisc_host = decompose_disc(disc, 2)
    tile = jax.tree_util.tree_map(lambda a: a[0], sdisc_host)
    assert len(mg_level_shapes(tile)) >= 2  # Lp leg sees a real chain
    sdisc = device_put_dist(sdisc_host, mesh)
    dstep = make_dist_time_step(sdisc, mesh, **kw)
    tsd = device_put_dist(init_dist_state(sdisc), mesh)
    for _ in range(2):
        tsd = jax.jit(dstep)(tsd, 0.01, 0.01)

    sol = gather_blocks(tsd.solution, sdisc)
    np.testing.assert_allclose(
        np.asarray(sol.u), np.asarray(ts.solution.u), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol.p), np.asarray(ts.solution.p), atol=1e-6
    )
    np.testing.assert_allclose(float(tsd.drag[0]), float(ts.drag), atol=1e-7)

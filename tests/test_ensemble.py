"""vmap Reynolds-sweep ensemble (BASELINE config 5 analog)."""

import numpy as np

from navier_stokes_solver_tpu.ensemble.sweep import run_sweep
from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import make_disc


def test_sweep_batches_match_individual_runs():
    disc = make_disc(make_fe_space(make_channel_geometry(16, 8), 2, 1))
    kw = dict(solver_type=1, prec_type=2, tol=1e-9, newton_max=3, krylov_maxiter=200)
    nus = [0.05, 0.1]
    final, hist = run_sweep(disc, nus, 0.01, 2, **kw)
    assert hist["drag"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(hist["drag"])))

    # each batch member must match its standalone run
    from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step
    import jax

    step = make_time_step(disc, **kw)
    for b, nu in enumerate(nus):
        ts = initial_state(disc)
        for _ in range(2):
            ts = jax.jit(step)(ts, nu, 0.01)
        # solves stop at tol=1e-9; batched reductions round differently
        np.testing.assert_allclose(
            float(ts.drag), float(final.drag[b]), rtol=1e-6, atol=2e-9
        )


def test_sweep_sharded_over_ens_axis():
    import jax

    from navier_stokes_solver_tpu.dist import make_mesh

    disc = make_disc(make_fe_space(make_channel_geometry(16, 8), 2, 1))
    mesh = make_mesh(n_x=1, n_ens=8, devices=jax.devices()[:8])
    nus = [0.02 * (i + 1) for i in range(8)]
    final, hist = run_sweep(
        disc, nus, 0.01, 2, mesh=mesh,
        solver_type=1, prec_type=2, tol=1e-8, newton_max=2, krylov_maxiter=100,
    )
    assert hist["drag"].shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(hist["drag"])))

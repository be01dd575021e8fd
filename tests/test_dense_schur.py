"""Dense pressure-Schur legs of the -M simplex backend
(unstructured/dense.py): assembled matrices equal the matrix-free
applies column-by-column, the attached inverses are real inverses, and
the preconditioner path with dense legs reproduces the nested-solve
path's solution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry
from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.unstructured import (
    make_simplex_disc,
    triangulate_channel,
)
from navier_stokes_solver_tpu.unstructured import ops as sops
from navier_stokes_solver_tpu.unstructured.dense import (
    assemble_Lp,
    assemble_Mp_raw,
    attach_dense_schur,
)


@pytest.fixture(scope="module")
def disc():
    geo = make_channel_geometry(20, 8)
    return make_simplex_disc(*triangulate_channel(geo))


def _probe(apply_fn, n):
    eye = np.eye(n)
    return np.stack(
        [np.asarray(apply_fn(jnp.asarray(eye[j]))) for j in range(n)],
        axis=1,
    )


def test_assembled_matrices_match_matrix_free(disc):
    n = disc.n_nodes_p
    Lp = assemble_Lp(disc)
    Mp = assemble_Mp_raw(disc)
    Lp_probe = _probe(lambda x: sops.apply_Lp(disc, x), n)
    # apply_Mp is Mp_raw / nu; probe at nu = 1
    Mp_probe = _probe(lambda x: sops.apply_Mp(disc, 1.0, x), n)
    # orphan nodes (zero matrix-free rows) become identity rows in the
    # assembled matrices -- exclude them from the equality check
    orphan = np.asarray(Mp_probe.sum(axis=1) == 0.0)
    np.testing.assert_allclose(Lp[~orphan], Lp_probe[~orphan], atol=1e-13)
    np.testing.assert_allclose(Mp[~orphan], Mp_probe[~orphan], atol=1e-15)
    if orphan.any():
        oi = np.nonzero(orphan)[0]
        assert (Mp[oi, oi] == 1.0).all() and (Lp[oi, oi] == 1.0).all()
    # elimination convention: identity rows/cols on constrained nodes
    fixed = ~np.asarray(sops._p_free(disc))
    assert fixed.any()
    idx = np.nonzero(fixed)[0]
    assert (Lp[idx, :][:, ~fixed] == 0).all()
    assert (Lp[idx, idx] == 1.0).all()


def test_attached_inverses(disc):
    d2 = attach_dense_schur(disc)
    assert d2.dense_lp_inv is not None and d2.dense_mp_raw_inv is not None
    assert d2.dense_lp_inv.dtype == jnp.float32
    n = disc.n_nodes_p
    err = np.abs(
        assemble_Lp(disc) @ np.asarray(d2.dense_lp_inv, np.float64)
        - np.eye(n)
    ).max()
    assert err < 1e-4  # f32 inverse of an h^-2-conditioned operator


def test_attach_skips_when_too_large(disc):
    assert attach_dense_schur(disc, max_np=8) is disc


def test_preconditioner_with_dense_legs_matches_nested(disc):
    """blockTriangular + Cahouet vmult: dense legs vs nested solves give
    preconditioners close enough that a preconditioned solve agrees.

    The legs are exact vs loosely-converged inner solves, so the vmults
    differ by the inner tolerances; assert on the solved SYSTEM instead:
    FGMRES to 1e-10 with either preconditioner returns the same x."""
    from navier_stokes_solver_tpu.krylov import fgmres
    from navier_stokes_solver_tpu.ops import make_dot
    from navier_stokes_solver_tpu.precond import (
        LinearContext,
        PrecondConfig,
        make_preconditioner,
    )

    d2 = attach_dense_schur(disc)
    nu, inv_dt = 0.5, 100.0
    rng = np.random.default_rng(3)
    state = Blocks(
        u=jnp.asarray(rng.standard_normal((2, disc.n_nodes_v)) * 0.1),
        p=jnp.asarray(rng.standard_normal(disc.n_nodes_p) * 0.1),
    )
    rhs = Blocks(
        u=jnp.asarray(rng.standard_normal((2, disc.n_nodes_v))),
        p=jnp.asarray(rng.standard_normal(disc.n_nodes_p)),
    )
    cfg = PrecondConfig(schur_mode="cahouet")
    xs = {}
    for tag, d in (("nested", disc), ("dense", d2)):
        linq = sops.eval_state(d, state)
        dF = sops.diag_F(d, nu, inv_dt, linq, stokes=False)
        ctx = LinearContext(
            disc=d, nu=nu, inv_dt=inv_dt, stokes=False, linq=linq,
            diag_f=dF, state_u=state.u, ops=sops,
        )
        M = make_preconditioner(1, ctx, variant="unsteady", cfg=cfg)
        A = lambda x: sops.apply_jacobian(
            d, nu, inv_dt, linq, dF, x, stokes=False
        )
        x, info = fgmres(
            A, rhs,
            Blocks(u=jnp.zeros_like(rhs.u), p=jnp.zeros_like(rhs.p)),
            tol=1e-10, maxiter=400, M=M, dot=make_dot(d), basis=30,
        )
        assert not bool(info.iters == 0)
        xs[tag] = x
    for a, b in zip(
        jax.tree_util.tree_leaves(xs["nested"]),
        jax.tree_util.tree_leaves(xs["dense"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-8
        )

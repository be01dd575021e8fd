"""Pallas fused cell kernel vs the XLA eval/project pipeline.

Runs in interpret mode on the CPU test mesh; on TPU the same kernel
compiles via Mosaic (TPU default since round 4; NSTPU_PALLAS=1 forces it on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import Blocks, eval_state, make_disc
from navier_stokes_solver_tpu.ops.matfree import (
    _convection_linearized,
    _eval_v,
    _gather_v,
    _project_v,
)
from navier_stokes_solver_tpu.ops.pallas_cell import cell_apply_F_pallas


@pytest.mark.parametrize("deg", [(2, 1), (3, 2)])
@pytest.mark.parametrize("stokes", [True, False])
def test_cell_kernel_matches_xla(deg, stokes):
    disc = make_disc(make_fe_space(make_channel_geometry(20, 9), *deg))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2,) + disc.NV))
    if stokes:
        linq = None
    else:
        state = Blocks(
            u=jnp.asarray(0.3 * rng.standard_normal((2,) + disc.NV)),
            p=jnp.zeros(disc.NP, disc.dtype),
        )
        linq = eval_state(disc, state)
    nu, inv_dt = 0.05, 50.0

    # reference (XLA) local contributions, pre-scatter
    xv, xg = _eval_v(disc, x)
    if stokes:
        f_val, f_grad = None, nu * xg
    else:
        f_val = _convection_linearized(linq, xv, xg) + inv_dt * xv
        f_grad = nu * xg
    # replicate _project_v but capture the local (pre-scatter) array
    t = disc.tables
    w = jnp.asarray(t.w_q, disc.dtype) * (disc.hx * disc.hy)
    mask = disc.cell_mask
    loc_ref = jnp.einsum(
        "qm,qcyx->mcyx",
        jnp.asarray(t.dphi_v[:, :, 0], disc.dtype) * (w / disc.hx)[:, None],
        f_grad[:, :, 0] * mask,
    ) + jnp.einsum(
        "qm,qcyx->mcyx",
        jnp.asarray(t.dphi_v[:, :, 1], disc.dtype) * (w / disc.hy)[:, None],
        f_grad[:, :, 1] * mask,
    )
    if f_val is not None:
        loc_ref = loc_ref + jnp.einsum(
            "qm,qcyx->mcyx",
            jnp.asarray(t.phi_v, disc.dtype) * w[:, None],
            f_val * mask,
        )

    x_loc = _gather_v(disc, x)
    loc = cell_apply_F_pallas(disc, nu, inv_dt, linq, x_loc, stokes=stokes)
    np.testing.assert_allclose(
        np.asarray(loc), np.asarray(loc_ref), rtol=1e-12, atol=1e-12
    )


def test_apply_F_pallas_path(monkeypatch):
    """End-to-end apply_F with NSTPU_PALLAS=1 equals the XLA path.

    The Pallas path engages only for f32 operands (Mosaic has no f64 on
    TPU); the preconditioner context runs in f32, the f64 outer stays XLA.
    """
    import navier_stokes_solver_tpu.ops.matfree as mf

    disc = make_disc(make_fe_space(make_channel_geometry(16, 8), 2, 1))
    disc32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        disc,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2,) + disc.NV), jnp.float32)
    want = mf.apply_F(disc32, 0.1, 0.0, None, x, stokes=True)
    monkeypatch.setenv("NSTPU_PALLAS", "1")
    got = mf.apply_F(disc32, 0.1, 0.0, None, x, stokes=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

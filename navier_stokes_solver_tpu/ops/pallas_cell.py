"""Pallas TPU kernel for the fused per-cell velocity-block apply.

The hot inner loop of every Krylov iteration / smoother sweep is
``apply_F``: gather cell-local DoFs, contract against the reference-element
tables (MXU), apply the pointwise physics (VPU), contract with the test
functions (MXU), and scatter back.  The XLA path materializes the
intermediate quadrature-point tensors in HBM between einsums; this kernel
keeps one block of cells resident in VMEM and fuses the whole chain:

    x_loc [n_v, 2, C] --phi/dphi--> vals/grads --physics--> f --phi^T--> y_loc

The (bandwidth-only) lattice<->cell-local gather/scatter stays in XLA
(stride slices and dilated pads fuse well there); the kernel replaces the
FLOP-dense middle.  Contractions are ``[rows, C]`` matmuls with the cell
axis on the 128-lane dimension, mapping onto the MXU.

Default ON on TPU for f32 operands since round 4 (validated compiled on a
real v5e against the XLA path to f32 roundoff, ~2.4e-7 rel, at 32x12 /
100x70 / 300x100 in both regimes; measured 1.38x on the f32 matvec --
docs/PERF.md round-4 A/B).  ``NSTPU_PALLAS=0`` forces the XLA path,
``NSTPU_PALLAS=1`` forces the kernel (interpret mode on CPU, as used by
tests/test_pallas.py).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from navier_stokes_solver_tpu.ops.disc import Disc

__all__ = ["cell_apply_F_pallas", "pallas_enabled"]


def pallas_enabled() -> bool:
    """Read at trace time: kernel on TPU (default), XLA on CPU (default).

    The CPU default stays off because ``pallas_call`` only interprets
    there (orders of magnitude slower than the fused XLA pipeline);
    interpret-mode validation opts in with ``NSTPU_PALLAS=1``.
    """
    env = os.environ.get("NSTPU_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() != "cpu"


def _interpret() -> bool:
    # interpret mode on CPU (tests); compiled on TPU
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit, static_argnames=("stokes", "n_v", "n_q", "block_c")
)
def _run(
    x_flat,  # [2 n_v, C] rows ordered c * n_v + m
    uq_flat,  # [6 n_q, C] q-point state: uv0, uv1, du0/dx, du0/dy, du1/dx, du1/dy
    cell_w,  # [n_q, C] JxW * active-cell mask
    phi,  # [n_q, n_v]
    dx,  # [n_q, n_v] d/dx (scaled 1/hx)
    dy,  # [n_q, n_v]
    nu,
    inv_dt,
    *,
    stokes: bool,
    n_v: int,
    n_q: int,
    block_c: int,
):
    C = x_flat.shape[-1]
    dtype = x_flat.dtype

    def kernel(x_ref, uq_ref, w_ref, phi_ref, dx_ref, dy_ref, s_ref, o_ref):
        nu_ = s_ref[0, 0]
        inv_dt_ = s_ref[0, 1]
        x = x_ref[...]
        w = w_ref[...]
        P = phi_ref[...]
        Dx = dx_ref[...]
        Dy = dy_ref[...]

        def ev(tab, rows):
            return jax.lax.dot_general(
                tab, rows, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        x0, x1 = x[:n_v], x[n_v:]
        gx0, gy0 = ev(Dx, x0), ev(Dy, x0)
        gx1, gy1 = ev(Dx, x1), ev(Dy, x1)
        f_gx0, f_gy0 = nu_ * gx0, nu_ * gy0
        f_gx1, f_gy1 = nu_ * gx1, nu_ * gy1

        if not stokes:
            v0, v1 = ev(P, x0), ev(P, x1)
            uq = uq_ref[...]
            uv0 = uq[0 * n_q : 1 * n_q]
            uv1 = uq[1 * n_q : 2 * n_q]
            ug00 = uq[2 * n_q : 3 * n_q]
            ug01 = uq[3 * n_q : 4 * n_q]
            ug10 = uq[4 * n_q : 5 * n_q]
            ug11 = uq[5 * n_q : 6 * n_q]
            # (u_k . grad) dv + (dv . grad) u_k + dv / dt
            f_v0 = uv0 * gx0 + uv1 * gy0 + v0 * ug00 + v1 * ug01 + inv_dt_ * v0
            f_v1 = uv0 * gx1 + uv1 * gy1 + v0 * ug10 + v1 * ug11 + inv_dt_ * v1

        def proj(tab, f):
            return jax.lax.dot_general(
                tab.T, f * w, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        y0 = proj(Dx, f_gx0) + proj(Dy, f_gy0)
        y1 = proj(Dx, f_gx1) + proj(Dy, f_gy1)
        if not stokes:
            y0 = y0 + proj(P, f_v0)
            y1 = y1 + proj(P, f_v1)
        o_ref[...] = jnp.concatenate([y0, y1], axis=0)

    scalars = jnp.array([[nu, inv_dt]], dtype)
    spec_rows = lambda rows: pl.BlockSpec(
        (rows, block_c), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (n_q, n_v), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    # Mosaic cannot legalize the i64 index arithmetic that global
    # jax_enable_x64 injects (even for all-f32 kernels); trace the kernel
    # with x64 off when operands are f32 (the TPU path).  The f64 variant
    # exists only for CPU interpret-mode tests, which need x64 on.
    ctx = (
        jax.enable_x64(False)
        if dtype == jnp.float32
        else contextlib.nullcontext()
    )
    with ctx:
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2 * n_v, C), dtype),
            grid=(pl.cdiv(C, block_c),),
            in_specs=[
                spec_rows(2 * n_v),
                spec_rows(6 * n_q),
                spec_rows(n_q),
                tab_spec,
                tab_spec,
                tab_spec,
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=spec_rows(2 * n_v),
            interpret=_interpret(),
        )(x_flat, uq_flat, cell_w, phi, dx, dy, scalars)


def cell_apply_F_pallas(disc: Disc, nu, inv_dt, linq, x_loc, *, stokes: bool):
    """Fused per-cell compute of the velocity-block apply.

    ``x_loc``: gathered input DoFs [n_v, 2, ny, nx]; ``linq``: the
    LinearizationQ at quadrature points (ignored in the Stokes regime).
    Returns local test-function contributions [n_v, 2, ny, nx] equal to
    what the XLA eval/physics/project pipeline produces.
    """
    t = disc.tables
    n_v, n_q = t.n_v, t.n_q
    C = disc.ny * disc.nx
    dtype = x_loc.dtype

    x_flat = jnp.transpose(x_loc, (1, 0, 2, 3)).reshape(2 * n_v, C)
    if stokes or linq is None:
        uq_flat = jnp.zeros((6 * n_q, C), dtype)
    else:
        uq_flat = jnp.concatenate(
            [
                linq.u[:, 0].reshape(n_q, C),
                linq.u[:, 1].reshape(n_q, C),
                linq.gradu[:, 0, 0].reshape(n_q, C),
                linq.gradu[:, 0, 1].reshape(n_q, C),
                linq.gradu[:, 1, 0].reshape(n_q, C),
                linq.gradu[:, 1, 1].reshape(n_q, C),
            ]
        ).astype(dtype)

    w_q = jnp.asarray(t.w_q, dtype) * (disc.hx * disc.hy)
    cell_w = w_q[:, None] * disc.cell_mask.reshape(1, C).astype(dtype)
    phi = jnp.asarray(t.phi_v, dtype)
    dx = jnp.asarray(t.dphi_v[:, :, 0], dtype) / disc.hx
    dy = jnp.asarray(t.dphi_v[:, :, 1], dtype) / disc.hy

    block_c = 512 if C >= 512 else max(128, 1 << (C - 1).bit_length())
    pad = (-C) % block_c
    if pad:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, pad)))
        uq_flat = jnp.pad(uq_flat, ((0, 0), (0, pad)))
        cell_w = jnp.pad(cell_w, ((0, 0), (0, pad)))

    y_flat = _run(
        x_flat,
        uq_flat,
        cell_w,
        phi,
        dx,
        dy,
        jnp.asarray(nu, dtype),
        jnp.asarray(inv_dt, dtype),
        stokes=stokes,
        n_v=n_v,
        n_q=n_q,
        block_c=block_c,
    )
    if pad:
        y_flat = y_flat[:, :C]
    return jnp.transpose(
        y_flat.reshape(2, n_v, disc.ny, disc.nx), (1, 0, 2, 3)
    )

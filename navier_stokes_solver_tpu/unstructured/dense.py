"""Dense pressure-Schur legs for the ``-M`` simplex backend.

The simplex pressure space is small (P1 vertices: 2.5k at the 60x40
triangulation, 13.2k on the reference's finest shipped mesh,
new_mesh.msh), while its Schur solves dominate the per-outer-iteration
cost of blockDiagonal/blockTriangular: the pressure-mass CG runs 10-20
Jacobi-preconditioned iterations per application and the
Cahouet-Chabard Lp leg -- point-Jacobi preconditioned on this backend
-- burns up to ``inner_maxiter`` nested FGMRES iterations per outer
(docs/PERF.md round-4: the simplex path ran at a ~30x DoF-throughput
deficit vs the structured backend).

On TPU the idiomatic fix is to make the solve a *matmul*: assemble the
(constant per-mesh) pressure mass and pressure Laplacian host-side,
invert once, and apply ``A_inv @ rhs`` on the MXU -- one fused
memory-bound pass instead of a nested iteration.  This replaces the
reference's ILU(Mp)/CG inner solves (NSSolver.hpp:228-236) with an
*exact* solve, a strictly stronger preconditioner leg (equivalence
layer, docs/PARITY.md).

Assembly mirrors ``unstructured.ops`` exactly:

* ``Mp_raw``      -- unscaled pressure mass, no boundary mask
                     (``apply_Mp`` = ``Mp_raw / nu``);
* ``Lp``          -- pressure Laplacian with identity rows/columns on
                     ``~p_free`` (``apply_Lp`` convention).

Inverses are stored f32 (the preconditioner ``vmult_dtype``); the
outer Krylov's f64 accuracy is untouched (the preconditioner only
steers the iteration).  A consistency test probes the matrix-free
applies against the assembled matrices column-by-column
(tests/test_dense_schur.py).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["attach_dense_schur", "assemble_Mp_raw", "assemble_Lp"]

# Above this pressure-space size the inverses stop being "small" (memory
# n_p^2 * 4 bytes each; 16k -> 1 GB per matrix) -- fall back to the
# nested iterative legs.
DENSE_SCHUR_MAX_NP = int(os.environ.get("NSTPU_DENSE_SCHUR_MAX", "16384"))


def _element_tables(disc):
    """Host-side copies of the P1 element quantities used by the
    pressure operators (cf. unstructured.ops._grad_psi_p)."""
    from navier_stokes_solver_tpu.unstructured.elements import (
        make_simplex_tables,
    )

    t = make_simplex_tables()
    invJ = np.asarray(disc.invJ, dtype=np.float64)  # [T, 2, 2]
    detJ = np.asarray(disc.detJ, dtype=np.float64)  # [T]
    w_q = np.asarray(t.w_q, dtype=np.float64)  # [n_q]
    phi_p = np.asarray(t.phi_p, dtype=np.float64)  # [n_q, 3]
    dphi_p = np.asarray(t.dphi_p, dtype=np.float64)  # [n_q, 3, 2]
    wdet = w_q[:, None] * detJ[None, :]  # [n_q, T]
    dofs_p = np.asarray(disc.dofs_p)  # [T, 3]
    return phi_p, dphi_p, invJ, wdet, dofs_p


def _scatter_elem_matrices(Ke, dofs_p, n, free=None):
    """Accumulate per-element 3x3 matrices into a dense [n, n] array.

    ``free``: optional node mask; constrained rows/columns become
    identity (the ``apply_Lp`` elimination convention)."""
    A = np.zeros((n, n), dtype=np.float64)
    rows = np.repeat(dofs_p, 3, axis=1).reshape(-1)  # [T*9]
    cols = np.tile(dofs_p, (1, 3)).reshape(-1)
    np.add.at(A, (rows, cols), Ke.transpose(0, 2, 1).reshape(-1))
    if free is not None:
        A[~free, :] = 0.0
        A[:, ~free] = 0.0
        idx = np.nonzero(~free)[0]
        A[idx, idx] = 1.0
    # orphan nodes (touch no element, e.g. lattice points inside the
    # voxelized cylinder hole of triangulate_channel) have exactly-zero
    # rows in the matrix-free operator; make them identity so the matrix
    # is invertible.  Krylov vectors are identically zero there (the
    # operators and rhs projections return 0), so the legs agree.
    orphan = np.nonzero(np.diag(A) == 0.0)[0]
    A[orphan, orphan] = 1.0
    return A


def assemble_Mp_raw(disc) -> np.ndarray:
    """Dense unscaled pressure mass (the ``apply_Mp`` operator times nu;
    no boundary mask, matching NSSolver.hpp:228-236 semantics)."""
    phi_p, _, _, wdet, dofs_p = _element_tables(disc)
    # Ke[t, i, j] = sum_q wdet[q, t] phi_i(q) phi_j(q)
    Ke = np.einsum("qi,qj,qt->tij", phi_p, phi_p, wdet)
    return _scatter_elem_matrices(Ke, dofs_p, disc.n_nodes_p)


def assemble_Lp(disc) -> np.ndarray:
    """Dense pressure Laplacian with the ``apply_Lp`` elimination
    convention (identity on outlet/padding nodes)."""
    _, dphi_p, invJ, wdet, dofs_p = _element_tables(disc)
    gpsi = np.einsum("qnd,tdk->qnkt", dphi_p, invJ)  # physical grads
    Ke = np.einsum("qikt,qjkt,qt->tij", gpsi, gpsi, wdet)
    from navier_stokes_solver_tpu.unstructured.ops import _p_free

    free = np.asarray(_p_free(disc))
    return _scatter_elem_matrices(Ke, dofs_p, disc.n_nodes_p, free=free)


def attach_dense_schur(disc, max_np: int | None = None):
    """Return ``disc`` with f32 dense inverses of the pressure mass and
    pressure Laplacian attached (fields ``dense_mp_raw_inv`` /
    ``dense_lp_inv``), or unchanged when the pressure space is too large
    or the disc is strip-decomposed (the seam-partial operators are not
    the global matrices)."""
    import jax.numpy as jnp

    if disc.halo_axis is not None:
        return disc
    lim = DENSE_SCHUR_MAX_NP if max_np is None else max_np
    if disc.n_nodes_p > lim:
        return disc
    mp = assemble_Mp_raw(disc)
    lp = assemble_Lp(disc)
    mp_inv = np.linalg.inv(mp).astype(np.float32)
    lp_inv = np.linalg.inv(lp).astype(np.float32)
    return disc.replace(
        dense_mp_raw_inv=jnp.asarray(mp_inv),
        dense_lp_inv=jnp.asarray(lp_inv),
    )

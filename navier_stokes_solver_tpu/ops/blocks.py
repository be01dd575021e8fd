"""Block vectors (u, p) -- the TPU analog of Trilinos ``MPI::BlockVector``.

The reference's distributed block vectors (NSSolver.hpp:517-532) become a
pytree of dense sharded arrays: velocity ``[2, NVy, NVx]`` and pressure
``[NPy, NPx]``.  Inner products are plain global sums -- by construction all
vectors are zero on lattice nodes that do not exist in the reference
triangulation (cylinder-hole interior), so no masking is needed in reductions.
Under ``jit`` with sharded operands these sums lower to XLA ``psum``
collectives over the device mesh (the analog of Trilinos dot-product
allreduces).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Blocks", "vdot", "norm", "axpy", "scale", "zeros_like"]


class Blocks(NamedTuple):
    """A (velocity, pressure) block vector."""

    u: jax.Array  # [2, NVy, NVx] (or [..., 2, NVy, NVx] for ensembles)
    p: jax.Array  # [NPy, NPx]


def vdot(x: Blocks, y: Blocks) -> jax.Array:
    return jnp.vdot(x.u, y.u) + jnp.vdot(x.p, y.p)


def norm(x: Blocks) -> jax.Array:
    """l2 norm over all blocks (Trilinos BlockVector::l2_norm semantics)."""
    return jnp.sqrt(vdot(x, x))


def axpy(a, x: Blocks, y: Blocks) -> Blocks:
    """a * x + y."""
    return Blocks(u=a * x.u + y.u, p=a * x.p + y.p)


def scale(a, x: Blocks) -> Blocks:
    return Blocks(u=a * x.u, p=a * x.p)


def zeros_like(x: Blocks) -> Blocks:
    return Blocks(u=jnp.zeros_like(x.u), p=jnp.zeros_like(x.p))

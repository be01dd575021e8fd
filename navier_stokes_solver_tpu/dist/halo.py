"""1-D domain decomposition with explicit halo exchange under ``shard_map``.

TPU-native equivalent of the reference's MPI domain decomposition
(deal.II ``parallel::fullydistributed::Triangulation`` + Trilinos ghost
exchange, NSSolver.cpp:98-102, :560-562; SURVEY.md N2/2c): the channel is
split into ``n_dev`` tiles of cell columns along x.  Each tile stores its
lattice-node slab *including* the seam columns shared with its neighbors
(the analog of ghost DoFs).  Inside ``shard_map``:

  * cell-local operator scatters complete their seam partial sums with two
    ``lax.ppermute`` ring exchanges (``ops.matfree._seam_sum``) -- the
    ``compress(VectorOperation::add)`` analog, riding ICI;
  * inner products weight duplicated seam columns by 1/2 (exact in floating
    point) and ``psum`` over the mesh axis -- the dot-product allreduce
    analog;
  * lift/drag reduces with ``psum`` (``Utilities::MPI::sum`` analog,
    NSSolver.cpp:933-934).

Host-side arrays carry a leading tile axis ``[n_dev, ...]`` sharded over the
mesh's ``'x'`` axis, so a single uniform ``PartitionSpec('x')`` prefix
distributes every leaf.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = [
    "decompose_disc",
    "scatter_blocks",
    "gather_blocks",
    "init_dist_state",
    "make_dist_time_step",
    "device_put_dist",
]


def _tile_tree(tree: Any):
    """Drop the leading tile axis of every leaf (inside shard_map a shard
    has leading extent 1)."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _stack_tree(tree: Any):
    """Re-add a leading tile axis of extent 1 to every leaf."""
    return jax.tree_util.tree_map(lambda a: a[None], tree)


def decompose_disc(disc: Disc, n_dev: int, axis: str = "x") -> Disc:
    """Split a global Disc into ``n_dev`` x-tiles, stacked on a leading axis.

    Requires ``disc.nx % n_dev == 0`` (the reference likewise requires the
    mesh to split across ranks).  The returned Disc has tile-local static
    config (``nx = nx/n_dev``, ``halo_axis`` set) and every array leaf of
    shape ``[n_dev, ...tile shape...]``.
    """
    if disc.nx % n_dev != 0:
        raise ValueError(
            f"nx = {disc.nx} not divisible by n_dev = {n_dev}; "
            "choose a mesh size that splits across the device mesh"
        )
    nxl = disc.nx // n_dev
    kv, kp = disc.deg_v, disc.deg_p

    def lat(a, k):
        a = np.asarray(a)
        return np.stack(
            [a[..., k * i * nxl : k * (i + 1) * nxl + 1] for i in range(n_dev)]
        )

    def cell(a):
        a = np.asarray(a)
        return np.stack(
            [a[..., i * nxl : (i + 1) * nxl] for i in range(n_dev)]
        )

    def rep(a):
        a = np.asarray(a)
        return np.stack([a] * n_dev)

    return disc.replace(
        nx=nxl,
        halo_axis=axis,
        halo_n=n_dev,
        mg=None,  # multigrid chain is single-tile; tiles fall back to Jacobi
        cell_mask=jnp.asarray(cell(disc.cell_mask)),
        u_active=jnp.asarray(lat(disc.u_active, kv)),
        p_active=jnp.asarray(lat(disc.p_active, kp)),
        u_dirichlet=jnp.asarray(lat(disc.u_dirichlet, kv)),
        u_inlet=jnp.asarray(lat(disc.u_inlet, kv)),
        inlet_profile1=jnp.asarray(rep(disc.inlet_profile1)),
        neumann_rhs1=jnp.asarray(lat(disc.neumann_rhs1, kv)),
        cyl_face_mask=jnp.asarray(cell(disc.cyl_face_mask)),
    )


def scatter_blocks(x: Blocks, sdisc: Disc) -> Blocks:
    """Global (u, p) -> stacked tile slabs (seam columns duplicated)."""
    n, nxl = sdisc.halo_n, sdisc.nx
    kv, kp = sdisc.deg_v, sdisc.deg_p
    u = np.asarray(x.u)
    p = np.asarray(x.p)
    return Blocks(
        u=jnp.asarray(
            np.stack(
                [u[..., kv * i * nxl : kv * (i + 1) * nxl + 1] for i in range(n)]
            )
        ),
        p=jnp.asarray(
            np.stack(
                [p[..., kp * i * nxl : kp * (i + 1) * nxl + 1] for i in range(n)]
            )
        ),
    )


def gather_blocks(xs: Blocks, sdisc: Disc) -> Blocks:
    """Stacked tile slabs -> global (u, p), dropping duplicate seams."""
    n = sdisc.halo_n
    u = np.asarray(xs.u)
    p = np.asarray(xs.p)
    parts_u = [u[0]] + [u[i][..., 1:] for i in range(1, n)]
    parts_p = [p[0]] + [p[i][..., 1:] for i in range(1, n)]
    return Blocks(
        u=jnp.asarray(np.concatenate(parts_u, axis=-1)),
        p=jnp.asarray(np.concatenate(parts_p, axis=-1)),
    )


def init_dist_state(sdisc: Disc):
    """Stacked initial TimeState for a decomposed Disc."""
    tile = _tile_tree(sdisc)
    ts = initial_state(tile)
    return jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * sdisc.halo_n), ts
    )


def device_put_dist(tree: Any, mesh: Mesh, axis: str = "x"):
    """Shard every leaf's leading tile axis over the mesh axis."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def make_dist_time_step(sdisc: Disc, mesh: Mesh, axis: str = "x", **kwargs):
    """Build a sharded ``step(ts_stacked, nu, dt) -> ts_stacked``.

    The entire fused implicit-Euler step (Newton + line search + Krylov +
    preconditioner + lift/drag) runs inside one ``shard_map`` region; all
    communication is the seam ``ppermute`` pair per operator application
    plus ``psum`` reductions.
    """

    def local_step(disc_sh: Disc, ts_sh, nu, dt):
        tile = _tile_tree(disc_sh)
        ts = _tile_tree(ts_sh)
        step = make_time_step(tile, **kwargs)
        return _stack_tree(step(ts, nu, dt))

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    def step(ts_stacked, nu, dt):
        return sharded(sdisc, ts_stacked, nu, dt)

    return step

"""1-D/2-D domain decomposition with explicit halo exchange under ``shard_map``.

TPU-native equivalent of the reference's MPI domain decomposition
(deal.II ``parallel::fullydistributed::Triangulation`` + Trilinos ghost
exchange, NSSolver.cpp:98-102, :560-562; SURVEY.md N2/2c): the channel is
split into tiles of cells along x (and optionally y).  Each tile stores its
lattice-node slab *including* the seam rows/columns shared with its
neighbors (the analog of ghost DoFs).  Inside ``shard_map``:

  * cell-local operator scatters complete their seam partial sums with
    ``lax.ppermute`` ring exchanges per axis (``ops.matfree._seam_sum``) --
    the ``compress(VectorOperation::add)`` analog, riding ICI; the
    x-exchange runs before the y-exchange so corner nodes sum correctly;
  * inner products weight duplicated seams by 1/2 per axis (corners 1/4 --
    exact in floating point) and ``psum`` over the mesh axes;
  * lift/drag reduces with ``psum`` (``Utilities::MPI::sum`` analog,
    NSSolver.cpp:933-934).

Host-side arrays carry a leading tile axis ``[n_y * n_x, ...]`` (y-major)
sharded over the mesh's ``('y', 'x')`` axes, so a single uniform
``PartitionSpec(('y', 'x'))`` prefix distributes every leaf.
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
    "make_dd_mesh",
]


def make_dd_mesh(n_x: int, n_y: int = 1, devices=None) -> Mesh:
    """Device mesh with ('y', 'x') axes for the 2-D tile decomposition."""
    devices = list(devices if devices is not None else jax.devices())
    arr = np.array(devices[: n_x * n_y]).reshape(n_y, n_x)
    return Mesh(arr, ("y", "x"))


def _tile_tree(tree: Any):
    """Drop the leading tile axis of every leaf (inside shard_map a shard
    has leading extent 1)."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _stack_tree(tree: Any):
    """Re-add a leading tile axis of extent 1 to every leaf."""
    return jax.tree_util.tree_map(lambda a: a[None], tree)


def _check_divisible(n: int, parts: int, what: str):
    if n % parts != 0:
        raise ValueError(
            f"{what} = {n} not divisible by {parts}; choose a mesh size "
            "that splits across the device mesh"
        )


def _decomposed_mg_chain(
    disc: Disc,
    n_dev: int,
    n_dev_y: int,
    axis: str,
    axis_y: str,
    *,
    min_cells: int,
    max_levels: int,
):
    """Build the MG chain for a decomposed disc by per-tile ceil-halving.

    Every level's global cell counts are (local count) x (tile count), so
    divisibility holds at every depth.  Transfer matrices are *tile-local*
    (evaluated on the local unit-interval grids): prolongation of a
    continuous nodal FE function is tile-local exact (seam nodes evaluate
    identically from either adjacent cell), and restriction becomes exact
    after seam-weighting + the standard seam-sum exchange.  The matrices
    are identical across tiles and stored tile-stacked so the whole Disc
    pytree shards uniformly over the device mesh.
    """
    from navier_stokes_solver_tpu.elements import make_taylor_hood
    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops.disc import MGEdge, make_disc
    from navier_stokes_solver_tpu.precond.mg import _interp_1d

    from navier_stokes_solver_tpu.precond.mg import _coarse_shape

    tables = make_taylor_hood(disc.deg_v, disc.deg_p, disc.n_q1d)
    nodes = tables.nodes_v
    deg = disc.deg_v
    dtype = disc.dtype
    n_tiles = n_dev * n_dev_y
    # fixed physical tile extent (aspect-aware semi-coarsening, see
    # precond.mg._coarse_shape)
    Wt = disc.hx * disc.nx / n_dev
    Ht = disc.hy * disc.ny / n_dev_y

    def stack(mat):
        return jnp.asarray(np.broadcast_to(mat, (n_tiles,) + mat.shape), dtype)

    def build(nxl: int, nyl: int, level: int):
        nxl_c, nyl_c = _coarse_shape(nxl, nyl, Wt / nxl, Ht / nyl)
        nx_c, ny_c = nxl_c * n_dev, nyl_c * n_dev_y
        if (
            level >= max_levels
            or nx_c * ny_c < min_cells
            or ny_c < 2
            or (nxl_c == nxl and nyl_c == nyl)
        ):
            return None
        geo_c = make_channel_geometry(nx_c, ny_c)
        space_c = make_fe_space(geo_c, disc.deg_v, disc.deg_p)
        disc_c = make_disc(space_c, dtype)
        sdisc_c = decompose_disc(
            disc_c, n_dev, n_dev_y, axis, axis_y, multigrid=False
        )
        edge_down = build(nxl_c, nyl_c, level + 1)
        if edge_down is not None:
            sdisc_c = sdisc_c.replace(mg=edge_down)
        return MGEdge(
            coarse=sdisc_c,
            Pvx=stack(_interp_1d(nxl_c, nxl, deg, nodes)),
            Pvy=stack(_interp_1d(nyl_c, nyl, deg, nodes)),
            Evx=stack(_interp_1d(nxl, nxl_c, deg, nodes)),
            Evy=stack(_interp_1d(nyl, nyl_c, deg, nodes)),
            Ppx=stack(_interp_1d(nxl_c, nxl, disc.deg_p, tables.nodes_p)),
            Ppy=stack(_interp_1d(nyl_c, nyl, disc.deg_p, tables.nodes_p)),
        )

    return build(disc.nx // n_dev, disc.ny // n_dev_y, 0)


def decompose_disc(
    disc: Disc,
    n_dev: int,
    n_dev_y: int = 1,
    axis: str = "x",
    axis_y: str = "y",
    multigrid: bool | None = None,
    mg_min_cells: int = 48,
    mg_max_levels: int = 8,  # aligned with precond.mg.attach_mg's default
) -> Disc:
    """Split a global Disc into ``n_dev_y x n_dev`` tiles, stacked on a
    leading (y-major) axis.

    The returned Disc has tile-local static config (``nx = nx/n_dev``,
    ``ny = ny/n_dev_y``, halo axes set) and every array leaf of shape
    ``[n_dev_y * n_dev, ...tile shape...]``.

    ``multigrid``: attach a decomposition-aware geometric-MG chain (the
    distributed analog of Trilinos ILU/AMG operating on the distributed
    matrix, NSSolverStationary.hpp:225-231).  Levels are built by
    *per-tile* ceil-halving of the cell counts (every level stays
    tile-divisible by construction); transfers are tile-local 1-D tensor
    factors, with seam-weighted restriction completed by the same
    ``ppermute`` seam exchange as operator scatters (see
    ``precond.mg.make_mg_vcycle``).  Default: inherit (chain attached iff
    the input disc has one).
    """
    _check_divisible(disc.nx, n_dev, "nx")
    _check_divisible(disc.ny, n_dev_y, "ny")
    if multigrid is None:
        multigrid = disc.mg is not None
    mg_chain = (
        _decomposed_mg_chain(
            disc, n_dev, n_dev_y, axis, axis_y,
            min_cells=mg_min_cells, max_levels=mg_max_levels,
        )
        if multigrid
        else None
    )
    nxl = disc.nx // n_dev
    nyl = disc.ny // n_dev_y
    kv, kp = disc.deg_v, disc.deg_p

    def tiles(a, ksli_y, ksli_x):
        a = np.asarray(a)
        out = []
        for iy in range(n_dev_y):
            for ix in range(n_dev):
                sl = a
                if ksli_y is not None:
                    sl = sl[..., ksli_y(iy), :] if a.ndim >= 2 else sl
                if ksli_x is not None:
                    sl = sl[..., ksli_x(ix)]
                out.append(sl)
        return np.stack(out)

    def lat_y(k):
        return lambda iy: slice(k * iy * nyl, k * (iy + 1) * nyl + 1)

    def lat_x(k):
        return lambda ix: slice(k * ix * nxl, k * (ix + 1) * nxl + 1)

    def cell_y(iy):
        return slice(iy * nyl, (iy + 1) * nyl)

    def cell_x(ix):
        return slice(ix * nxl, (ix + 1) * nxl)

    def prof(a, k):
        # [NVy] -> per-tile y-slices, replicated across x tiles
        a = np.asarray(a)
        return np.stack(
            [
                a[k * iy * nyl : k * (iy + 1) * nyl + 1]
                for iy in range(n_dev_y)
                for _ in range(n_dev)
            ]
        )

    return disc.replace(
        nx=nxl,
        ny=nyl,
        halo_axis=axis,
        halo_n=n_dev,
        halo_axis_y=axis_y if n_dev_y > 1 else None,
        halo_ny=n_dev_y,
        mg=mg_chain,
        cell_mask=jnp.asarray(tiles(disc.cell_mask, cell_y, cell_x)),
        u_active=jnp.asarray(tiles(disc.u_active, lat_y(kv), lat_x(kv))),
        p_active=jnp.asarray(tiles(disc.p_active, lat_y(kp), lat_x(kp))),
        u_dirichlet=jnp.asarray(
            tiles(disc.u_dirichlet, lat_y(kv), lat_x(kv))
        ),
        u_inlet=jnp.asarray(tiles(disc.u_inlet, lat_y(kv), lat_x(kv))),
        inlet_profile1=jnp.asarray(prof(disc.inlet_profile1, kv)),
        neumann_rhs1=jnp.asarray(
            tiles(disc.neumann_rhs1, lat_y(kv), lat_x(kv))
        ),
        forcing_rhs=(
            None
            if disc.forcing_rhs is None
            else jnp.asarray(tiles(disc.forcing_rhs, lat_y(kv), lat_x(kv)))
        ),
        cyl_face_mask=jnp.asarray(tiles(disc.cyl_face_mask, cell_y, cell_x)),
    )


def scatter_blocks(x: Blocks, sdisc: Disc) -> Blocks:
    """Global (u, p) -> stacked tile slabs (seams duplicated)."""
    nx_t, ny_t = sdisc.halo_n, sdisc.halo_ny
    nxl, nyl = sdisc.nx, sdisc.ny
    kv, kp = sdisc.deg_v, sdisc.deg_p

    def split(a, k):
        a = np.asarray(a)
        return np.stack(
            [
                a[
                    ...,
                    k * iy * nyl : k * (iy + 1) * nyl + 1,
                    k * ix * nxl : k * (ix + 1) * nxl + 1,
                ]
                for iy in range(ny_t)
                for ix in range(nx_t)
            ]
        )

    return Blocks(u=jnp.asarray(split(x.u, kv)), p=jnp.asarray(split(x.p, kp)))


def gather_blocks(xs: Blocks, sdisc: Disc) -> Blocks:
    """Stacked tile slabs -> global (u, p), dropping duplicate seams."""
    nx_t, ny_t = sdisc.halo_n, sdisc.halo_ny

    def join(a):
        a = np.asarray(a)
        rows = []
        for iy in range(ny_t):
            cols = []
            for ix in range(nx_t):
                t = a[iy * nx_t + ix]
                if ix > 0:
                    t = t[..., 1:]
                cols.append(t)
            row = np.concatenate(cols, axis=-1)
            if iy > 0:
                row = row[..., 1:, :]
            rows.append(row)
        return np.concatenate(rows, axis=-2)

    return Blocks(u=jnp.asarray(join(xs.u)), p=jnp.asarray(join(xs.p)))


def init_dist_state(sdisc: Disc):
    """Stacked initial TimeState for a decomposed Disc."""
    tile = _tile_tree(sdisc)
    ts = initial_state(tile)
    n = sdisc.halo_n * sdisc.halo_ny
    return jax.tree_util.tree_map(lambda a: jnp.stack([a] * n), ts)


def device_put_dist(tree: Any, mesh: Mesh, axis=None):
    """Shard every leaf's leading tile axis over the mesh's tile axes."""
    if axis is None:
        axis = tuple(a for a in ("y", "x") if a in mesh.axis_names)
        if len(axis) == 1:
            axis = axis[0]
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def make_dist_time_step(sdisc: Disc, mesh: Mesh, **kwargs):
    """Build a sharded ``step(ts_stacked, nu, dt) -> ts_stacked``.

    The entire fused implicit-Euler step (Newton + line search + Krylov +
    preconditioner + lift/drag) runs inside one ``shard_map`` region; all
    communication is the seam ``ppermute`` exchanges per operator
    application plus ``psum`` reductions.
    """
    axes = tuple(
        a
        for a, n in ((sdisc.halo_axis_y, sdisc.halo_ny), (sdisc.halo_axis, sdisc.halo_n))
        if a is not None and n > 1
    )
    # A 1x1 "decomposition" has no sharded axis: run the tile replicated
    # (spec P() = no partitioning) instead of indexing an empty tuple.
    if not axes:
        spec = P()
    else:
        spec = P(axes if len(axes) > 1 else axes[0])

    def local_step(disc_sh: Disc, ts_sh, nu, dt):
        tile = _tile_tree(disc_sh)
        ts = _tile_tree(ts_sh)
        step = make_time_step(tile, **kwargs)
        return _stack_tree(step(ts, nu, dt))

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, spec, P(), P()),
        out_specs=spec,
        check_vma=False,
    )

    def step(ts_stacked, nu, dt):
        return sharded(sdisc, ts_stacked, nu, dt)

    return step

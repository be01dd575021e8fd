"""Device mesh construction and sharding of discretization data."""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.ops.disc import Disc

__all__ = ["make_mesh", "shard_disc", "shard_blocks"]


def make_mesh(
    n_x: int | None = None, n_ens: int = 1, devices=None
) -> Mesh:
    """1D/2D device mesh with axes ('ens', 'x').

    ``x`` decomposes the channel (domain decomposition -- the MPI-rank
    analog); ``ens`` shards ensemble members (parameter sweeps).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_x is None:
        n_x = len(devices) // n_ens
    assert n_x * n_ens <= len(devices), (n_x, n_ens, len(devices))
    arr = np.array(devices[: n_x * n_ens]).reshape(n_ens, n_x)
    return Mesh(arr, ("ens", "x"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def shard_disc(disc: Disc, mesh: Mesh) -> Disc:
    """Place discretization arrays with x-axis sharding."""
    return disc.replace(
        cell_mask=jax.device_put(disc.cell_mask, _ns(mesh, None, "x")),
        u_active=jax.device_put(disc.u_active, _ns(mesh, None, "x")),
        p_active=jax.device_put(disc.p_active, _ns(mesh, None, "x")),
        u_dirichlet=jax.device_put(disc.u_dirichlet, _ns(mesh, None, "x")),
        u_inlet=jax.device_put(disc.u_inlet, _ns(mesh, None, "x")),
        inlet_profile1=jax.device_put(disc.inlet_profile1, _ns(mesh)),
        neumann_rhs1=jax.device_put(disc.neumann_rhs1, _ns(mesh, None, None, "x")),
        cyl_face_mask=jax.device_put(disc.cyl_face_mask, _ns(mesh, None, None, "x")),
    )


def shard_blocks(x: Blocks, mesh: Mesh, *, ens_axis: bool = False) -> Blocks:
    """Shard a block vector along x (and optionally a leading ensemble axis)."""
    if ens_axis:
        return Blocks(
            u=jax.device_put(x.u, _ns(mesh, "ens", None, None, "x")),
            p=jax.device_put(x.p, _ns(mesh, "ens", None, "x")),
        )
    return Blocks(
        u=jax.device_put(x.u, _ns(mesh, None, None, "x")),
        p=jax.device_put(x.p, _ns(mesh, None, "x")),
    )

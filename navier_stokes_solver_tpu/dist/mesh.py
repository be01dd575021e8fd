"""Device mesh construction for the domain-decomposition + ensemble axes."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    n_x: int | None = None, n_ens: int = 1, devices=None
) -> Mesh:
    """1D/2D device mesh with axes ('ens', 'x').

    ``x`` decomposes the channel (domain decomposition -- the MPI-rank
    analog, used by ``dist.halo``); ``ens`` shards ensemble members
    (parameter sweeps, BASELINE.json config 5).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_x is None:
        n_x = len(devices) // n_ens
    assert n_x * n_ens <= len(devices), (n_x, n_ens, len(devices))
    arr = np.array(devices[: n_x * n_ens]).reshape(n_ens, n_x)
    return Mesh(arr, ("ens", "x"))

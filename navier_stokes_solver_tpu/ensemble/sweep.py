"""vmap-batched Reynolds sweeps of the fused unsteady step."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from navier_stokes_solver_tpu.ops.disc import Disc
from navier_stokes_solver_tpu.timeloop import TimeState, initial_state, make_time_step

__all__ = ["make_ensemble_step", "run_sweep"]


def make_ensemble_step(disc: Disc, **step_kwargs):
    """Batched step: state has a leading ensemble axis, ``nu`` is [B]."""
    step = make_time_step(disc, **step_kwargs)
    return jax.vmap(step, in_axes=(0, 0, None))


def initial_ensemble_state(disc: Disc, batch: int) -> TimeState:
    one = initial_state(disc)
    return jax.tree_util.tree_map(
        lambda l: jnp.broadcast_to(l, (batch,) + l.shape), one
    )


def run_sweep(disc: Disc, nus, dt, n_steps: int, mesh=None, **step_kwargs):
    """Run B simultaneous unsteady simulations (one per viscosity).

    ``mesh``: optional device mesh with an ``'ens'`` axis; batch members are
    then sharded across devices (the TPU analog of the reference's separate
    SLURM jobs per parameter, run_sim_steady.sh).  Returns the final batched
    state and per-step [T, B] drag/lift arrays.
    """
    nus = jnp.asarray(nus, disc.dtype)
    batch = nus.shape[0]
    step = make_ensemble_step(disc, **step_kwargs)
    ts0 = initial_ensemble_state(disc, batch)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ens = NamedSharding(mesh, P("ens"))
        nus = jax.device_put(nus, ens)
        ts0 = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, NamedSharding(mesh, P("ens"))), ts0
        )

    def body(ts, _):
        ts = step(ts, nus, dt)
        return ts, (ts.drag, ts.lift)

    final, (drag, lift) = lax.scan(body, ts0, None, length=n_steps)
    return final, {"drag": drag, "lift": lift}

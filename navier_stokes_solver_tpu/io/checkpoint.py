"""Checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY.md section 5); state is lost on
failure and the only artifacts are VTU snapshots.  Here the full on-device
state -- (u, p), u_old, time, step index, continuation bookkeeping -- is
saved as a compressed npz plus a JSON manifest and can be restored into a
fresh solver, enabling elastic restart of long unsteady runs.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from navier_stokes_solver_tpu.ops import Blocks

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_time_state",
    "load_time_state",
]

_FORMAT_VERSION = 1


def save_time_state(ts, path: str) -> str:
    """Save a fused-timeloop ``TimeState`` (performance path) to ``path``
    (directory), enabling elastic restart of long on-device runs.

    Works for single-device and domain-decomposed states alike: under dd
    every leaf is tile-stacked ``[n_tiles, ...]`` and ``np.asarray``
    gathers the sharded array to the host -- the npz then holds the
    stacked slabs (resume requires the same dd layout;
    :func:`load_time_state` validates shapes)."""
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "time_state.npz"),
        u=np.asarray(ts.solution.u),
        p=np.asarray(ts.solution.p),
        time=np.asarray(ts.time),
        step=np.asarray(ts.step),
        drag=np.asarray(ts.drag),
        lift=np.asarray(ts.lift),
    )
    return path


def load_time_state(disc, path: str, template=None):
    """Restore a ``TimeState`` saved by :func:`save_time_state`.

    ``template``: TimeState providing the target structure/shapes (the
    tile-stacked ``init_dist_state`` under dd); default =
    ``initial_state(disc)`` (single device)."""
    from navier_stokes_solver_tpu.timeloop import initial_state

    data = np.load(os.path.join(path, "time_state.npz"))
    dt = disc.dtype
    ts = template if template is not None else initial_state(disc)
    if tuple(data["u"].shape) != tuple(ts.solution.u.shape):
        raise ValueError(
            f"checkpoint at {path} has velocity shape "
            f"{tuple(data['u'].shape)} but this run expects "
            f"{tuple(ts.solution.u.shape)} -- mesh or dd layout mismatch "
            "(dd checkpoints store tile-stacked slabs and resume only "
            "under the same decomposition)"
        )
    return ts._replace(
        solution=Blocks(
            u=jnp.asarray(data["u"], dt), p=jnp.asarray(data["p"], dt)
        ),
        time=jnp.asarray(data["time"], dt),
        step=jnp.asarray(data["step"], jnp.int32),
        drag=jnp.asarray(data["drag"], dt),
        lift=jnp.asarray(data["lift"], dt),
    )


def save_checkpoint(solver, path: str) -> str:
    """Save solver state. ``path`` is a directory."""
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "state.npz"),
        u=np.asarray(solver.solution.u),
        p=np.asarray(solver.solution.p),
        u_old=np.asarray(solver.solution_old.u),
        p_old=np.asarray(solver.solution_old.p),
        delta_u=np.asarray(solver.delta.u),
        delta_p=np.asarray(solver.delta.p),
    )
    manifest = {
        "format_version": _FORMAT_VERSION,
        "variant": solver.VARIANT,
        "mesh_size": list(solver.options.mesh_size),
        "degrees": [solver.options.degree_velocity, solver.options.degree_pressure],
        "Re": solver.Re,
        "nu": solver.nu,
        "time": getattr(solver, "time", 0.0),
        "time_step_index": getattr(solver, "time_step_index", 0),
        "apply_first": getattr(solver, "apply_first", True),
        "inlet_u": getattr(getattr(solver, "inlet_velocity", None), "u", None),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def load_checkpoint(solver, path: str):
    """Restore state saved by ``save_checkpoint`` into a set-up solver."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {manifest['format_version']}")
    if manifest["mesh_size"] != list(solver.options.mesh_size):
        raise ValueError(
            f"checkpoint mesh {manifest['mesh_size']} != solver mesh "
            f"{list(solver.options.mesh_size)}"
        )
    data = np.load(os.path.join(path, "state.npz"))
    dt = solver.disc.dtype
    solver.solution = Blocks(
        u=jnp.asarray(data["u"], dt), p=jnp.asarray(data["p"], dt)
    )
    solver.solution_old = Blocks(
        u=jnp.asarray(data["u_old"], dt), p=jnp.asarray(data["p_old"], dt)
    )
    solver.delta = Blocks(
        u=jnp.asarray(data["delta_u"], dt), p=jnp.asarray(data["delta_p"], dt)
    )
    solver.nu = manifest["nu"]
    if hasattr(solver, "time"):
        solver.time = manifest["time"]
        solver.time_step_index = manifest["time_step_index"]
    if hasattr(solver, "apply_first"):
        solver.apply_first = manifest["apply_first"]
    if manifest.get("inlet_u") is not None and hasattr(solver, "inlet_velocity"):
        solver.inlet_velocity.u = manifest["inlet_u"]
    return manifest

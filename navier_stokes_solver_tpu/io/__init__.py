"""Host-side I/O: VTU/PVTU output, gmsh .msh export, checkpointing."""

from navier_stokes_solver_tpu.io.vtu import (
    write_vtu,
    write_vtu_record,
    write_vtu_tri,
    write_vtu_tri_record,
)
from navier_stokes_solver_tpu.io.msh import read_msh, write_msh
from navier_stokes_solver_tpu.io.checkpoint import (
    load_checkpoint,
    load_time_state,
    save_checkpoint,
    save_time_state,
)

__all__ = [
    "write_vtu",
    "write_vtu_record",
    "write_vtu_tri",
    "write_vtu_tri_record",
    "write_msh",
    "read_msh",
    "save_checkpoint",
    "load_checkpoint",
    "save_time_state",
    "load_time_state",
]

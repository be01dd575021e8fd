"""Host-side I/O: VTU/PVTU output, gmsh .msh export, checkpointing."""

from navier_stokes_solver_tpu.io.vtu import write_vtu, write_vtu_record, write_vtu_tri
from navier_stokes_solver_tpu.io.msh import read_msh, write_msh
from navier_stokes_solver_tpu.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "write_vtu",
    "write_vtu_record",
    "write_vtu_tri",
    "write_msh",
    "read_msh",
    "save_checkpoint",
    "load_checkpoint",
]

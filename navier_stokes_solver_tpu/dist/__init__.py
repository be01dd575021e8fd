"""Domain decomposition over the TPU device mesh.

The reference's only parallelism is MPI domain decomposition of mesh cells
with ghost exchange (SURVEY.md section 2c).  The TPU-native equivalent
(``dist.halo``): the channel splits into x-tiles of cell columns, one per
device; each tile stores its node slab with seam columns duplicated (ghost
DoFs), and the whole solver runs inside ``shard_map`` with explicit
``lax.ppermute`` seam exchanges (Trilinos ``compress()`` analog) and
``psum`` reductions (MPI allreduce analog) riding ICI.  An ``ens`` mesh
axis provides ensemble (Reynolds-sweep) parallelism via ``vmap`` + sharding
(BASELINE.json config 5).
"""

from navier_stokes_solver_tpu.dist.halo import (
    decompose_disc,
    device_put_dist,
    gather_blocks,
    init_dist_state,
    make_dd_mesh,
    make_dist_time_step,
    scatter_blocks,
)
from navier_stokes_solver_tpu.dist.mesh import make_mesh
from navier_stokes_solver_tpu.dist.simplex import (
    DecomposedSimplex,
    decompose_simplex_disc,
    gather_simplex_blocks,
    scatter_simplex_blocks,
)

__all__ = [
    "make_mesh",
    "make_dd_mesh",
    "decompose_disc",
    "scatter_blocks",
    "gather_blocks",
    "init_dist_state",
    "make_dist_time_step",
    "device_put_dist",
    "DecomposedSimplex",
    "decompose_simplex_disc",
    "gather_simplex_blocks",
    "scatter_simplex_blocks",
]

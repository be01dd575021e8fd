"""Domain decomposition over the TPU device mesh.

The reference's only parallelism is MPI domain decomposition of mesh cells
with ghost exchange (SURVEY.md section 2c).  The TPU-native equivalent:
fields are dense lattices sharded along the channel (x) axis of a
``jax.sharding.Mesh``; XLA's SPMD partitioner turns the stride-slice
gathers / dilated-pad scatters of the matrix-free kernels into neighbor halo
exchanges over ICI, and the inner-product reductions into ``psum``
collectives -- playing the role of Trilinos ``compress()`` ghost exchange and
MPI allreduces.  An ``ens`` mesh axis provides ensemble (Reynolds-sweep)
parallelism via ``vmap`` + sharding (BASELINE.json config 5).
"""

from navier_stokes_solver_tpu.dist.mesh import (
    make_mesh,
    shard_blocks,
    shard_disc,
)

__all__ = ["make_mesh", "shard_disc", "shard_blocks"]

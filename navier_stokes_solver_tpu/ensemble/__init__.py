"""Ensemble (Reynolds-sweep) batching over the device mesh.

The reference runs parameter sweeps as separate SLURM jobs
(run_sim_steady.sh); the TPU-native equivalent batches B simultaneous
simulations with ``vmap`` over the fused time step and shards the batch over
the ``ens`` mesh axis (BASELINE.json config 5).
"""

from navier_stokes_solver_tpu.ensemble.sweep import make_ensemble_step, run_sweep

__all__ = ["make_ensemble_step", "run_sweep"]

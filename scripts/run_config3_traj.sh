#!/bin/bash
# Elastic driver for the BASELINE config-3 31-step lift/drag trajectory
# (reference artifact: lab_new/lift_drag_data/{drag,lift}_coefficient_0.20.txt,
# produced by run_sim_unsteady.sh-style runs).
#
# Splits the trajectory across short-lived processes (--segment-steps) so
# each TPU client session stays inside the remote worker's safe zone --
# per-dispatch walls degrade monotonically with session age (docs/PERF.md
# round-4) -- and survives worker faults by waiting, probing with a tiny
# matmul, and resuming from the checkpoint.
#
# Usage: scripts/run_config3_traj.sh <outdir> [segment_steps] [krylov_maxiter] [newton_max] [extra flags...]
#
# The cap product (newton_max x krylov_maxiter) bounds ONE step's device
# time: on the post-divergence tail of this trajectory (the discrete state
# blows up around step 20, mirroring the reference's own artifact which
# diverges at step 2) the default 3x400 dispatch exceeds the worker's
# per-execution budget and is killed every attempt -- drop to e.g. 2x150
# to finish the tail.
set -u
OUTDIR="${1:-lift_drag_r4}"
SEG="${2:-6}"
KMAX="${3:-400}"
NMAX="${4:-3}"
shift $(( $# > 4 ? 4 : $# ))
EXTRA=("$@")
CKPT="$OUTDIR/ckpt"
cd "$(dirname "$0")/.."
mkdir -p "$OUTDIR"

probe() {
  # a wedged worker can hang even a tiny matmul's fetch -- bound it
  timeout 240 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe:", float((x @ x).sum()))
EOF
}

for attempt in $(seq 1 24); do
  echo "=== segment attempt $attempt ($(date -u +%H:%M:%S)) ==="
  NSTPU_CONFIG3_VERBOSE=1 timeout 3000 python scripts/config3_liftdrag.py \
    --mesh 60,40 --re 1.0 -T 0.31,0.01 --tol 1e-9 \
    --krylov-maxiter "$KMAX" --newton-max "$NMAX" \
    --outdir "$OUTDIR" --ckpt "$CKPT" --segment-steps "$SEG" "${EXTRA[@]}"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== trajectory complete ==="
    exit 0
  elif [ $rc -eq 3 ]; then
    echo "--- segment done (checkpointed); relaunching ---"
    # give the remote worker time to retire the previous client session:
    # a new client attaching within seconds of the old one exiting has
    # been observed to wedge its first dispatch indefinitely
    sleep 60
  else
    echo "--- rc=$rc (worker fault?); waiting + probing ---"
    for wait_try in $(seq 1 6); do
      sleep 300
      if probe; then
        echo "--- worker healthy; resuming ---"
        break
      fi
      echo "--- probe failed ($wait_try) ---"
    done
  fi
done
echo "=== gave up after 24 attempts ==="
exit 1

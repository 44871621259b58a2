#!/bin/bash
# Multi-process (multi-host) launch — the analog of the reference's
# mpirun + wrapper.sh surface (src-mpi/parallel.c:66-118, run.sh).
#
# On a real multi-host TPU slice (e.g. v5p-16 = 2 hosts), run ONE process
# per host with the same flags; jax.distributed wires the mesh:
#
#   host0$ COMD_COORDINATOR=host0:9955 COMD_NUM_PROCS=2 COMD_PROC_ID=0 \
#          python -m comd_tpu.cli -e -x 64 -y 64 -z 64 -i 2 -j 2 -k 2
#   host1$ COMD_COORDINATOR=host0:9955 COMD_NUM_PROCS=2 COMD_PROC_ID=1 \
#          python -m comd_tpu.cli -e -x 64 -y 64 -z 64 -i 2 -j 2 -k 2
#
# Each process generates and bins ONLY the shards its devices own
# (per-rank lattice windows; host memory stays O(local atoms)); process 0
# prints, checkpoints are collective.
#
# This script demonstrates the full flow locally: 2 CPU processes x 4
# virtual devices = an 8-device 2x2x2 mesh on one machine.
set -e
cd "$(dirname "$0")/.."

PORT="${PORT:-9955}"
ARGS=(-e -x 12 -y 12 -z 12 -N 20 -n 10 --dtype float64
      -i 2 -j 2 -k 2 --numProcs 2 --coordinator "localhost:${PORT}" "$@")

export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="--xla_force_host_platform_device_count=4"

python -m comd_tpu.cli "${ARGS[@]}" --procId 1 &
W1=$!
python -m comd_tpu.cli "${ARGS[@]}" --procId 0
wait "$W1"

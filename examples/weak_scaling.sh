#!/bin/bash
# Weak scaling: 32k atoms (20^3 unit cells) per device, EAM, like the
# reference examples/mpi-weakScaling.sh.  Mesh shapes are chosen so the
# per-shard problem is constant; run on a TPU slice (or CPU with
# XLA_FLAGS=--xla_force_host_platform_device_count=8 for a dry run).
set -e
cd "$(dirname "$0")/.."

STEPS="${STEPS:-100}"
PER="${PER:-20}"   # unit cells per shard per axis

run() { # px py pz [extra cli args...]
  local px=$1 py=$2 pz=$3
  shift 3
  echo "=== weak scaling: mesh ${px}x${py}x${pz} ($((px*py*pz)) devices) ==="
  python -m comd_tpu.cli -e \
    -x $((PER*px)) -y $((PER*py)) -z $((PER*pz)) \
    -i "$px" -j "$py" -k "$pz" -N "$STEPS" -n 10 "$@"
}

run 1 1 1 "$@"
run 2 1 1 "$@"
run 2 2 1 "$@"
run 2 2 2 "$@"

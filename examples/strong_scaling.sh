#!/bin/bash
# Strong scaling: fixed 256k atoms (40^3 unit cells) total, EAM, like the
# reference examples/mpi-strongScaling.sh.
set -e
cd "$(dirname "$0")/.."

STEPS="${STEPS:-100}"
N="${N:-40}"

run() { # px py pz [extra cli args...]
  local px=$1 py=$2 pz=$3
  shift 3
  echo "=== strong scaling: mesh ${px}x${py}x${pz} ($((px*py*pz)) devices) ==="
  python -m comd_tpu.cli -e -x "$N" -y "$N" -z "$N" \
    -i "$px" -j "$py" -k "$pz" -N "$STEPS" -n 10 "$@"
}

run 1 1 1 "$@"
run 2 1 1 "$@"
run 2 2 1 "$@"
run 2 2 2 "$@"

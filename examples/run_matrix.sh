#!/bin/bash
# Method/size run matrix, the analog of the reference's run.sh transport
# sweep.  The reference swept {MPI, libmp-sync, libmp-async, gpu-comm}
# transports x {2,4,8,16} ranks on 80^3 EAM; on TPU there is one transport
# (XLA collectives over ICI), so the matrix sweeps kernel methods and mesh
# shapes instead.
set -e
cd "$(dirname "$0")/.."

SIZES="${SIZES:-20 40}"
METHODS="${METHODS:-thread_atom thread_atom_nl}"
STEPS="${STEPS:-100}"

for n in $SIZES; do
  for m in $METHODS; do
    echo "=== EAM ${n}^3 cells, method $m ==="
    python -m comd_tpu.cli -e -x "$n" -y "$n" -z "$n" -N "$STEPS" -n 10 -m "$m" "$@"
  done
done

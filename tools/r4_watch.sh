#!/bin/bash
# Wait (up to ~11h) for the TPU relay to recover, then fire the round-4
# perf campaign once.  Probes are cheap and killable; one at a time.
cd "$(dirname "$0")/.."
for i in $(seq 1 140); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); assert float((x@x)[0,0]) == 128.0
print('TPU healthy')" 2>/dev/null | grep -q healthy; then
    echo "[watch] TPU healthy at $(date +%H:%M:%S), starting campaign"
    bash tools/r4_perf_batch.sh
    exit 0
  fi
  echo "[watch] probe $i failed $(date +%H:%M:%S)"
  sleep 180
done
echo "[watch] TPU never recovered"
exit 1

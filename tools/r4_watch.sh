#!/bin/bash
# Wait (up to ~13h) for the TPU relay to recover, then fire the round-4
# perf campaign once.  All device contact goes through tpu_gate.sh, which
# holds the single-TPU-process lock for probes and runs alike.
cd "$(dirname "$0")/.."
for i in $(seq 1 240); do
  # short gate cycles (2 probes ~3 min) so the lock is free most of the
  # time for any driver-invoked bench.py that races this watcher
  if GATE_ATTEMPTS=2 tools/tpu_gate.sh true; then
    echo "[watch] TPU healthy at $(date +%H:%M:%S), starting campaign"
    bash tools/r4_perf_batch.sh
    exit 0
  fi
  echo "[watch] gate cycle $i gave up $(date +%H:%M:%S)"
  sleep 90
done
echo "[watch] TPU never recovered"
exit 1

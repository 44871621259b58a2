#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
run python tools/r3_probe_a16b.py 16
run python tools/r3_probe_a16b.py 32
# chunk variants at the real k=3 config (per-chunk overhead hypothesis)
run env BENCH_CHUNK=512 python tools/tpu_bench.py 63 eam 3 8
run env BENCH_CHUNK=1024 python tools/tpu_bench.py 63 eam 3 8

#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# dense (static shifted-slice) sweep at the k=3/A=16 headline config
run env BENCH_SWEEP=dense BENCH_CHUNK=1024 python tools/tpu_bench.py 63 eam 2 6
run env BENCH_SWEEP=dense BENCH_CHUNK=512  python tools/tpu_bench.py 63 eam 2 6
run env BENCH_SWEEP=dense BENCH_CHUNK=1024 python tools/tpu_bench.py 63 lj 2 6
run env BENCH_SWEEP=dense BENCH_CHUNK=1024 python tools/tpu_bench.py 80 eam 2 6

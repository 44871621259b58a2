#!/bin/bash
# Round-3 TPU batch 4: bisect the f64 worker crash.
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 1200 "$@"
  echo "=== rc=$? ==="
  sleep 20
}

# LJ f64: no tables at all -> tests the f64 sweep/scan core
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 16 lj 2 6
# EAM f64 at tiny size, one interp impl at a time
run env BENCH_DTYPE=float64 BENCH_INTERP=cheb python tools/tpu_bench.py 12 eam 2 6
run env BENCH_DTYPE=float64 BENCH_INTERP=twolevel python tools/tpu_bench.py 12 eam 2 6
run env BENCH_DTYPE=float64 BENCH_INTERP=rows python tools/tpu_bench.py 12 eam 2 6

#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# f64 twolevel with the split-plane f32 fetch: retest tiny, then at size
run env BENCH_DTYPE=float64 BENCH_INTERP=twolevel python tools/tpu_bench.py 12 eam 2 6
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 32 eam 2 6
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 64 eam 2 6
# f64 cheb at 32^3 for the speed/accuracy table
run env BENCH_DTYPE=float64 BENCH_INTERP=cheb python tools/tpu_bench.py 32 eam 2 6
# A=16 shape probe
run python tools/r3_probe_a16.py

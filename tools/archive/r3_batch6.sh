#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# transposed stencil sweep vs gather at k=3 (A=16, the exposed-gather case)
run env BENCH_SWEEP=dense_t python tools/tpu_bench.py 63 eam 3 10
# and at k=4 (A=32) -- expect parity or small change
run env BENCH_SWEEP=dense_t python tools/tpu_bench.py 64 eam 3 10
# LJ dense_t at k=4
run env BENCH_SWEEP=dense_t python tools/tpu_bench.py 64 lj 3 10
# f64 with the coarser lookup batching (32^3; then retry 64^3)
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 32 eam 2 6
run env BENCH_DTYPE=float64 BENCH_INTERP=cheb python tools/tpu_bench.py 64 eam 2 6

#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# f64 twolevel (split fetch, batch 16384): the fast-exact datum
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 32 eam 2 6
run env BENCH_DTYPE=float64 BENCH_BLOCK=5 python tools/tpu_bench.py 63 eam 1 3
# -s phase profile at the k=3 geometry (localize the A=16 overhead)
run python -m comd_tpu.cli -e -x 63 -y 63 -z 63 -s
# final headline confirmation
run python bench.py
# exact-interpolant f32 datum next to the cheb headline (verdict weak #6)
run env BENCH_INTERP=twolevel python tools/tpu_bench.py 64 eam 2 6

#!/bin/bash
# Round-3 TPU batch 2: bench.py end-to-end, f64 retry, 80^3 (2.048M, k=4),
# chunk tuning at the exact-pack config, Hilbert on/off.
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
}

run python bench.py
# f64 EAM twolevel (retry after relay crash; smaller blocks)
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 64 eam 2 6
# the reference's own 80^3 headline size: 2.048M atoms, k=4 exact pack
run python tools/tpu_bench.py 80 eam 2 6
# chunk sweep at the new exact-pack geometry (B=32768 cells)
run env BENCH_CHUNK=128 python tools/tpu_bench.py 64 eam 3 8
run env BENCH_CHUNK=512 python tools/tpu_bench.py 64 eam 3 8
# LJ clean re-measure (first batch had one corrupted sample)
run python tools/tpu_bench.py 64 lj 3 10

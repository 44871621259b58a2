#!/bin/bash
# Round-3 TPU measurement batch 1: commensurate-cell step rates.
# Run: ./tools/tpu_gate.sh bash tools/r3_batch1.sh 2>&1 | tee /tmp/r3_batch1.log
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
}

# headline: 1M-atom EAM, commensurate k=3 (A=16) vs k=4 (A=32) vs classic
run python tools/tpu_bench.py 63 eam 3 10
run python tools/tpu_bench.py 64 eam 3 10
run env BENCH_CELLMODE=classic python tools/tpu_bench.py 63 eam 3 10
# LJ 1M commensurate
run python tools/tpu_bench.py 64 lj 3 10
# f64 EAM with the new twolevel default
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 63 eam 2 6
# 2M-atom EAM (the reference's 80^3-class headline): 81^3 = 2.13M, k=3
run python tools/tpu_bench.py 81 eam 2 6

#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# Does the dense (static-slice) sweep also beat gather at A=32 with the
# non-spilling chunk?  Synthetic probe said 43.5 vs 36.9 G slot-pairs/s
# (r3_probe_a16c, C=256) -- never measured in a real step.
run env BENCH_SWEEP=dense BENCH_CHUNK=256 python tools/tpu_bench.py 64 eam 2 6
run env BENCH_SWEEP=dense BENCH_CHUNK=256 python tools/tpu_bench.py 64 lj 2 6
run env BENCH_SWEEP=dense BENCH_CHUNK=128 python tools/tpu_bench.py 64 lj 2 6
# A=16 headline: is chunk=1024 the optimum, or does 2048 amortize further?
run env BENCH_SWEEP=dense BENCH_CHUNK=2048 python tools/tpu_bench.py 63 eam 2 6

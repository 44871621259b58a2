#!/bin/bash
# Round-3 TPU batch 3: ki transport validation (real barriers), f64 probe,
# Hilbert A/B, 1000-step scale validation, -s phase profile.
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
}

# kernel-initiated transports on hardware (self-ring, use_barrier=True)
run python tools/tpu_ki_test.py

# f64: bisect the 1M crash (32^3 first, then 64^3 at smaller chunks)
run env BENCH_DTYPE=float64 python tools/tpu_bench.py 32 eam 3 10
run env BENCH_DTYPE=float64 BENCH_CHUNK=128 python tools/tpu_bench.py 64 eam 2 6
run env BENCH_DTYPE=float64 BENCH_CHUNK=64 python tools/tpu_bench.py 64 eam 2 6

# Hilbert cell order A/B (VERDICT: measure, likely null for the dense maps)
run python tools/tpu_bench.py 32 eam 3 10
run env BENCH_HILBERT=1 python tools/tpu_bench.py 32 eam 3 10

# 1000-step 1M-atom validation run (conservation + atoms-lost at scale)
run python -m comd_tpu.cli -e -x 64 -y 64 -z 64 -N 1000 -n 100

# -s phase profile at the new exact-pack config
run python -m comd_tpu.cli -e -x 32 -y 32 -z 32 -s

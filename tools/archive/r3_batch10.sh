#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# chunk-overhead hypothesis: same total work, fewer/larger chunks
run env PROBE_C=512 PROBE_VARIANTS=res_var5,gat_only,gat_var5,slice5,gat_m2 \
    python tools/r3_probe_a16c.py 16
run env PROBE_C=1024 PROBE_VARIANTS=res_var5,gat_var5,slice5 \
    python tools/r3_probe_a16c.py 16
run env PROBE_C=512 PROBE_VARIANTS=res_var5,gat_var5,slice5 \
    python tools/r3_probe_a16c.py 32
# real step at the k=3 config with larger chunks
run env BENCH_CHUNK=512 python tools/tpu_bench.py 63 eam 2 6
run env BENCH_CHUNK=1024 python tools/tpu_bench.py 63 eam 2 6
run env BENCH_SWEEP=dense_t BENCH_CHUNK=512 python tools/tpu_bench.py 63 eam 2 6

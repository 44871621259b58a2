#!/bin/bash
set -u
cd /root/repo
run() {
  echo "=== $* [$(date +%H:%M:%S)] ==="
  timeout 2400 "$@"
  echo "=== rc=$? ==="
  sleep 15
}
# driver-identical headline (new auto: 63^3 k=3 A=16 dense chunk=1024)
run python bench.py
# ~2M-atom headline at the k=3 sizing (81^3 = 2.125M; reference's is 80^3)
run python tools/tpu_bench.py 81 eam 2 6
# 1000-step conservation + atoms-lost at the NEW headline config
run python -m comd_tpu.cli -e -x 63 -y 63 -z 63 -N 1000 -n 100

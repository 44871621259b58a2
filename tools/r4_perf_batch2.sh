#!/bin/bash
# Reprioritized remainder of the round-4 campaign after eam63_half_w_c1024
# measured a 3x NULL (96 ms vs 30.4 full-shell): the half chunk scan cannot
# flip a 3x deficit, so the decisive remaining runs are the full-shell
# lane-pack (dense_wg, headline upside), the half materialize-barrier
# diagnostic (attribution), and the lane-flat variants.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r4_logs
GATE=tools/tpu_gate.sh
run() {
  local name=$1; shift
  if [ -s "tools/r4_logs/$name.log" ] && grep -q BEST "tools/r4_logs/$name.log"; then
    echo "== $name: already done"; return
  fi
  echo "== $name: $* $(date +%H:%M:%S)"
  timeout 1500 env "$@" $GATE python tools/tpu_bench.py \
    ${NX:-63} ${POT:-eam} 2 7 > "tools/r4_logs/$name.log" 2>&1
  tail -3 "tools/r4_logs/$name.log"
  sleep 5
}
run eam63_wg_c1024        BENCH_SWEEP=dense_wg
run eam63_half_wm_c1024   BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1
run eam63_wf_c1024        BENCH_SWEEP=dense_wf
run eam63_wg_c512         BENCH_SWEEP=dense_wg BENCH_CHUNK=512
run eam63_f_c1024         BENCH_SWEEP=dense_f
NX=64 POT=lj run lj64_half_w_c512  BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_CHUNK=512
echo "== batch2 done $(date +%H:%M:%S)"

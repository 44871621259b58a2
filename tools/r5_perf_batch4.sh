#!/bin/bash
# Round-5 batch 4: close the last unmeasured sweep-policy branch.
# The auto policy (config.resolved_sweep_impl) keeps the GATHER sweep for
# cell capacities above 32 because the 5-sigma LJ cells (the fork's
# gpu_lj_cta_cell.h config, A~176 at k=7 commensurate) were never measured
# (CLAUDE.md perf notes; docs/BENCHMARKS.md:572).  This batch measures the
# gather-vs-window question at A=176 directly: 28^3 LJ (87,808 atoms,
# 8^3 grid of 12.65 A cells) with --ljCutoffFactor 5.
#   - auto  -> gather C=256 (the policy's current answer)
#   - dense_w C=256 (the auto chunk for A>=32) and C=64 (the pair tensor
#     scales with C*A^2, 30x the A=32 footprint at equal C, so a small-C
#     point guards against an unfair spill-only comparison)
# Decision rule (pre-registered): dense_w must beat gather by >5% at
# EITHER chunk to flip the policy; a spill/compile failure at both chunks
# confirms gather as the structural answer for big-A cells.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r5_logs
GATE=tools/tpu_gate.sh

preserve() {
  local f=$1
  [ -e "$f" ] || return 0
  local i=1
  while [ -e "$f.$i" ]; do i=$((i+1)); done
  mv "$f" "$f.$i"
}

run_one() {
  local name=$1; shift
  if [ -s "tools/r5_logs/$name.log" ] && \
     grep -q "^\[.*BEST" "tools/r5_logs/$name.log"; then
    echo "== $name: already done"
    return 0
  fi
  preserve "tools/r5_logs/$name.log"
  echo "== $name $(date +%H:%M:%S)"
  timeout 1500 env "$@" $GATE python tools/tpu_bench.py 28 lj 3 10 \
    > "tools/r5_logs/$name.log" 2>&1
  tail -2 "tools/r5_logs/$name.log"
}

run_one lj28_5sig_auto       BENCH_LJCUT=5
run_one lj28_5sig_w_c256     BENCH_LJCUT=5 BENCH_SWEEP=dense_w BENCH_CHUNK=256
run_one lj28_5sig_w_c64      BENCH_LJCUT=5 BENCH_SWEEP=dense_w BENCH_CHUNK=64
echo "== batch4 done $(date +%H:%M:%S)"

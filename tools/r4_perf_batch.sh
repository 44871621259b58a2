#!/bin/bash
# Round-4 perf campaign (VERDICT r3 item 2): half-shell on the window
# fetch, lane-packed dense_wg, and the queued lane-flat variants, all at
# the EAM 63^3 headline config (auto = k=3/A=16/C=1024).  One TPU process
# at a time behind the gate; each run logs to tools/r4_logs/.
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
  tail -4 "tools/r4_logs/$name.log"
  sleep 10
}

# 1. baseline re-confirm (auto dense_w C=1024)
run eam63_auto            BENCH_DUMMY=1
# 2. half-shell, window fetch, chunk scan
run eam63_half_w_c1024    BENCH_HALF=1 BENCH_HALF_FETCH=window
run eam63_half_w_c512     BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_CHUNK=512
run eam63_half_w_c256     BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_CHUNK=256
# 3. + materialize barrier (the round-2 null's suspected cause)
run eam63_half_wm_c512    BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1 BENCH_CHUNK=512
run eam63_half_wm_c1024   BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1
# 4. half-shell old slices fetch for the delta attribution
run eam63_half_s_c512     BENCH_HALF=1 BENCH_CHUNK=512
# 5. lane-packed window groups
run eam63_wg_c1024        BENCH_SWEEP=dense_wg
run eam63_wg_c512         BENCH_SWEEP=dense_wg BENCH_CHUNK=512
# 6. queued lane-flat variants (r3e, never measured on TPU)
run eam63_wf_c1024        BENCH_SWEEP=dense_wf
run eam63_f_c1024         BENCH_SWEEP=dense_f
# 7. LJ half-shell: full-shell LJ already runs 7.88e7 at 64^3; pair-once
#    could cross the 1e8 north star on the LJ headline.
NX=64 POT=lj run lj64_auto          BENCH_DUMMY=1
NX=64 POT=lj run lj64_half_w_c1024  BENCH_HALF=1 BENCH_HALF_FETCH=window
NX=64 POT=lj run lj64_half_w_c512   BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_CHUNK=512
NX=64 POT=lj run lj64_half_wm_c512  BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1 BENCH_CHUNK=512
# 8. -a 1 overlap deltas (scheduling effect on one chip): cell path and the
#    new NL overlap path (VERDICT r3 item 3's measured-delta ask).
for ov in "overlap32_cell thread_atom" "overlap32_nl thread_atom_nl"; do
  set -- $ov
  if [ -s "tools/r4_logs/$1.log" ] && grep -q "\-a 1:" "tools/r4_logs/$1.log"; then
    echo "== $1: already done"
  else
    echo "== $1 $(date +%H:%M:%S)"
    timeout 1800 $GATE python tools/overlap_bench.py 32 eam "$2" \
      > "tools/r4_logs/$1.log" 2>&1
    tail -3 "tools/r4_logs/$1.log"
    sleep 10
  fi
done
# 9. one full CLI run on the real chip for the transcript archive
#    (docs/transcripts/): 40^3 unit cells = 256k atoms, 100 steps, the
#    reference's validation bar (energy table, eFinal/eInitial, timers).
if [ -s docs/transcripts/tpu_eam_40_100steps.txt ] && \
   grep -q "no atoms lost" docs/transcripts/tpu_eam_40_100steps.txt; then
  echo "== tpu transcript: already done"
else
  echo "== tpu transcript $(date +%H:%M:%S)"
  timeout 1500 $GATE python -m comd_tpu.cli -e -x 40 -y 40 -z 40 -N 100 -n 10 \
    > docs/transcripts/tpu_eam_40_100steps.txt 2>&1
  tail -3 docs/transcripts/tpu_eam_40_100steps.txt
fi
echo "== batch done $(date +%H:%M:%S)"

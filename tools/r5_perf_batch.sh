#!/bin/bash
# Round-5 perf campaign: the pre-registered runs round 4's TPU outage left
# unexecuted (VERDICT r4 item 2), LJ FIRST — full-shell LJ is 7.88e7
# atom-steps/s and pair-once is the one measured-family lever with a shot
# at the 1e8 north star.  Then the EAM slices-fetch attribution, the -a 1
# overlap deltas (item 8), and the real-chip CLI transcript (item 9).
# One TPU process at a time behind the gate; logs to tools/r5_logs/.
# Retries preserve the previous attempt's log as $name.log.N (ADVICE r4).
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

run() {
  local name=$1; shift
  if [ -s "tools/r5_logs/$name.log" ] && grep -q BEST "tools/r5_logs/$name.log"; then
    echo "== $name: already done"; return
  fi
  preserve "tools/r5_logs/$name.log"
  echo "== $name: $* $(date +%H:%M:%S)"
  timeout 1500 env "$@" $GATE python tools/tpu_bench.py \
    ${NX:-63} ${POT:-eam} 2 7 > "tools/r5_logs/$name.log" 2>&1
  tail -4 "tools/r5_logs/$name.log"
  sleep 10
}

# 1. LJ baseline re-confirm (auto = gather A=32 C=256 at 64^3)
NX=64 POT=lj run lj64_auto          BENCH_DUMMY=1
# 2. LJ half-shell on the window fetch; EAM's wm datum (62 vs 96 ms) says
#    the materialize barrier matters, so run both with and without.
NX=64 POT=lj run lj64_half_wm_c512  BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1 BENCH_CHUNK=512
NX=64 POT=lj run lj64_half_wm_c1024 BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_HALF_MAT=1
NX=64 POT=lj run lj64_half_w_c1024  BENCH_HALF=1 BENCH_HALF_FETCH=window
NX=64 POT=lj run lj64_half_w_c512   BENCH_HALF=1 BENCH_HALF_FETCH=window BENCH_CHUNK=512
# 3. EAM headline re-confirm (fresh datum for the driver bench)
run eam63_auto            BENCH_DUMMY=1
# 4. EAM half slices fetch (window-vs-slices attribution, design item 4)
run eam63_half_s_c512     BENCH_HALF=1 BENCH_CHUNK=512
# 5. -a 1 overlap deltas (scheduling effect on one chip): cell path and the
#    NL overlap path (VERDICT r4 item 4's measured-delta ask).
for ov in "overlap32_cell thread_atom" "overlap32_nl thread_atom_nl"; do
  set -- $ov
  if [ -s "tools/r5_logs/$1.log" ] && grep -q "\-a 1:" "tools/r5_logs/$1.log"; then
    echo "== $1: already done"
  else
    preserve "tools/r5_logs/$1.log"
    echo "== $1 $(date +%H:%M:%S)"
    timeout 1800 $GATE python tools/overlap_bench.py 32 eam "$2" \
      > "tools/r5_logs/$1.log" 2>&1
    tail -3 "tools/r5_logs/$1.log"
    sleep 10
  fi
done
# 6. one full CLI run on the real chip for the transcript archive
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

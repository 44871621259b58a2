#!/bin/bash
# Round-5 follow-up batch: the chunk-prologue attribution (VERDICT r4
# item 7).  The round-3c model says per-chunk fixed overhead (27 j-window
# fetches + reduce prologue) is ~15% of the headline step at C=1024.  Fit
# t(C) = a*n_chunks + b over C in {512, 1024(existing), 1536} at the EAM
# 63^3 headline; if C=1536 wins >=5%, retune the auto chunk policy.
# (C=2048 measured as a spill-null in round 3 — not retried; 1536 is new.)
# Then the compiler-side attribution (step_attr) runs behind the gate.
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

# A=14 capacity probe: commensurate k=3 occupancy is 13-14 and TIME-STABLE
# (faces sit 0.25*lat from site planes), but auto capacity rounds up to 8
# -> A=16.  A=14 shrinks the pair tensor's lane dim 27A from 432 (pads to
# 512) to 378 (pads to 384): 25% fewer VREG ops by the same slot-cost
# model the planner uses.  CPU f64 trajectories at A=14 are bitwise equal
# to A=16.  Never measured before round 5.
run eam63_a14         BENCH_MAXATOMS=14
run eam63_a14_c1536   BENCH_MAXATOMS=14 BENCH_CHUNK=1536
run eam63_auto_c512   BENCH_CHUNK=512
run eam63_auto_c1536  BENCH_CHUNK=1536

# Pre-registered rule: A=14 adopted only if >10% faster than auto
# (30.44 ms -> needs <27.4) AND a 63^3 1000-step 600K run conserves with
# zero overflow.  Fire the conservation run only when the speed half won.
a14=$(grep -oP 'BEST\s+\K[\d.]+' tools/r5_logs/eam63_a14.log 2>/dev/null | head -1)
a14c=$(grep -oP 'BEST\s+\K[\d.]+' tools/r5_logs/eam63_a14_c1536.log 2>/dev/null | head -1)
best_a14=$(python3 - "$a14" "$a14c" <<'PY'
import sys
vals = [float(v) for v in sys.argv[1:] if v]
print(min(vals) if vals else "")
PY
)
if [ -n "$best_a14" ] && python3 -c "import sys; sys.exit(0 if float('$best_a14') < 27.4 else 1)"; then
  if [ -s docs/transcripts/tpu_eam_63_a14_1000steps.txt ] && \
     grep -q "no atoms lost" docs/transcripts/tpu_eam_63_a14_1000steps.txt; then
    echo "== a14 conservation: already done"
  else
    echo "== a14 conservation run (1000 steps, best=$best_a14 ms) $(date +%H:%M:%S)"
    timeout 3000 $GATE python -m comd_tpu.cli -e -x 63 -y 63 -z 63 -N 1000 -n 100 \
      --maxAtoms 14 \
      > docs/transcripts/tpu_eam_63_a14_1000steps.txt 2>&1
    tail -4 docs/transcripts/tpu_eam_63_a14_1000steps.txt
  fi
else
  echo "== a14 conservation: skipped (best_a14='$best_a14', needs <27.4)"
fi

if [ -s tools/r5_logs/step_attr_eam63.log ] && \
   grep -q "hlo. full text" tools/r5_logs/step_attr_eam63.log; then
  echo "== step_attr: already done"
else
  preserve tools/r5_logs/step_attr_eam63.log
  echo "== step_attr $(date +%H:%M:%S)"
  timeout 1500 $GATE python tools/step_attr.py 63 eam 30.40 \
    > tools/r5_logs/step_attr_eam63.log 2>&1
  tail -8 tools/r5_logs/step_attr_eam63.log
fi
echo "== batch2 done $(date +%H:%M:%S)"

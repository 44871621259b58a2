#!/bin/bash
# Round-5 batch 3: verify the long-scan scoped-VMEM fix on real TPU.
# The sharded-NL compile at 32^3/A=32 died with a 19.09M scoped-VMEM
# overflow (tools/r5_logs/overlap32_nl.log.2).  First diagnosis blamed the
# NL build's top_k pair sort (chunk clamp, commit 8a31886) — the post-clamp
# retry failed identically.  TPU-platform export then attributed the
# failing reduce-window to jnp.nonzero's int64 full-length cumsum in
# build_atom_list_split; fixed by the chunked i32 scans in ops/scan.py.
# This run both (a) proves the sharded NL family compiles+runs on the
# chip, and (b) lands the campaign's missing NL-path -a overlap delta.
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

if [ -s tools/r5_logs/overlap32_nl.log ] && \
   grep -q "^-a 1:" tools/r5_logs/overlap32_nl.log; then
  echo "== overlap32_nl: already done"
else
  preserve tools/r5_logs/overlap32_nl.log
  echo "== overlap32_nl (post-VMEM-clamp) $(date +%H:%M:%S)"
  timeout 1800 $GATE python tools/overlap_bench.py 32 eam thread_atom_nl \
    > tools/r5_logs/overlap32_nl.log 2>&1
  tail -4 tools/r5_logs/overlap32_nl.log
fi
echo "== batch3 done $(date +%H:%M:%S)"

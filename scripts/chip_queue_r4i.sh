#!/bin/bash
# Round-4 queue i: land EVAL_REAL.json (the one VERDICT-3 artifact still
# missing — the b56 int8-KV cold run OOMed at the fixture's Sp=831
# prompt length; this rerun uses int4 prompt KV + the round-4 serving
# defaults, see STATUS.md "Open").
#
# Resumable: each job writes /tmp/chipq/r4i.<job>.done on success.
set -u
cd /root/repo
Q=/tmp/chipq
mkdir -p "$Q"
LOG="$Q/r4i.log"

run() {
  local name="$1"; shift
  if [ -f "$Q/r4i.$name.done" ]; then echo "SKIP $name (done)" >>"$LOG"; return 0; fi
  echo "START $name: $*" >>"$LOG"
  "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "END $name rc=$rc" >>"$LOG"
  [ $rc -eq 0 ] && touch "$Q/r4i.$name.done"
  return $rc
}

run eval_real env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 \
  python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128 \
  --kv-quant int4
if [ -f "$Q/r4i.eval_real.done" ]; then
  # the script prints the one-line JSON report last; capture it
  grep '"metric": "chair500_real_pipeline"' "$LOG" | tail -1 \
    > /root/repo/EVAL_REAL.json && echo "EVAL_REAL.json written" >>"$LOG"
fi

echo "R4I QUEUE COMPLETE" >>"$LOG"

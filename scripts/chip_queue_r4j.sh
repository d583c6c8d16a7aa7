#!/bin/bash
# Round-4 queue j (fresh container: /tmp fixture + XLA cache wiped).
# 1. eval_real — land EVAL_REAL.json, the one remaining VERDICT-3
#    artifact (int4 prompt KV; the int8-KV attempt OOMed at Sp=831).
# 2. spec bench — first on-chip measurement of the speculative greedy
#    decoder (ops/speculative.py, committed 121ea29 but never run on
#    the real chip).
#
# Resumable: each job writes /tmp/chipq/r4j.<job>.done on success.
set -u
cd /root/repo
Q=/tmp/chipq
mkdir -p "$Q"
LOG="$Q/r4j.log"

run() {
  local name="$1"; shift
  if [ -f "$Q/r4j.$name.done" ]; then echo "SKIP $name (done)" >>"$LOG"; return 0; fi
  echo "START $name: $* $(date -u +%H:%M:%S)" >>"$LOG"
  "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "END $name rc=$rc $(date -u +%H:%M:%S)" >>"$LOG"
  [ $rc -eq 0 ] && touch "$Q/r4j.$name.done"
  return $rc
}

run eval_real env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 \
  python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128 \
  --kv-quant int4
if [ -f "$Q/r4j.eval_real.done" ] && [ ! -f /root/repo/EVAL_REAL.json ]; then
  grep '"metric": "chair500_real_pipeline"' "$LOG" | tail -1 \
    > /root/repo/EVAL_REAL.json && echo "EVAL_REAL.json written" >>"$LOG"
fi

# Speculative decode at the headline serving config (kv4 b80 rows4
# W4A8) with K=4 prompt-lookup drafts; bench.py prints spec stats
# (accept rate, realized verify steps) in its JSON detail.
run spec_bench env HALVA_BENCH_SPEC=4 python bench.py
grep -h '"metric"' "$Q/r4j.log" | tail -1 > "$Q/spec_bench.json" 2>/dev/null

echo "R4J QUEUE COMPLETE $(date -u +%H:%M:%S)" >>"$LOG"

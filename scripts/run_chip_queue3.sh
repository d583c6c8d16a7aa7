#!/bin/bash
# Third chip queue: llava-v1.5-13b single-chip serving. int4 LLM
# kernels (~6.6 GB) + int8 embeds/vision fit beside an int8 KV cache on
# the 15.75 GB v5e — the reference needs an 80 GB A100 for fp16 13B
# eval. Explicit batches (each OOM retry costs a remote compile).
set -u
cd /root/repo
LOG=/tmp/chipq
mkdir -p "$LOG"

run() {
  name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name: $*" | tee -a "$LOG/queue.log"
  t0=$SECONDS
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc dt=$((SECONDS-t0))s" | tee -a "$LOG/queue.log"
}

run bench13b_b16 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=16 python bench.py
if grep -q '"value": 0' "$LOG/bench13b_b16.log" 2>/dev/null || ! grep -q imgs "$LOG/bench13b_b16.log"; then
  run bench13b_b8 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=8 python bench.py
else
  run bench13b_b24 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=24 python bench.py
fi

echo "=== [$(date +%H:%M:%S)] QUEUE3 COMPLETE" | tee -a "$LOG/queue.log"

#!/bin/bash
# Round-4 chip queue, part d — headline-perf investigation:
#   bench_7b_kv4   int4 prompt KV at 7B: halves the dominant decode
#                  traffic (9.1 GB/step at b56 int8) and frees ~4.5 GB
#                  HBM -> the batch ladder starts at 96. kv4 quality row
#                  in QUANT_QUALITY.json matches int4 weights (0.999).
#   prof_*         decode-step cost attribution at the b56 int4 config:
#                  measured 60.6 ms/iter vs ~20 ms of modeled HBM
#                  traffic — find the other 40 ms.
set -u
cd /root/repo
LOG=/tmp/chipq
mkdir -p "$LOG"

run() {
  name="$1"; shift
  if grep -q "DONE  $name rc=0" "$LOG/queue.log" 2>/dev/null; then
    echo "=== [$(date +%H:%M:%S)] SKIP  $name (already done)" | tee -a "$LOG/queue.log"
    return 0
  fi
  echo "=== [$(date +%H:%M:%S)] START $name: $*" | tee -a "$LOG/queue.log"
  t0=$SECONDS
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc dt=$((SECONDS-t0))s" | tee -a "$LOG/queue.log"
}

run bench_7b_kv4 env HALVA_BENCH_KV=int4 python bench.py
run prof_base python scripts/profile_decode.py --variant base --weights int4 --batch 56
run prof_noattn python scripts/profile_decode.py --variant noattn --weights int4 --batch 56
run prof_nohead python scripts/profile_decode.py --variant nohead --weights int4 --batch 56
run prof_sg8 python scripts/profile_decode.py --variant sg8 --weights int4 --batch 56
echo "=== [$(date +%H:%M:%S)] R4D QUEUE COMPLETE" | tee -a "$LOG/queue.log"

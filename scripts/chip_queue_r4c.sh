#!/bin/bash
# Round-4 chip queue, part c:
#   beam_b16k4     first real-chip beam decode (verdict 6)
#   train13b_int4  13B train-step anchor that FITS: int4 base + bf16
#                  LoRA + 8-bit Adam (int8-base attempt OOMs 20.31G vs
#                  15.75G — see /tmp/chipq/train13b.log)
#   bench_13b_kv4  13B serving with int4 prompt KV: b24 worked with
#                  int8 KV (3.74 imgs/s); int4 KV halves the dominant
#                  cache and may afford b32+
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

run beam_b16k4 python scripts/bench_beam.py --batch 16 --beams 4
run train13b_int4 python scripts/bench_train7b.py --preset llava-v1.5-13b --batch 1 --iters 2 --base int4 --optim adamw8bit
run bench_13b_kv4 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=32 python bench.py
echo "=== [$(date +%H:%M:%S)] R4C QUEUE COMPLETE" | tee -a "$LOG/queue.log"

#!/bin/bash
# Round-4 chip queue, part b: jobs unblocked after the r4 queue finished.
#   qq_report_r4b  regenerate QUANT_QUALITY.json now that kv4 landed
#   probe_window2  window block-skip probe rerun with on-chip bf16-MXU
#                  tolerances (r4 run failed at the CPU-fp32 threshold)
#   train13b       13B DPA train-step compute anchor (verdict 2b):
#                  int8 base + bf16 LoRA, B=1, remat, loss_chunk
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

run qq_report_r4b python scripts/quant_quality.py --report
cp /tmp/halva_quant_quality/report.json /root/repo/QUANT_QUALITY.json 2>/dev/null
run probe_window2 python scripts/probe_window_flash.py
run train13b python scripts/bench_train7b.py --preset llava-v1.5-13b --batch 1 --iters 2
echo "=== [$(date +%H:%M:%S)] R4B QUEUE COMPLETE" | tee -a "$LOG/queue.log"

#!/bin/bash
# Round-4 continuation, part 2 (run AFTER chip_queue_r4e.sh): the 7B
# int4-prompt-KV headline ladder — attention streams the prompt cache
# every decode step, so nibble-packed KV halves the dominant HBM term
# AND frees ~4.5 GB at b56 for a larger batch — plus the int4g
# (grouped-K, top-1 1.0 in QUANT_QUALITY.json) serving point, and a
# plain-default bench that records exactly what the driver would.
# Resumable; one process per job (HBM is never freed in-process).
set -u
LOG=/tmp/chipq/r4f.log
mkdir -p /tmp/chipq
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local mark=/tmp/chipq/r4f.$name.done
  if [ -f "$mark" ]; then echo "SKIP $name (done)" | tee -a $LOG; return; fi
  echo "START $name: $*" | tee -a $LOG
  timeout "$to" "$@" >> $LOG 2>&1
  local rc=$?
  echo "END $name rc=$rc" | tee -a $LOG
  [ $rc -eq 0 ] && touch "$mark"
}
cd /root/repo

# 1. int4 KV at the current headline batch (direct vs 7.87 int8-KV b56)
run kv4_b56 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=56 python bench.py

# 2. int4 KV buys HBM headroom: larger batches
run kv4_b80 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 python bench.py
run kv4_b96 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=96 python bench.py

# 3. int4g serving point (grouped-K scales: QUANT_QUALITY top-1 1.0;
#    W4A8 prefill needs per-channel scales so it stays off here)
run int4g_b56 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_BENCH_WEIGHTS=int4g HALVA_BENCH_BATCH=56 python bench.py

# 4. what the driver records: bench.py with NO env knobs (validates any
#    committed default flips end-to-end before round close)
run bench_plain 3600 python bench.py

echo "R4F QUEUE COMPLETE" | tee -a $LOG

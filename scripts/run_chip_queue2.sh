#!/bin/bash
# Second chip queue: headline-bench variants hunting a better serving
# config than round 2's 7.24 imgs/s (int4 W + int8 KV, b56), plus a
# cache-warming default run for the driver's end-of-round bench.
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

# default config (reproduces the headline + warms the driver's cache)
run bench_default python bench.py
# int4 prompt KV: frees ~4.5 GB at b56 -> ladder starts at b96
run bench_kv4 env HALVA_BENCH_KV=int4 python bench.py
# W4A8 prefill on top of the default config
run bench_w4a8 env HALVA_W4A8=1 python bench.py

echo "=== [$(date +%H:%M:%S)] QUEUE2 COMPLETE" | tee -a "$LOG/queue.log"

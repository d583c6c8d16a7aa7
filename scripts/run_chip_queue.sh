#!/bin/bash
# Serialized real-chip measurement queue for the round-3 open items
# (STATUS.md "Measured on the real v5e chip" queued rows). One job at a
# time: the axon relay exposes a single chip and HBM is never reclaimed
# within a process, so every mode runs in its own python process.
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

# 1. quant quality: each mode its own process, then the report
for m in bf16 int8 int4 int4g nf4 kv4; do
  run "qq_$m" python scripts/quant_quality.py --mode "$m"
done
run qq_report python scripts/quant_quality.py --report
cp /tmp/halva_quant_quality/report.json /root/repo/QUANT_QUALITY.json 2>/dev/null

# 2. flagship train step at the recipe's max_len 2048
run train7b_2048 python scripts/bench_train7b.py --text-len 2048 --iters 3
# packed flagship step (round-3 beyond-verdict feature)
run train7b_pack python scripts/bench_train7b.py --pack --iters 3

# 3. flash vs splash vs official, fwd+bwd
run flash_cmp python scripts/bench_flash.py --splash --official --bwd

# 4. eval host-IO overlap
run hostio python scripts/bench_eval_hostio.py

echo "=== [$(date +%H:%M:%S)] QUEUE COMPLETE" | tee -a "$LOG/queue.log"

#!/bin/bash
# Round-4 continuation: w4a8 quality chain + rows/W4A8 headline
# measurements. Each job is its own process (HBM is never freed
# in-process on this platform). Resumable: skips jobs whose DONE marker
# exists. Cold-cache aware: /tmp (jax compile cache + qq artifacts) may
# be wiped between sessions, so timeouts budget a full remote compile.
set -u
LOG=/tmp/chipq/r4e.log
mkdir -p /tmp/chipq
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local mark=/tmp/chipq/r4e.$name.done
  if [ -f "$mark" ]; then echo "SKIP $name (done)" | tee -a $LOG; return; fi
  echo "START $name: $*" | tee -a $LOG
  timeout "$to" "$@" >> $LOG 2>&1
  local rc=$?
  echo "END $name rc=$rc" | tee -a $LOG
  [ $rc -eq 0 ] && touch "$mark"
}
cd /root/repo

# 1-3. W4A8 on-chip token-agreement evidence (the gate on flipping the
# HALVA_W4A8 default): bf16 oracle + w4a8 run, then merge the w4a8 row
# into the committed QUANT_QUALITY.json (never overwrite the other rows
# — their npz artifacts lived in the wiped /tmp).
run qq_bf16 3600 python scripts/quant_quality.py --mode bf16
run qq_w4a8 3600 python scripts/quant_quality.py --mode w4a8
run qq_merge 600 python scripts/merge_qq.py w4a8

# 4. rows probe (on-chip exactness for multi-row grid steps)
run rows_probe 2400 env HALVA_SCOPED_VMEM_MB=64 \
  python scripts/probe_rows_decode.py

# 5. headline bench with rows
run bench_rows 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_BENCH_BATCH=56 python bench.py

# 6. headline bench with rows + W4A8 prefill
run bench_rows_w4a8 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_BATCH=56 python bench.py

# 7. 13B serving re-measure (best round-4 config: int4 weights + int4 KV b32)
run bench13b 4800 env HALVA_BENCH_PRESET=llava-v1.5-13b HALVA_BENCH_KV=int4 \
  HALVA_BENCH_BATCH=32 HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 python bench.py

# 8. decode profile with rows=4 (attribution, lowest priority)
run prof_rows 2400 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  python scripts/profile_decode.py --variant base --weights int4 --batch 24

echo "R4E QUEUE COMPLETE" | tee -a $LOG

#!/bin/bash
# Round-4 continuation, part 3: (a) rerun the w4a8 quality chain with a
# timeout that budgets the full single-threaded host int4 quantize
# (~1-2 h on this 1-CPU host; r4e's 3600 s died mid-quantize), (b) the
# r4f headline ladder (int4 prompt-KV batches, int4g point), (c) the
# rows=4 decode-attribution profile that r4e's session restart killed,
# (d) bench.py with NO env knobs LAST — it validates whatever defaults
# are committed by then, which is exactly what the driver will record.
# Resumable via done-markers; one process per job (HBM is never freed
# in-process on this platform).
set -u
LOG=/tmp/chipq/r4g.log
mkdir -p /tmp/chipq
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local mark=/tmp/chipq/r4g.$name.done
  if [ -f "$mark" ]; then echo "SKIP $name (done)" | tee -a $LOG; return; fi
  echo "START $name: $*" | tee -a $LOG
  timeout "$to" "$@" >> $LOG 2>&1
  local rc=$?
  echo "END $name rc=$rc" | tee -a $LOG
  [ $rc -eq 0 ] && touch "$mark"
}
cd /root/repo

# 1-2. W4A8 token-agreement evidence (gates the HALVA_W4A8 default flip)
run qq_w4a8 10800 python scripts/quant_quality.py --mode w4a8
run qq_merge 600 python scripts/merge_qq.py w4a8

# 3. int4 prompt-KV at the headline batch, then the headroom ladder
run kv4_b56 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=56 python bench.py
run kv4_b80 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 python bench.py
run kv4_b96 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=96 python bench.py

# 4. int4g serving point (grouped-K scales: QUANT_QUALITY top-1 1.0;
#    W4A8 prefill needs per-channel scales so it stays off here)
run int4g_b56 3600 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  HALVA_BENCH_WEIGHTS=int4g HALVA_BENCH_BATCH=56 python bench.py

# 5. decode attribution with rows=4 (r4e's run was killed by restart)
run prof_rows 2400 env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 \
  python scripts/profile_decode.py --variant base --weights int4 --batch 24

# 6. LAST: exactly what the driver runs at round end
run bench_plain 3600 python bench.py

echo "R4G QUEUE COMPLETE" | tee -a $LOG

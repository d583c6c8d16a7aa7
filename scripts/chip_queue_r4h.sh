#!/bin/bash
# Round-4 continuation, part 4: reprioritized tail of r4g. Waits for the
# already-running qq_w4a8 process (r4g's supervisor was stopped so this
# script could insert eval_real AHEAD of the kv4 ladder — EVAL_REAL.json
# is cited by STATUS/PERF but the container that produced it was wiped
# before it was committed, making it the one cited-but-missing
# artifact), then: merge the w4a8 quality row, regenerate EVAL_REAL.json
# (fixture in /tmp/chair_fixture survives), and finally re-exec
# chip_queue_r4g.sh whose done-markers skip everything already measured.
set -u
LOG=/tmp/chipq/r4h.log
mkdir -p /tmp/chipq
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local mark=/tmp/chipq/r4h.$name.done
  if [ -f "$mark" ]; then echo "SKIP $name (done)" | tee -a $LOG; return; fi
  echo "START $name: $*" | tee -a $LOG
  timeout "$to" "$@" >> $LOG 2>&1
  local rc=$?
  echo "END $name rc=$rc" | tee -a $LOG
  [ $rc -eq 0 ] && touch "$mark"
}
cd /root/repo

# 1. Wait for the orphaned qq_w4a8 python (started by r4g 2026-08-20
#    00:45; its own `timeout 10800` bounds it). Robust to it having
#    already exited.
QQPID="${1:-28708}"
echo "waiting for qq_w4a8 pid $QQPID" | tee -a $LOG
while [ -d "/proc/$QQPID" ]; do sleep 20; done
if [ -f /tmp/halva_quant_quality/w4a8.npz ]; then
  touch /tmp/chipq/r4g.qq_w4a8.done
  echo "qq_w4a8 produced w4a8.npz" | tee -a $LOG
  run qq_merge 600 python scripts/merge_qq.py w4a8
  [ -f /tmp/chipq/r4h.qq_merge.done ] && touch /tmp/chipq/r4g.qq_merge.done
else
  # do NOT let the r4g re-exec burn another 3 h on a rerun; record and
  # move on (manual rerun only if the round has slack at the end)
  touch /tmp/chipq/r4g.qq_w4a8.done /tmp/chipq/r4g.qq_merge.done
  echo "qq_w4a8 FAILED (no w4a8.npz) — markers set to skip rerun" | tee -a $LOG
fi

# 2. EVAL_REAL.json: full `evals/cli chair` subprocess, cold + warm.
run eval_real 10800 env HALVA_SCOPED_VMEM_MB=64 \
  python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128
if [ -f /tmp/chipq/r4h.eval_real.done ]; then
  grep '"metric": "chair500_real_pipeline"' $LOG | tail -1 \
    > /root/repo/EVAL_REAL.json
  echo "EVAL_REAL.json written" | tee -a $LOG
fi

# 3. The rest of r4g (kv4 ladder, int4g, prof_rows, bench_plain) — its
#    markers skip the jobs that already ran.
bash scripts/chip_queue_r4g.sh
echo "R4H QUEUE COMPLETE" | tee -a $LOG

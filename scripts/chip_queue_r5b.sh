#!/bin/bash
# Round-5 chip queue B — serving measurements on round-5 code. Waits for
# queue A (same chip), then: continuous-vs-drain bench, EVAL_REAL v2
# (BPE-density fixture + per-phase startup attribution), and a
# real-pipeline continuous-CLI validation run.
#   nohup bash scripts/chip_queue_r5b.sh > /tmp/chipq5/r5b.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

log() { echo "[r5b $(date -u +%H:%M:%S)] $*" >> "$Q/r5b.log"; }

# wait (up to 4 h) for queue A to release the chip
for i in $(seq 1 480); do
  grep -q "queue complete" "$Q/r5a.log" 2>/dev/null && break
  sleep 30
done
log "queue A done (or wait timed out) — starting"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5b.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5b.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5b.$name.done"
  return $rc
}

land() { # land <job> <src_tail_grep> <dst>  — tmp+mv, done-gated
  local job=$1 pat=$2 dst=$3
  [ -f "$Q/r5b.$job.done" ] || { log "no-land $job (not done)"; return 1; }
  grep "$pat" "$Q/r5b.$job.out" | tail -1 > "$dst.tmp" \
    && [ -s "$dst.tmp" ] && mv "$dst.tmp" "$dst" \
    && log "landed $dst" || { rm -f "$dst.tmp"; log "land FAILED $dst"; }
}

# 1) continuous batching vs bucketed drain, headline serving env
run cb_bench 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 python scripts/bench_continuous.py --batch 80 --requests 240 --cap 128 --chunk 16"
land cb_bench '"metric": "continuous_vs_drain"' /root/repo/BENCH_CONTINUOUS.json

# 2) EVAL_REAL v2: realistic-density BPE fixture + phase attribution
#    (cold = cache rebuild, warm = npz hit), b56 int4+int4KV as round 4
run eval_real 7200 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128"
land eval_real '"metric": "chair500_real_pipeline"' /root/repo/EVAL_REAL_v2.json

# 3) real-pipeline continuous CLI validation (warm cache from job 2)
run eval_real_cont 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 python scripts/bench_eval_real.py --images 112 --batch 56 --tokens 128 --continuous --warm-only"
land eval_real_cont '"metric": "chair500_real_pipeline"' /root/repo/EVAL_REAL_CONT.json

log "queue complete"

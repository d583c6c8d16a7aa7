#!/bin/bash
# Round-5 chip queue D — post-C reruns on the latest round-5 code:
# the streaming warm start (EVAL_REAL v3) and, once the headline_g
# quality row exists, the serving-default confirm bench.
#   nohup bash scripts/chip_queue_r5d.sh > /tmp/chipq5/r5d.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

log() { echo "[r5d $(date -u +%H:%M:%S)] $*" >> "$Q/r5d.log"; }

# wait (up to 8 h) for queue C to release the chip
for i in $(seq 1 960); do
  grep -q "queue complete" "$Q/r5c.log" 2>/dev/null && break
  sleep 30
done
log "queue C done (or wait timed out) — starting"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5d.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5d.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5d.$name.done"
  return $rc
}

land() { # land <job> <pat> <dst>
  local job=$1 pat=$2 dst=$3
  [ -f "$Q/r5d.$job.done" ] || { log "no-land $job"; return 1; }
  grep "$pat" "$Q/r5d.$job.out" | tail -1 > "$dst.tmp" \
    && [ -s "$dst.tmp" ] && mv "$dst.tmp" "$dst" \
    && log "landed $dst" || { rm -f "$dst.tmp"; log "land FAILED $dst"; }
}

# 1) EVAL_REAL v3: warm start on the streaming loader + canary fence
#    (cold wall carried over from the v2 artifact's measured cold run)
run eval_real_v3 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128 --warm-only --cold-wall-s 981.1"
land eval_real_v3 '"metric": "chair500_real_pipeline"' /root/repo/EVAL_REAL_v3.json

log "queue complete"

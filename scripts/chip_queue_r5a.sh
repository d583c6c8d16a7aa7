#!/bin/bash
# Round-5 chip queue A — serving-default quality evidence at scale
# (round-4 verdict item 2). One job at a time on the single relay chip;
# resumable via done-files; per-job timeout (a hung remote compile must
# not stall the queue — round-4 advisor finding); artifacts land in the
# repo via tmp+mv only after their job's done-file exists.
#
#   nohup bash scripts/chip_queue_r5a.sh > /tmp/chipq5/r5a.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

QQ_ENV="HALVA_QQ_DIR=/tmp/halva_qq_v3 HALVA_QQ_PROMPTS=32 HALVA_QQ_TOKENS=256 HALVA_QQ_BATCH=8"
mkdir -p /tmp/halva_qq_v3

log() { echo "[r5a $(date -u +%H:%M:%S)] $*" >> "$Q/r5a.log"; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5a.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5a.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5a.$name.done"
  return $rc
}

# 1) bf16 oracle at n=32 x 256 (batch 1: bf16 weights leave no room)
run qq_bf16 5400 "env $QQ_ENV python scripts/quant_quality.py --mode bf16"

# 2) THE shipped default config: int4 + int4 prompt KV + W4A8 prefill,
#    decoded under the rows4 grid exactly as bench.py ships it
run qq_headline 5400 "env $QQ_ENV HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 python scripts/quant_quality.py --mode headline"

# 3+4) candidate default flips at the same KV config
run qq_int4g 5400 "env $QQ_ENV HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 python scripts/quant_quality.py --mode int4g_kv4"
run qq_nf4 5400 "env $QQ_ENV HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 python scripts/quant_quality.py --mode nf4_kv4"

# 5) report -> repo artifact (gated on every contributing job's done-file)
if [ -f "$Q/r5a.qq_bf16.done" ] && [ -f "$Q/r5a.qq_headline.done" ] \
   && [ -f "$Q/r5a.qq_int4g.done" ] && [ -f "$Q/r5a.qq_nf4.done" ] ; then
  if env $QQ_ENV python scripts/quant_quality.py --report \
      > "$Q/qq_v2_report.json" 2>> "$Q/r5a.log"; then
    if [ -s "$Q/qq_v2_report.json" ]; then
      cp "$Q/qq_v2_report.json" /root/repo/QUANT_QUALITY_v2.json.tmp \
        && mv /root/repo/QUANT_QUALITY_v2.json.tmp /root/repo/QUANT_QUALITY_v2.json
      log "QUANT_QUALITY_v2.json landed"
    fi
  fi
else
  log "report skipped: missing qq done-files"
fi

# 6) serving ladder v2: int4g at the full headline serving shape
#    (b80, rows4, int4 prompt KV; W4A8 self-disables on grouped scales)
run bench_int4g 5400 "env HALVA_BENCH_WEIGHTS=int4g HALVA_BENCH_BATCH=80 python bench.py > $Q/bench_int4g.json.tmp && mv $Q/bench_int4g.json.tmp $Q/bench_int4g.json"

# 7) headline bench re-confirm on round-5 code (same defaults the driver runs)
run bench_headline 5400 "python bench.py > $Q/bench_headline.json.tmp && mv $Q/bench_headline.json.tmp $Q/bench_headline.json"

log "queue complete"

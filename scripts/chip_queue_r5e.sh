#!/bin/bash
# Round-5 chip queue E — reruns on the FIXED round-5 code (replaces
# queue D), priority-ordered for the remaining session wall-clock:
#  1. the proposed-default confirm bench (int4g + int4 KV + w4_gemm
#     grouped prefill) — gates the bench.py default flip
#  2. probe_fold with the scoped-VMEM flag actually applied — gates
#     the beam/spec measurements it skipped in queue C
#  3. spec sweep (verdict item 4), beam A/B (item 8)
#  4. cb_bench64 retry with the refill-bucket cap (item 5)
#  5. EVAL_REAL v3 streaming warm start (item 3)
#  6. qq headline_g rerun on the exact shipped w4_gemm numerics
#   nohup bash scripts/chip_queue_r5e.sh > /tmp/chipq5/r5e.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

log() { echo "[r5e $(date -u +%H:%M:%S)] $*" >> "$Q/r5e.log"; }

# wait (up to 8 h) for queue C to release the chip
for i in $(seq 1 960); do
  grep -q "queue complete" "$Q/r5c.log" 2>/dev/null && break
  sleep 30
done
log "queue C done (or wait timed out) — starting"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5e.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5e.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5e.$name.done"
  return $rc
}

# 1) proposed-default confirm: int4g + int4 KV + grouped w4_gemm prefill
run bench_int4g_v2 5400 "env HALVA_BENCH_WEIGHTS=int4g HALVA_BENCH_BATCH=80 python bench.py > $Q/bench_int4g_v2.json.tmp && mv $Q/bench_int4g_v2.json.tmp $Q/bench_int4g_v2.json"

# 2) fold exactness on real Mosaic (now applies the vmem flag itself)
run probe_fold 3600 "python scripts/probe_fold.py"

# 3) speculative sweep on the fused verify step, headline serving env
if [ -f "$Q/r5e.probe_fold.done" ]; then
  for K in 2 4 8; do
    run spec_k$K 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 HALVA_BENCH_SPEC=$K python bench.py > $Q/spec_k$K.json.tmp && mv $Q/spec_k$K.json.tmp $Q/spec_k$K.json"
  done
  # 4) beam A/B at the round-3/4 comparison config (b16 K=4 int4+int8KV)
  run bench_beam_fold 5400 "env HALVA_SCOPED_VMEM_MB=64 python scripts/bench_beam.py > $Q/beam_fold.json.tmp && mv $Q/beam_fold.json.tmp $Q/beam_fold.json"
  run bench_beam_grid 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_BEAM_DOT=grid python scripts/bench_beam.py > $Q/beam_grid.json.tmp && mv $Q/beam_grid.json.tmp $Q/beam_grid.json"
else
  log "spec/beam skipped: probe_fold not green"
fi

# 4e) qt int4/int4g reruns: the queue-C attempts died on pallas_call's
#     missing JVP (w4_gemm pre-custom-vjp); int8 base succeeded and is
#     the report reference (bf16 cannot fit — see quant_quality_train)
for BASE in int4 int4g; do
  run qt_$BASE 5400 "env HALVA_QQT_DIR=/tmp/halva_qq_train python scripts/quant_quality_train.py --base $BASE"
done
if [ -f "$Q/r5e.qt_int4.done" ]; then
  if env HALVA_QQT_DIR=/tmp/halva_qq_train python scripts/quant_quality_train.py --report \
      > "$Q/qt_report.out" 2>>"$Q/r5e.log"; then
    if [ -s /tmp/halva_qq_train/report.json ]; then
      cp /tmp/halva_qq_train/report.json /root/repo/QUANT_TRAIN.json.tmp \
        && mv /root/repo/QUANT_TRAIN.json.tmp /root/repo/QUANT_TRAIN.json
      log "QUANT_TRAIN.json landed"
    fi
  fi
fi

# 5) continuous-vs-drain with the refill-bucket cap
run cb_bench64 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 python scripts/bench_continuous.py --batch 64 --requests 256 --cap 128 --chunk 16"
if [ -f "$Q/r5e.cb_bench64.done" ]; then
  grep '"metric": "continuous_vs_drain"' "$Q/r5e.cb_bench64.out" | tail -1 \
    > /root/repo/BENCH_CONTINUOUS.json.tmp \
    && [ -s /root/repo/BENCH_CONTINUOUS.json.tmp ] \
    && mv /root/repo/BENCH_CONTINUOUS.json.tmp /root/repo/BENCH_CONTINUOUS.json \
    && log "BENCH_CONTINUOUS.json landed" \
    || rm -f /root/repo/BENCH_CONTINUOUS.json.tmp
fi

# 6) EVAL_REAL v3: streaming warm start + canary fence (cold wall
#    carried from the v2 artifact's measured cold run)
run eval_real_v3 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 python scripts/bench_eval_real.py --images 500 --batch 56 --tokens 128 --warm-only --cold-wall-s 981.1"
if [ -f "$Q/r5e.eval_real_v3.done" ]; then
  grep '"metric": "chair500_real_pipeline"' "$Q/r5e.eval_real_v3.out" | tail -1 \
    > /root/repo/EVAL_REAL_v3.json.tmp \
    && [ -s /root/repo/EVAL_REAL_v3.json.tmp ] \
    && mv /root/repo/EVAL_REAL_v3.json.tmp /root/repo/EVAL_REAL_v3.json \
    && log "landed EVAL_REAL_v3.json" \
    || rm -f /root/repo/EVAL_REAL_v3.json.tmp
fi

# 7) headline_g quality on the exact shipped grouped-prefill numerics
run qq_headline_g2 5400 "env HALVA_QQ_DIR=/tmp/halva_qq_v3 HALVA_QQ_PROMPTS=32 HALVA_QQ_TOKENS=256 HALVA_QQ_BATCH=8 HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 python scripts/quant_quality.py --mode headline_g"
if [ -f "$Q/r5e.qq_headline_g2.done" ]; then
  if env HALVA_QQ_DIR=/tmp/halva_qq_v3 HALVA_QQ_PROMPTS=32 HALVA_QQ_TOKENS=256 python scripts/quant_quality.py --report \
      > "$Q/qq_v3_report.json" 2>>"$Q/r5e.log"; then
    if [ -s "$Q/qq_v3_report.json" ]; then
      cp "$Q/qq_v3_report.json" /root/repo/QUANT_QUALITY_v2.json.tmp \
        && mv /root/repo/QUANT_QUALITY_v2.json.tmp /root/repo/QUANT_QUALITY_v2.json
      log "QUANT_QUALITY_v2.json refreshed (w4_gemm numerics)"
    fi
  fi
fi

log "queue complete"

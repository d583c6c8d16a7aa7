#!/bin/bash
# Round-5 chip queue C — the folded-kernel serving measurements and the
# training-signal quantization evidence. Waits for queue B (same chip),
# then: fold exactness probes, beam bench on the dot-fold path (round-4
# verdict item 8), the speculative sweep K in {2,4,8} on the fused
# verify step (item 4), and the quant_quality_train base modes (item 6).
#   nohup bash scripts/chip_queue_r5c.sh > /tmp/chipq5/r5c.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

log() { echo "[r5c $(date -u +%H:%M:%S)] $*" >> "$Q/r5c.log"; }

# wait (up to 6 h) for queue B to release the chip
for i in $(seq 1 720); do
  grep -q "queue complete" "$Q/r5b.log" 2>/dev/null && break
  sleep 30
done
log "queue B done (or wait timed out) — starting"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5c.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5c.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5c.$name.done"
  return $rc
}

# 0) continuous-vs-drain retry at b64 (the b80 attempt in queue B
#    compile-OOM'd: engine programs + resident tree hit 18.24G; b64
#    trims the activation/state footprint while keeping the length
#    distribution, requests = 4 full batches)
run cb_bench64 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 python scripts/bench_continuous.py --batch 64 --requests 256 --cap 128 --chunk 16"
if [ -f "$Q/r5c.cb_bench64.done" ]; then
  grep '"metric": "continuous_vs_drain"' "$Q/r5c.cb_bench64.out" | tail -1 \
    > /root/repo/BENCH_CONTINUOUS.json.tmp \
    && [ -s /root/repo/BENCH_CONTINUOUS.json.tmp ] \
    && mv /root/repo/BENCH_CONTINUOUS.json.tmp /root/repo/BENCH_CONTINUOUS.json \
    && log "BENCH_CONTINUOUS.json landed" \
    || rm -f /root/repo/BENCH_CONTINUOUS.json.tmp
fi

# 1) fold-kernel exactness on real Mosaic (beams dot-fold vs grid,
#    verify mode vs XLA oracle, fused verify step argmax parity)
run probe_fold 3600 "python scripts/probe_fold.py"
# 2) beam-grid regression probe (pins HALVA_BEAM_DOT=grid itself)
run probe_beam_fold 3600 "python scripts/probe_beam_fold.py"

# 3) beam bench on the dot-fold path (BEAM_ONCHIP v3 candidate):
#    same b16 K=4 int4+int8KV config as rounds 3/4 for comparability
if [ -f "$Q/r5c.probe_fold.done" ]; then
  run bench_beam_fold 5400 "env HALVA_SCOPED_VMEM_MB=64 python scripts/bench_beam.py > $Q/beam_fold.json.tmp && mv $Q/beam_fold.json.tmp $Q/beam_fold.json"
  # grid path at the same config for the A/B delta
  run bench_beam_grid 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_BEAM_DOT=grid python scripts/bench_beam.py > $Q/beam_grid.json.tmp && mv $Q/beam_grid.json.tmp $Q/beam_grid.json"
else
  log "beam benches skipped: probe_fold not green"
fi

# 4) speculative sweep on the fused verify step, headline serving env
#    (each K its own process — relay HBM is never freed)
if [ -f "$Q/r5c.probe_fold.done" ]; then
  for K in 2 4 8; do
    run spec_k$K 5400 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 HALVA_BENCH_SPEC=$K python bench.py > $Q/spec_k$K.json.tmp && mv $Q/spec_k$K.json.tmp $Q/spec_k$K.json"
  done
else
  log "spec sweep skipped: probe_fold not green"
fi

# 4b) the round-5 proposed DEFAULT: int4g weights + int4 prompt KV +
#     grouped W4A8 (w4a8_dense ng>1) — throughput at the headline shape
run bench_int4g_w4a8 5400 "env HALVA_BENCH_WEIGHTS=int4g HALVA_BENCH_BATCH=80 python bench.py > $Q/bench_int4g_w4a8.json.tmp && mv $Q/bench_int4g_w4a8.json.tmp $Q/bench_int4g_w4a8.json"

# 4c) quality of that default at n=32 x 256 (the verdict-2 bar:
#     first_token_agreement 1.0) — grouped W4A8 changes prefill
#     numerics, so the int4g_kv4 (w4a8-off) row cannot stand in
run qq_headline_g 5400 "env HALVA_QQ_DIR=/tmp/halva_qq_v3 HALVA_QQ_PROMPTS=32 HALVA_QQ_TOKENS=256 HALVA_QQ_BATCH=8 HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 python scripts/quant_quality.py --mode headline_g"
if [ -f "$Q/r5c.qq_headline_g.done" ]; then
  if env HALVA_QQ_DIR=/tmp/halva_qq_v3 HALVA_QQ_PROMPTS=32 HALVA_QQ_TOKENS=256 python scripts/quant_quality.py --report \
      > "$Q/qq_v3_report.json" 2>>"$Q/r5c.log"; then
    if [ -s "$Q/qq_v3_report.json" ]; then
      cp "$Q/qq_v3_report.json" /root/repo/QUANT_QUALITY_v2.json.tmp \
        && mv /root/repo/QUANT_QUALITY_v2.json.tmp /root/repo/QUANT_QUALITY_v2.json
      log "QUANT_QUALITY_v2.json refreshed with headline_g"
    fi
  fi
fi

# 4d) decode-rows ladder at the headline config: rows=8 halves the
#     per-step pipeline overhead again IF the scoped-VMEM plan admits it
run bench_rows8 5400 "env HALVA_SCOPED_VMEM_MB=96 HALVA_DECODE_ROWS=8 python bench.py > $Q/bench_rows8.json.tmp && mv $Q/bench_rows8.json.tmp $Q/bench_rows8.json"

# 5) training-signal quantization evidence (verdict item 6): each base
#    mode in its own process; bf16 first (the oracle)
QT_ENV="HALVA_QQT_DIR=/tmp/halva_qq_train"
mkdir -p /tmp/halva_qq_train
for BASE in bf16 int8 int4 int4g; do
  run qt_$BASE 5400 "env $QT_ENV python scripts/quant_quality_train.py --base $BASE"
done
if [ -f "$Q/r5c.qt_bf16.done" ] && [ -f "$Q/r5c.qt_int4.done" ]; then
  if env $QT_ENV python scripts/quant_quality_train.py --report \
      > "$Q/qt_report.out" 2>>"$Q/r5c.log"; then
    if [ -s /tmp/halva_qq_train/report.json ]; then
      cp /tmp/halva_qq_train/report.json /root/repo/QUANT_TRAIN.json.tmp \
        && mv /root/repo/QUANT_TRAIN.json.tmp /root/repo/QUANT_TRAIN.json
      log "QUANT_TRAIN.json landed"
    fi
  fi
else
  log "qt report skipped: bf16/int4 not done"
fi

log "queue complete"

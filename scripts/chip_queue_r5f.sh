#!/bin/bash
# Round-5 chip queue F — the last measurement pass, time-budgeted to
# finish before the driver's round-end bench needs the chip:
# probe_fold retry (its queue-E failure was a relay-connection hiccup
# mid-compile, not a kernel error), the speculative K=4 point at the
# flat-int4 headline config (comparable to queue A's bench_headline),
# and the beam dot-fold A/B.
#   nohup bash scripts/chip_queue_r5f.sh > /tmp/chipq5/r5f.nohup 2>&1 &
set -u
Q=/tmp/chipq5
mkdir -p "$Q"
cd /root/repo

log() { echo "[r5f $(date -u +%H:%M:%S)] $*" >> "$Q/r5f.log"; }

for i in $(seq 1 720); do
  grep -q "queue complete" "$Q/r5e.log" 2>/dev/null && break
  sleep 30
done
log "queue E done (or wait timed out) — starting"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/r5f.$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$tmo" bash -c "$*" >> "$Q/r5f.$name.out" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$Q/r5f.$name.done"
  return $rc
}

run probe_fold 2700 "python scripts/probe_fold.py"

if [ -f "$Q/r5f.probe_fold.done" ]; then
  # flat int4 pinned: the spec baseline is queue A's bench_headline
  # (flat int4 + int4 KV + rows4 + W4A8, 8.981 imgs/s)
  run spec_k4 4500 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 HALVA_BENCH_WEIGHTS=int4 HALVA_BENCH_SPEC=4 python bench.py > $Q/spec_k4.json.tmp && mv $Q/spec_k4.json.tmp $Q/spec_k4.json"
  run bench_beam_fold 4500 "env HALVA_SCOPED_VMEM_MB=64 python scripts/bench_beam.py > $Q/beam_fold.json.tmp && mv $Q/beam_fold.json.tmp $Q/beam_fold.json"
  run bench_beam_grid 4500 "env HALVA_SCOPED_VMEM_MB=64 HALVA_BEAM_DOT=grid python scripts/bench_beam.py > $Q/beam_grid.json.tmp && mv $Q/beam_grid.json.tmp $Q/beam_grid.json"
  run spec_k2 4500 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 HALVA_BENCH_WEIGHTS=int4 HALVA_BENCH_SPEC=2 python bench.py > $Q/spec_k2.json.tmp && mv $Q/spec_k2.json.tmp $Q/spec_k2.json"
  run spec_k8 4500 "env HALVA_SCOPED_VMEM_MB=64 HALVA_DECODE_ROWS=4 HALVA_W4A8=1 HALVA_BENCH_KV=int4 HALVA_BENCH_BATCH=80 HALVA_BENCH_WEIGHTS=int4 HALVA_BENCH_SPEC=8 python bench.py > $Q/spec_k8.json.tmp && mv $Q/spec_k8.json.tmp $Q/spec_k8.json"
else
  log "spec/beam skipped: probe_fold not green"
fi

log "queue complete"

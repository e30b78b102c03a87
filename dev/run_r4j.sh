#!/bin/bash
# Round-4 queue J: DINO train-step ladder with the xla4 custom_vjp
# backward (IR_ADS_MSDEFORM_BWD=xla, now the xla4 default) — sumloss
# first (the minimal repro that failed), then the full production step.
# Waits for queue I (the forward profile) to release the TPU.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4j.log}
: > "$OUT"

for _ in $(seq 1 720); do
  grep -q R4I_ALL_DONE /tmp/r4i.log 2>/dev/null && break
  sleep 10
done

echo "=== DINO ladder: sumloss (xla4 fwd + xla bwd vjp) $(date +%H:%M:%S) ===" >> "$OUT"
timeout 5400 python dev/probe_dino_train_ladder.py sumloss >> "$OUT" 2>&1

echo "=== DINO ladder: full (xla4 fwd + xla bwd vjp) $(date +%H:%M:%S) ===" >> "$OUT"
timeout 5400 python dev/probe_dino_train_ladder.py full >> "$OUT" 2>&1

echo "R4J_ALL_DONE" >> "$OUT"

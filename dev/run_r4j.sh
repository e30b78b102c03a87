#!/bin/bash
# Round-4 queue J: DINO train-step brackets, second wave.  The r4h data
# says there are MULTIPLE killers: xla4's patch-slice scatter bwd (fast
# fail, fixed by the custom_vjp), something in the full step that fails
# fast even at 512x640 with plain gathers, and an 11-minute slow fail on
# the 800x1216 no-criterion backward (helper OOM class).  This wave:
#   1. small (full step, xla4 fwd + xla-vjp bwd) with FULL error text --
#      the 500 body tail should name the actual XLA crash
#   2. nomask / nocdn at small res -- bracket the fast criterion killer
# Waits for queue I (the forward profile) to release the TPU.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4j.log}
: > "$OUT"

for _ in $(seq 1 720); do
  grep -q R4I_ALL_DONE /tmp/r4i.log 2>/dev/null && break
  sleep 10
done

for v in small nomask nocdn sumloss; do
  echo "=== DINO ladder: $v @512x640 (xla4 fwd + xla-vjp bwd) $(date +%H:%M:%S) ===" >> "$OUT"
  DINO_LADDER_SMALL=1 timeout 5400 python dev/probe_dino_train_ladder.py "$v" >> "$OUT" 2>&1
done

echo "R4J_ALL_DONE" >> "$OUT"

#!/bin/bash
# Round-4 queue H: bracket the DINO train-step compile-helper kill now
# that sumloss (no criterion) is known to fail too — the killer is in
# the model backward.  Three axes, one process each:
#   small       full step at 512x640        -> program-size control
#   sumloss+xla model bwd with plain-gather  -> is xla4's bwd the killer?
#   small+xla   both                          -> floor control
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4h.log}
: > "$OUT"

note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

note "DINO ladder: small (512x640 full step)"
timeout 5400 python dev/probe_dino_train_ladder.py small >> "$OUT" 2>&1

note "DINO ladder: sumloss + IR_ADS_MSDEFORM=xla"
IR_ADS_MSDEFORM=xla timeout 5400 python dev/probe_dino_train_ladder.py sumloss >> "$OUT" 2>&1

note "DINO ladder: small + IR_ADS_MSDEFORM=xla"
IR_ADS_MSDEFORM=xla timeout 5400 python dev/probe_dino_train_ladder.py small >> "$OUT" 2>&1

echo "R4H_ALL_DONE" >> "$OUT"

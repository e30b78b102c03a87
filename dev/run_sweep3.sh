#!/bin/bash
# Round-2 continuation sweep: post-adaptive-rpe-chunk measurements.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/ablate_sweep3.jsonl

run() {
  local label="$1"; shift
  echo "=== $label ===" >> /tmp/sweep3.log
  timeout 1200 python dev/ablate_full.py "$@" 2>/dev/null | tail -1 | \
    sed "s/^{/{\"label\": \"$label\", /" >> "$OUT"
  tail -1 "$OUT" >> /tmp/sweep3.log
}

run rpe_off --ablate dscf_rpe
run batch16 --batch 16
run dual --dual
echo SWEEP3 DONE >> /tmp/sweep3.log

#!/bin/bash
# Follow-on msdeform variants: 2x2-patch slice gathers (one row per
# (query, point) = 4x fewer descriptors if row-rate-bound — the take1
# numbers say it is), paired-corner slices, onehot at L1.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/msd2.log}
while ! grep -q MSD2_ALL_DONE "$OUT" 2>/dev/null; do sleep 60; done

run() {
  echo "=== $2 $(date +%H:%M:%S) ===" >> "$OUT"
  timeout "$1" python dev/probe_msd2.py "$2" >> "$OUT" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$OUT"
}
run 2400 gpatch_L0
run 2400 gpatch_L2
run 2400 onehot_L1
run 2400 gslice2_L0
echo "MSD2C_ALL_DONE" >> "$OUT"

#!/bin/bash
# Round-4 queue B: stage-0 v4 itemization + rpe builder timings.
# Waits for the msdeform variant sweep (sequential TPU rule).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4b.log}
: >> "$OUT"
while ! grep -q MSD2C_ALL_DONE /tmp/msd2.log 2>/dev/null; do sleep 60; done

note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

note "rpe L3: einsum vs rows vs packed kernel"
timeout 3600 python dev/probe_rpe_itemize.py L3 >> "$OUT" 2>&1

note "v4 stage0 per-pass budget"
timeout 5400 python dev/probe_v4_itemize.py stage0 >> "$OUT" 2>&1

note "rpe L0 knockouts"
timeout 3600 python dev/probe_rpe_itemize.py L0 >> "$OUT" 2>&1

echo "R4B_ALL_DONE" >> "$OUT"

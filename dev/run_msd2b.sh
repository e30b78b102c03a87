#!/bin/bash
# Follow-on msdeform variants (paired-corner slice gathers): waits for the
# main sweep to finish so TPU jobs stay sequential.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/msd2.log}
while ! grep -q MSD2_ALL_DONE "$OUT" 2>/dev/null; do sleep 60; done

run() {
  echo "=== $2 $(date +%H:%M:%S) ===" >> "$OUT"
  timeout "$1" python dev/probe_msd2.py "$2" >> "$OUT" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$OUT"
}
run 2400 gslice2_L2
run 2400 gslice2_L0
echo "MSD2B_ALL_DONE" >> "$OUT"

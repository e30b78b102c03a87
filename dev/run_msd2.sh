#!/bin/bash
# Round-4 msdeform forms, one variant per process (own timeout each).
# Usage: bash dev/run_msd2.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/msd2.log}
: >> "$OUT"

run() {  # run <timeout_s> <variant>
  echo "=== $2 $(date +%H:%M:%S) ===" >> "$OUT"
  timeout "$1" python dev/probe_msd2.py "$2" >> "$OUT" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$OUT"
}

# cheap compiles first; encoder-scale whole-op forms last with big timeouts
run 1500 take1_L2
run 1500 onehot_L2
run 1500 onehot_L3
run 1800 take1_L0
run 1800 take4_L0
run 1800 whole_dec
run 1800 xla2_dec
run 3600 xla2_enc
run 3600 whole_enc
echo "MSD2_ALL_DONE" >> "$OUT"

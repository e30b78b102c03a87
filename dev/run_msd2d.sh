#!/bin/bash
# Round-4 queue D: the composed xla4/xla3 msdeform forms at production
# scale, then the DINO forward+train probe on the winner.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/msd2.log}
while ! grep -q R4B_ALL_DONE /tmp/r4b.log 2>/dev/null; do sleep 60; done

run() {
  echo "=== $2 $(date +%H:%M:%S) ===" >> "$OUT"
  timeout "$1" python dev/probe_msd2.py "$2" >> "$OUT" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$OUT"
}
run 2400 xla4_dec
run 3600 xla4_enc
run 2400 xla3_dec
echo "=== dino fwd+train (xla4 msdeform) $(date +%H:%M:%S) ===" >> "$OUT"
IR_ADS_MSDEFORM=xla4 timeout 7200 python dev/probe_swinl_dino.py dino \
  >> "$OUT" 2>&1
echo "--- exit=$? $(date +%H:%M:%S)" >> "$OUT"
echo "MSD2D_ALL_DONE" >> "$OUT"

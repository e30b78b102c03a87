#!/bin/bash
# Round-4 queue E: headline bench A/B of the flat input feed.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4e.log}
: >> "$OUT"
while ! grep -q R4C_ALL_DONE /tmp/r4c.log 2>/dev/null; do sleep 60; done

echo "=== bench FLAT=1 $(date +%H:%M:%S) ===" >> "$OUT"
IR_ADS_FLAT_INPUT=1 timeout 4800 python bench.py >> "$OUT" 2>&1
echo "=== bench FLAT=0 $(date +%H:%M:%S) ===" >> "$OUT"
timeout 4800 python bench.py >> "$OUT" 2>&1
echo "R4E_ALL_DONE" >> "$OUT"

#!/bin/bash
# r5i: DINO numbers of record after the r5h bisect (level backward is
# good AND fast: 2742 ms/step at 800x1216 vs the pre-fix 3551.6; the
# TPU-worker crash tracks IR_ADS_MASK_SAMPLE=patch).  (1) the 2000-query
# eval forward with the lane-aligned corner weighting (commit 2e1751a);
# (2) per-fusion itemization of the 2742 ms step under the good config.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5i.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

note "dino eval forward (lane-aligned corner weighting)"
IR_ADS_MASK_SAMPLE=xla timeout 3600 python dev/probe_swinl_dino.py dino \
  >> "$OUT" 2>&1

note "dino train profile (level bwd, xla mask sampling)"
IR_ADS_MSDEFORM_BWD=level IR_ADS_MASK_SAMPLE=xla \
  timeout 3600 python dev/probe_profile_dino_train.py full /tmp/dino_tt3 \
  > dev/logs/r5i_dino_profile.log 2>&1
tail -5 dev/logs/r5i_dino_profile.log >> "$OUT"

echo "R5I_ALL_DONE" >> "$OUT"

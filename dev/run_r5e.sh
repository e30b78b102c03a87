#!/bin/bash
# r5e: (1) real-TPU compile check + standalone timing of the round-5
# attention BACKWARD kernel; (2) semseg train-step A/B of the manual
# Pallas backward vs the XLA-recompute vjp (same probe as the r5b
# itemization, so numbers are comparable); (3) the DINO 800x1216
# post-fix full step + its profiles that died with the r5c session.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5e.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

note "attn bwd kernel check + timing"
timeout 2400 python dev/probe_r5_kernels.py d >> "$OUT" 2>&1

note "train step A/B: ATTN_BWD=xla"
IR_ADS_ATTN_BWD=xla timeout 3600 python dev/probe_profile_train.py \
  /tmp/tt_xla >> "$OUT" 2>&1

note "train step A/B: ATTN_BWD=pallas"
IR_ADS_ATTN_BWD=pallas timeout 3600 python dev/probe_profile_train.py \
  /tmp/tt_pallas >> "$OUT" 2>&1

note "DINO full train step 800x1216 (mask fix + remat-save)"
timeout 3600 python dev/probe_dino_train_ladder.py full \
  > dev/logs/r5e_full.json 2>> "$OUT"
echo "full: $(cat dev/logs/r5e_full.json)" >> "$OUT"

note "DINO train profile (post-fix itemization)"
timeout 3600 python dev/probe_profile_dino_train.py full /tmp/dino_tt2 \
  > dev/logs/r5e_dino_profile.log 2>&1

note "DINO forward profile 800x1216"
timeout 5400 python dev/probe_profile_dino_fwd.py /tmp/dino_fwd_tr \
  > dev/logs/r5e_dino_fwd.log 2>&1

echo "R5E_ALL_DONE" >> "$OUT"

#!/bin/bash
# r5b: headline A/Bs (typed bias+mask BIASMASK=3, fused patch-embed kernel)
# on the r5 config + FLAT base, then the DINO forward per-fusion profile
# (floor derivation input for BASELINE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5b.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

R5_ENV=(
  IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6
  IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla
  IR_ADS_FFN=fused
  IR_ADS_SWIN_PACKED=1
  IR_ADS_DSCF_PACKED=1,1,1,0
  IR_ADS_FLAT_INPUT=1
)

note "A/B: baseline; +BIASMASK3; +BIASMASK3+PE-pallas; PE-pallas only"
env "${R5_ENV[@]}" timeout 9000 python dev/ablate_full.py --each \
  ";@IR_ADS_SWIN_BIASMASK=3;@IR_ADS_PATCH_EMBED=pallas;@IR_ADS_SWIN_BIASMASK=0" \
  >> "$OUT" 2>&1

note "DINO forward profile 800x1216"
timeout 5400 python dev/probe_profile_dino_fwd.py /tmp/dino_fwd_trace \
  >> "$OUT" 2>&1

note "semseg train-step profile (VERDICT r5 item 4 itemization)"
timeout 5400 python dev/probe_profile_train.py /tmp/train_trace_r5 \
  >> "$OUT" 2>&1

echo "R5B_ALL_DONE" >> "$OUT"

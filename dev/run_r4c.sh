#!/bin/bash
# Round-4 queue C2 (consolidated): patch-embed layout probe + whole-model
# A/Bs of the round-4 candidates.  Chains after queue D (DINO).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4c.log}
: >> "$OUT"
while ! grep -q MSD2D_ALL_DONE /tmp/msd2.log 2>/dev/null; do sleep 60; done

note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

R5_ENV=(
  IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6
  IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla
  IR_ADS_FFN=fused
  IR_ADS_SWIN_PACKED=1
  IR_ADS_DSCF_PACKED=1,1,1,0
)

note "patch-embed nhwc vs flat feed"
timeout 2400 python dev/probe_patchembed.py >> "$OUT" 2>&1

note "whole-model A/B: packed L3 rpe (RPE3) x band-type slab (BIASMASK=2)"
env "${R5_ENV[@]}" timeout 9000 python dev/ablate_full.py --each \
  "@IR_ADS_DSCF_RPE3=xla@IR_ADS_SWIN_BIASMASK=0;@IR_ADS_DSCF_RPE3=pallas;@IR_ADS_DSCF_RPE3=pallas@IR_ADS_SWIN_BIASMASK=2;@IR_ADS_DSCF_RPE3=xla@IR_ADS_SWIN_BIASMASK=2" \
  >> "$OUT" 2>&1

echo "R4C_ALL_DONE" >> "$OUT"

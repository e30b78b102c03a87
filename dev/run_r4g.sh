#!/bin/bash
# Round-4 queue G: (1) head-first L3 rpe A/B on top of the accepted FLAT
# feed (base 69.46 ms), (2) the DINO train-step ladder — vmapcrit first
# (the candidate fix), then sumloss (model-vs-criterion bracket).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4g.log}
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

note "A/B: head-first single-einsum L3 rpe (IR_ADS_DSCF_RPE_XLA=2) on FLAT base"
env "${R5_ENV[@]}" timeout 5400 python dev/ablate_full.py --each \
  "@IR_ADS_DSCF_RPE_XLA=2" >> "$OUT" 2>&1

note "DINO ladder: vmapcrit"
timeout 5400 python dev/probe_dino_train_ladder.py vmapcrit >> "$OUT" 2>&1

note "DINO ladder: sumloss"
timeout 5400 python dev/probe_dino_train_ladder.py sumloss >> "$OUT" 2>&1

echo "R4G_ALL_DONE" >> "$OUT"

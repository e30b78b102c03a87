#!/bin/bash
# r5g: round-5 follow-ups after r5f — (1) frozen-backbone bwd kernel
# timing; (2) adapter-only train-step (the reference's shipped recipe,
# TRAIN_TYPE: Adapter) with the pallas backward + tail remat; (3) env
# sweep of the never-measured v7 stage-0/1 whole-block variant and the
# BM3 combination for the headline.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5g.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

note "frozen bwd kernel timing"
timeout 2400 python dev/probe_r5_kernels.py e >> "$OUT" 2>&1

note "dscf bwd kernel timing"
timeout 2400 python dev/probe_r5_kernels.py f >> "$OUT" 2>&1

note "train step: all-params, pallas attn+dscf bwd + rpb vjp (delta vs 191.2)"
IR_ADS_ATTN_BWD=pallas timeout 4200 python dev/probe_profile_train.py \
  /tmp/tt_pallas2 >> "$OUT" 2>&1

note "train step: adapter-only recipe, pallas bwd + tail remat"
IR_ADS_PROBE_TRAIN_TYPE=Adapter IR_ADS_ATTN_BWD=pallas \
  timeout 4200 python dev/probe_profile_train.py /tmp/tt_adapter \
  >> "$OUT" 2>&1

note "env sweep: v7 stages 0-1 + BM3 combos (headline)"
timeout 7200 python dev/sweep_env.py \
  'base=' \
  'v7_01=IR_ADS_SWIN_ATTN=pallas7,pallas7,pallas6,pallas6' \
  'bm3=IR_ADS_SWIN_BIASMASK=3' \
  'v7+bm3=IR_ADS_SWIN_ATTN=pallas7,pallas7,pallas6,pallas6;IR_ADS_SWIN_BIASMASK=3' \
  >> "$OUT" 2>&1

note "dino eval fwd dispatch A/B: plain-xla4 vs level wrapper"
IR_ADS_MSDEFORM_BWD=plain IR_ADS_MASK_SAMPLE=xla \
  timeout 3600 python dev/probe_swinl_dino.py dino >> "$OUT" 2>&1

echo "R5G_ALL_DONE" >> "$OUT"

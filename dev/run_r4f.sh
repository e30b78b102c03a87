#!/bin/bash
# Round-4 queue F (session 3): in-context A/Bs of the uncommitted-decision
# knobs (band-type bias+mask slab, FLAT feed), then the DINO xla4 forward +
# train step, then nothing — bench runs separately once the defaults are
# decided.
#
# History: the first cut of this queue also A/B'd IR_ADS_DSCF_RPE3=pallas
# (the packed L3 rpe builder); in whole-model context it kills the relay
# compile helper (HTTP 500) so the builder's default is now xla and the
# variant is dropped here.  Baseline (all knobs off) measured 74.15 ms
# B=8 480p bf16 before the crash.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4f2.log}
: > "$OUT"

note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

R5_ENV=(
  IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6
  IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla
  IR_ADS_FFN=fused
  IR_ADS_SWIN_PACKED=1
  IR_ADS_DSCF_PACKED=1,1,1,0
)

note "whole-model A/B: BIASMASK2 x FLAT (RPE3 defaults to xla now)"
env "${R5_ENV[@]}" timeout 9000 python dev/ablate_full.py --each \
  "@IR_ADS_SWIN_BIASMASK=2@IR_ADS_FLAT_INPUT=0;@IR_ADS_SWIN_BIASMASK=0@IR_ADS_FLAT_INPUT=1;@IR_ADS_SWIN_BIASMASK=2@IR_ADS_FLAT_INPUT=1" \
  >> "$OUT" 2>&1

note "DINO xla4: forward + train step (scan layers)"
timeout 7200 python dev/probe_swinl_dino.py dino >> "$OUT" 2>&1

echo "R4F_ALL_DONE" >> "$OUT"

#!/bin/bash
# r5d: standalone real-TPU compile checks of the round-5 kernels (one per
# process: a Mosaic wall kills the process), then the CLEAN whole-model
# A/B — every tag states ALL knobs so no env leaks between tags (the r5c
# A/B was contaminated by a persisting BIASMASK=3).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5d.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

for k in a b c; do
  note "kernel check $k"
  timeout 2400 python dev/probe_r5_kernels.py $k >> "$OUT" 2>&1
done

R5_ENV=(
  IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6
  IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla
  IR_ADS_FFN=fused
  IR_ADS_SWIN_PACKED=1
  IR_ADS_DSCF_PACKED=1,1,1,0
  IR_ADS_FLAT_INPUT=1
)

note "clean A/B: BM3; PEpallas; offset-shift; BM3+offset-shift"
env "${R5_ENV[@]}" timeout 9000 python dev/ablate_full.py --each \
  "@IR_ADS_SWIN_BIASMASK=3@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=conv;@IR_ADS_SWIN_BIASMASK=0@IR_ADS_PATCH_EMBED=pallas@IR_ADS_DSCF_OFFSET=conv;@IR_ADS_SWIN_BIASMASK=0@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=shift;@IR_ADS_SWIN_BIASMASK=3@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=shift" \
  >> "$OUT" 2>&1

echo "R5D_ALL_DONE" >> "$OUT"

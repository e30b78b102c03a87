#!/bin/bash
# r5c: (1) re-A/B typed mask (scatter-add fixed to slice+DUS) + both
# patch-embed variants; (2) DINO fwd profile (import fixed); (3) DINO full
# train step after the matched-mask-loss memory fix + msdeform remat-save
# policy; (4) its per-fusion profile.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5c.log}
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

note "A/B: base; BM3; BM3+PEpallas; BM3+PExla2; PExla2 only"
env "${R5_ENV[@]}" timeout 9000 python dev/ablate_full.py --each \
  ";@IR_ADS_SWIN_BIASMASK=3;@IR_ADS_PATCH_EMBED=pallas;@IR_ADS_PATCH_EMBED=xla2;@IR_ADS_SWIN_BIASMASK=0" \
  >> "$OUT" 2>&1

note "DINO full train step at 800x1216 (mask fix + remat-save)"
timeout 3600 python dev/probe_dino_train_ladder.py full \
  > dev/logs/r5c_full.json 2>> "$OUT"
echo "full: $(cat dev/logs/r5c_full.json)" >> "$OUT"

note "DINO train profile (post-fix itemization)"
timeout 3600 python dev/probe_profile_dino_train.py full /tmp/dino_train_trace2 \
  > dev/logs/r5c_dino_profile.log 2>&1

note "DINO forward profile 800x1216"
timeout 5400 python dev/probe_profile_dino_fwd.py /tmp/dino_fwd_trace \
  > dev/logs/r5c_dino_fwd.log 2>&1

echo "R5C_ALL_DONE" >> "$OUT"

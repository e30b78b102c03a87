#!/bin/bash
# r5f: consolidated round-5 TPU queue (replaces r5d+r5e after the
# patch-embed pallas compile HUNG the relay compile service for 25+ min
# in kernel-check c — that config now runs LAST so a hang can't starve
# the rest).  Order: (1) headline A/B of the round-5 kernels, every tag
# states ALL knobs; (2) attn-BACKWARD kernel check + timing; (3) semseg
# train-step A/B xla vs pallas backward; (4) DINO 800x1216 post-fix full
# step + profiles.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5f.log}
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

note "A/B: BM3; offset-shift; BM3+offset-shift (PEpallas deferred)"
env "${R5_ENV[@]}" timeout 5400 python dev/ablate_full.py --each \
  "@IR_ADS_SWIN_BIASMASK=3@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=conv;@IR_ADS_SWIN_BIASMASK=0@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=shift;@IR_ADS_SWIN_BIASMASK=3@IR_ADS_PATCH_EMBED=xla@IR_ADS_DSCF_OFFSET=shift" \
  >> "$OUT" 2>&1

note "attn bwd kernel check + timing"
timeout 2400 python dev/probe_r5_kernels.py d >> "$OUT" 2>&1

note "train step A/B: ATTN_BWD=xla"
IR_ADS_ATTN_BWD=xla timeout 4200 python dev/probe_profile_train.py \
  /tmp/tt_xla >> "$OUT" 2>&1

note "train step A/B: ATTN_BWD=pallas"
IR_ADS_ATTN_BWD=pallas timeout 4200 python dev/probe_profile_train.py \
  /tmp/tt_pallas >> "$OUT" 2>&1

note "DINO full train step 800x1216 (mask fix + remat-save)"
timeout 3600 python dev/probe_dino_train_ladder.py full \
  > dev/logs/r5f_dino_full.json 2>> "$OUT"
echo "full: $(cat dev/logs/r5f_dino_full.json)" >> "$OUT"

note "DINO train profile (post-fix itemization)"
timeout 3600 python dev/probe_profile_dino_train.py full /tmp/dino_tt2 \
  > dev/logs/r5f_dino_profile.log 2>&1

note "DINO forward profile 800x1216"
timeout 5400 python dev/probe_profile_dino_fwd.py /tmp/dino_fwd_tr \
  > dev/logs/r5f_dino_fwd.log 2>&1

note "A/B: PEpallas (hang-risk config, isolated last)"
env "${R5_ENV[@]}" timeout 3600 python dev/ablate_full.py --each \
  "@IR_ADS_SWIN_BIASMASK=0@IR_ADS_PATCH_EMBED=pallas@IR_ADS_DSCF_OFFSET=conv" \
  >> "$OUT" 2>&1

echo "R5F_ALL_DONE" >> "$OUT"

#!/bin/bash
# Round-4 sequential TPU queue (one job at a time; the relay degrades and
# timings lie under concurrent load — see memory + verify skill notes).
# Usage: bash dev/run_r4_queue.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_queue.log}
: >> "$OUT"

note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

R5_ENV=(
  IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6
  IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla
  IR_ADS_FFN=fused
  IR_ADS_SWIN_PACKED=1
  IR_ADS_DSCF_PACKED=1,1,1,0
)

note "stage-2 VPU fixes A/B: osel-fold normalize (FUSEDNORM=2) + folded bias+mask slab at stages 2-3"
env "${R5_ENV[@]}" timeout 5400 python dev/ablate_full.py --each \
  "@IR_ADS_V6_FUSEDNORM=0@IR_ADS_SWIN_BIASMASK=0;@IR_ADS_V6_FUSEDNORM=2;@IR_ADS_V6_FUSEDNORM=2@IR_ADS_SWIN_BIASMASK=1;@IR_ADS_V6_FUSEDNORM=0@IR_ADS_SWIN_BIASMASK=1;@IR_ADS_V6_FUSEDNORM=2@IR_ADS_SWIN_BIASMASK=0" \
  >> "$OUT" 2>&1

note "msdeform_forms (XLA itemization + pallas kernel)"
timeout 4800 python dev/probe_msdeform_forms.py all >> "$OUT" 2>&1

note "dino fwd+train (scan enc+dec, pallas msdeform)"
timeout 5400 python dev/probe_swinl_dino.py dino >> "$OUT" 2>&1

note "train throughput bs4 480x640 r5 (VERDICT r3 item 4)"
env "${R5_ENV[@]}" timeout 4800 python tools/benchmark.py \
  --task train --cfg configs/nyu_rgbd.yaml --iters 12 --batch 4 >> "$OUT" 2>&1

note "cache-miss probe run A (fresh process)"
timeout 2400 python dev/probe_cache_miss.py A >> "$OUT" 2>&1
note "cache-miss probe run B (should hit the on-disk cache)"
timeout 2400 python dev/probe_cache_miss.py B >> "$OUT" 2>&1

note "v6 itemize stage3"
timeout 5400 python dev/probe_v6_itemize.py stage3 >> "$OUT" 2>&1

note "dscf rpe itemize (VERDICT r3 item 5)"
timeout 5400 python dev/probe_rpe_itemize.py all >> "$OUT" 2>&1

note "QUEUE DONE"

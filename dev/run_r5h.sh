#!/bin/bash
# r5h: bisect the 800x1216 DINO full-step TPU-worker crash (r5f: "TPU
# worker process crashed or restarted ... kernel fault").  The last known
# good full-step run (dev/logs/r5_fullprod.json, 3551.6 ms) predates
# commits beca86e/e522ffc, whose new paths are: the xla5 per-level
# msdeform backward (IR_ADS_MSDEFORM_BWD=level, now the default) and the
# patch-gather mask-point sampling (IR_ADS_MASK_SAMPLE=patch, now the
# default on TPU).  Toggle each off in turn; "plain" = the r4 blanket
# per-corner backward, "xla" = the take-based mask sampling.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-dev/logs/r5h.log}
: > "$OUT"
note() { echo "=== $1 $(date +%H:%M:%S) ===" >> "$OUT"; }

run_full() {
  local tag=$1; shift
  note "full step: $tag"
  env "$@" timeout 2700 python dev/probe_dino_train_ladder.py full \
    > "dev/logs/r5h_${tag}.json" 2>> "$OUT"
  echo "${tag}: $(cat dev/logs/r5h_${tag}.json)" >> "$OUT"
}

run_full both_off IR_ADS_MSDEFORM_BWD=plain IR_ADS_MASK_SAMPLE=xla
run_full level_only IR_ADS_MSDEFORM_BWD=level IR_ADS_MASK_SAMPLE=xla
run_full patch_only IR_ADS_MSDEFORM_BWD=plain IR_ADS_MASK_SAMPLE=patch

echo "R5H_ALL_DONE" >> "$OUT"

#!/bin/bash
# Follow-up TPU queue: compile-cache probe (exact repeat), int8, dual-batch,
# and real-TPU kernel numerics.  -> appends to /tmp/ablate_sweep2.jsonl
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/ablate_sweep2.jsonl}
: > "$OUT"
run() { # run <label> <dscf_impl> [extra ablate_full args...]
  local label="$1" impl="$2"; shift 2
  local line
  line=$(IR_ADS_SWIN_ATTN=pallas IR_ADS_DSCF_ATTN="$impl" timeout 2400 \
    python dev/ablate_full.py "$@" 2>/dev/null | tail -1)
  echo "{\"label\": \"$label\", $(echo "$line" | sed 's/^{//')" >> "$OUT"
  echo "done $label: $line"
}
run baseline pallas3
run baseline_repeat pallas3
run nodscf pallas3 --ablate dscf
run mpg_rerun pallas3 --ablate mpg
run int8 pallas3 --env IR_ADS_INT8=1
run dual pallas3 --dual
run rpe pallas3 --ablate dscf_rpe
timeout 1200 python dev/check_dscf_numerics.py 2>&1 | tail -3
echo SWEEP2 DONE

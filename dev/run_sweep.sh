#!/bin/bash
# Sequential whole-model ablation sweep on the TPU -> /tmp/ablate_sweep.jsonl
# Each line: config tag + ablate tag + forward_ms.
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/ablate_sweep.jsonl}
: > "$OUT"
run() { # run <dscf_impl> <ablate_tags>
  local impl="$1" ab="$2"
  local line
  line=$(IR_ADS_SWIN_ATTN=pallas IR_ADS_DSCF_ATTN="$impl" timeout 2400 \
    python dev/ablate_full.py --ablate "$ab" 2>/dev/null | tail -1)
  echo "{\"dscf\": \"$impl\", $(echo "$line" | sed 's/^{//')" >> "$OUT"
  echo "done dscf=$impl ablate='$ab': $line"
}
run xla ""
run xla dscf
run pallas3 mpg
run pallas3 head
run pallas3 dscf_sample
run pallas3 blocks128
run pallas3 blocks256
run pallas3 blocks512
run pallas3 blocks1024
echo SWEEP DONE

#!/bin/bash
# Round-4 queue I: per-fusion device profile of the CURRENT bench config
# (r5 kernels + FLAT feed, 69.46 ms B=8) — waits for queue H (the DINO
# ladder brackets) to release the TPU first.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4i.log}
: > "$OUT"

# wait for queue H (poll the marker, not a pid — survives restarts)
for _ in $(seq 1 720); do
  grep -q R4H_ALL_DONE /tmp/r4h.log 2>/dev/null && break
  sleep 10
done

echo "=== per-fusion profile, r5+FLAT $(date +%H:%M:%S) ===" >> "$OUT"
IR_ADS_SWIN_ATTN=pallas4,pallas4,pallas6,pallas6 \
IR_ADS_DSCF_ATTN=pallas3,pallas3,pallas3,xla \
IR_ADS_FFN=fused IR_ADS_SWIN_PACKED=1 IR_ADS_DSCF_PACKED=1,1,1,0 \
IR_ADS_FLAT_INPUT=1 \
timeout 5400 python dev/probe_profile_forward.py /tmp/fwd_trace_r4 >> "$OUT" 2>&1

echo "R4I_ALL_DONE" >> "$OUT"

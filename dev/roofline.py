#!/usr/bin/env python
"""Analytic FLOP/byte roofline for the headline bench workload.

Computes per-component matmul FLOPs and principal HBM traffic for the
dual-stream Swin-B CMNeXt forward at 480x640 (the bench's per-program
batch: BATCH frames x2 for the flip ensemble), then combines with measured
in-context ablation deltas (/tmp/ablate_sweep.jsonl, dev/run_sweep.sh) to
produce the bound-vs-measured table VERDICT r1 item 1c asked for.

Machine model (measured, not datasheet): this v5e chip sustains
~208 TFLOP/s on a bare bf16 4096^2 matmul chain and ~417 TOP/s on
s8xs8->s32 (dev/probe_int8_rate.py; an earlier 91 TF/s reading was a
relay artifact); HBM ~810 GB/s.  Bounds below use those sustained
numbers — "within 1.5x of bound" means vs achievable, not marketing
peak.  Caveat: the model's K dims (512-2048) are far below 4096, so
per-matmul achievable is somewhat lower than the 208 headline.
"""

import json
import os
import sys

B = 8               # images per forward (4 frames x flip)
H, W = 480, 640
EMBED = 128
DEPTHS = (2, 2, 18, 2)
HEADS = (4, 8, 16, 32)
WS = 12
MLP = 4
NCLS = 40
SUSTAINED_BF16 = 208e12
SUSTAINED_INT8 = 417e12
HBM = 810e9


def ceil_to(v, m):
    return (v + m - 1) // m * m


def stage_dims():
    out = []
    h, w = H // 4, W // 4
    for i, d in enumerate(DEPTHS):
        c = EMBED * 2**i
        out.append((h, w, c, d, HEADS[i]))
        h, w = (h + 1) // 2, (w + 1) // 2
    return out


def swin_block_flops(h, w, c, heads):
    hp, wp = ceil_to(h, WS), ceil_to(w, WS)
    hw = hp * wp
    n = WS * WS
    qkv = 2 * hw * c * 3 * c
    proj = 2 * hw * c * c
    ffn = 2 * 2 * hw * c * MLP * c
    attn = 2 * 2 * hw * n * c  # scores + PV
    return qkv + proj + ffn + attn


def dscf_flops(h, w, c, g, n_pts=300):
    gc = 128
    m = 2 * n_pts
    bg = g  # per image
    # sampling: 6 grid_sample_matmul calls (x/y/q x two fields), W then H
    sample = 6 * bg * (2 * n_pts * w * h * gc + 2 * n_pts * h * gc)
    # rpe: per (field point, head-of-group): (S1,S2)@(S2,W) + (H,S1)@(S1,W)
    s1, s2 = 119, 159
    hg = 2
    rpe = bg * hg * m * 2 * (w * s2 * s1 + h * s1 * w)
    # attention: scores + PV
    attn = bg * hg * 2 * 2 * (h * w) * m * (gc // hg)
    # projections: fuse_q 3x3 conv + 4 1x1 convs on (h, w) / (m)
    proj = 2 * h * w * (2 * c) * c * 9 + 3 * 2 * h * w * c * c
    return dict(sample=sample, rpe=rpe, attn=attn, proj=proj)


def swin_block_bytes(h, w, c):
    """HBM traffic per block-pass, bf16: ~22 padded-map passes (partition /
    qkv / attention / reverse / proj live on the padded grid) + ~18
    unpadded passes (LNs, residuals, adapters, FFN in/out)."""
    hp, wp = ceil_to(h, WS), ceil_to(w, WS)
    return (22 * hp * wp * c + 18 * h * w * c) * 2


def dscf_bytes(h, w, c, g, n_pts=300):
    """DSCF traffic: the rows rpe bias is written once by the builder and
    read once by the attention kernel; plus ~14 map passes for the
    projections / fuse / combine."""
    hg = 2
    m = 2 * n_pts
    bias = 2 * g * hg * h * m * w * 2
    maps = 14 * h * w * c * 2
    return bias + maps


def component_rows():
    """(name, flops, bytes) per component — the analytic model behind both
    the printed table and the bench-detail roofline summary."""
    rows = []  # (name, flops, bytes)
    total = 0
    total_bytes = 0
    for i, (h, w, c, d, heads) in enumerate(stage_dims()):
        f = 2 * d * swin_block_flops(h, w, c, heads) * B  # x2 streams
        by = 2 * d * swin_block_bytes(h, w, c) * B
        rows.append((f"stage{i} ({d} blk x2 streams, c={c})", f, by))
        total += f
        total_bytes += by
    groups = (1, 2, 4, 8)
    for i, (h, w, c, d, heads) in enumerate(stage_dims()):
        parts = dscf_flops(h, w, c, groups[i])
        f = sum(parts.values()) * B
        by = dscf_bytes(h, w, c, groups[i]) * B
        rows.append(
            (
                f"DSCF L{i} (sample {parts['sample']*B/1e9:.0f}G "
                f"rpe {parts['rpe']*B/1e9:.0f}G attn {parts['attn']*B/1e9:.0f}G "
                f"proj {parts['proj']*B/1e9:.0f}G)",
                f,
                by,
            )
        )
        total += f
        total_bytes += by
    # patch embeds: 4x4x3 -> 128, two streams
    f = 2 * 2 * (H // 4) * (W // 4) * 128 * 4 * 4 * 3 * B
    rows.append(("patch embed x2", f, f // 10))
    total += f
    total_bytes += f // 10
    # head (folded form, segformer.py): per-level composed (C_i, 512)
    # matmuls at native resolution + 1/4-res class conv — the naive
    # concat+fuse (~40 GFLOP/img) is algebraically eliminated
    hd = 0
    hb = 0
    for i, (h, w, c, d, _) in enumerate(stage_dims()):
        hd += 2 * h * w * c * 512
        hb += 2 * h * w * (c + 512) * 2
    h0, w0 = H // 4, W // 4
    hd += 2 * h0 * w0 * 512 * NCLS
    hb += h0 * w0 * (512 + NCLS) * 2
    rows.append(("SegFormer fused head (folded)", hd * B, hb * B))
    total += hd * B
    total_bytes += hb * B
    return rows, total, total_bytes


def summary():
    """Compact roofline dict for the bench-detail output (VERDICT r1 item
    1c).  Bounds in ms for the B=8 forward; ``bound`` uses max(MXU, HBM)
    with the caveat that the HBM column models the UNFUSED map-pass count —
    for stages running the fused v4/v6 kernels the MXU column is the honest
    floor (activations stay in VMEM)."""
    rows, total, total_bytes = component_rows()
    out = {}
    floor_mxu = 0.0
    for name, f, by in rows:
        key = name.split(" (")[0].replace(" ", "_")
        mx = 1e3 * f / SUSTAINED_BF16
        out[key] = {
            "gflop": round(f / 1e9, 1),
            "mxu_ms": round(mx, 2),
            "hbm_ms_unfused": round(1e3 * by / HBM, 2),
        }
        floor_mxu += mx
    out["_total"] = {
        "gflop": round(total / 1e9, 1),
        "mxu_floor_ms": round(floor_mxu, 1),
        "sustained_bf16_tflops": 208,
        "note": "measured in-context: dev/ablate_full.py sweeps",
    }
    return out


def main():
    rows, total, total_bytes = component_rows()
    print(f"workload: {B} images {H}x{W} (4 frames x flip)")
    print(
        f"{'component':58s} {'GFLOP':>8s} {'mxu ms':>7s} "
        f"{'hbm ms':>7s} {'bound':>7s}"
    )
    floor = 0.0
    for name, f, by in rows:
        mx = 1e3 * f / SUSTAINED_BF16
        hm = 1e3 * by / HBM
        floor += max(mx, hm)
        print(f"{name:58s} {f/1e9:8.1f} {mx:7.2f} {hm:7.2f} {max(mx, hm):7.2f}")
    mx = 1e3 * total / SUSTAINED_BF16
    hm = 1e3 * total_bytes / HBM
    print(f"{'TOTAL (per-component bounds summed)':58s} {total/1e9:8.1f} "
          f"{mx:7.2f} {hm:7.2f} {floor:7.2f}")
    print(
        f"bf16 floor {floor:.1f} ms -> {1e3*4/floor:.0f} fps ceiling; "
        f"int8-MXU floor ~{max(1e3*total/SUSTAINED_INT8, hm):.1f} ms"
    )

    sweep = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ablate_sweep.jsonl"
    if os.path.exists(sweep):
        print(f"\nmeasured in-context deltas ({sweep}):")
        base = None
        for line in open(sweep):
            try:
                r = json.loads(line)
            except ValueError:
                continue  # truncated line from a timed-out run
            tag = r.get("ablate", "")
            if r.get("dscf") == "xla" and not tag:
                base = r["forward_ms"]
                print(f"  baseline (xla dscf): {base:.1f} ms")
            elif tag:
                print(f"  -{tag}: {r['forward_ms']:.1f} ms")


if __name__ == "__main__":
    main()

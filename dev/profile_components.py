#!/usr/bin/env python
"""Component-level on-chip timing for the Swin-B RGB-D forward.

Times each building block of the bench.py workload (480x640, batch 8 =
4 frames x flip, bf16, eval mode) in isolation with chained-dependency
timing (see bench.py notes: block_until_ready lies through the relay), so
we can see where the 1/fps actually goes before optimizing.

Usage:  python dev/profile_components.py            # real TPU
        JAX_PLATFORMS=cpu python dev/profile_components.py --iters 2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.models.backbones.swin import (
    DeformMPGBlock,
    MPGBlock,
    ShiftWindowMSA,
    SwinStage,
)
from ir_ads_tpu.models.heads.segformer import SegFormerHead
from ir_ads_tpu.ops.layers import Mlp, PatchEmbed, PatchMerging

B = 8  # bench batch: 4 frames x flip ensembling
H, W = 480, 640
DT = jnp.bfloat16

# (token_h, token_w, dim, heads, depth)
STAGES = [
    (120, 160, 128, 4, 2),
    (60, 80, 256, 8, 2),
    (30, 40, 512, 16, 18),
    (15, 20, 1024, 32, 2),
]
TINY_STAGES = [  # CPU smoke: same code paths, 1/4 scale, shallow
    (24, 32, 32, 2, 2),
    (12, 16, 64, 4, 2),
    (6, 8, 128, 8, 4),
    (3, 4, 256, 16, 2),
]
DSCF = [  # (stride, groups, heads) per out level (swin.py dscf_* defaults)
    (8, 1, 2),
    (4, 2, 4),
    (2, 4, 8),
    (1, 8, 16),
]


def timeit(fn, args, iters, label, results):
    """In-program scan timing with two-point slope: run the component N and
    3N times inside ONE jitted scan (iterations chained through the carry so
    the device serializes them), and report (t_3N - t_N) / 2N — the fixed
    dispatch/fetch/relay overhead cancels exactly."""
    from functools import partial

    x0, rest = args[0], tuple(args[1:])

    @partial(jax.jit, static_argnums=(0,))
    def many(n, x0, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            s = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(out))
            return x0 + (s * 0.0).astype(x0.dtype), ()
        carry, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(carry)

    def run(n):
        t0 = time.time()
        _ = float(many(n, x0, *rest))
        return time.time() - t0

    _ = run(iters)       # compile n=iters
    _ = float(many(3 * iters, x0, *rest))  # compile n=3*iters
    t1, t3 = run(iters), run(3 * iters)
    dt = (t3 - t1) / (2 * iters) * 1000.0
    results[label] = round(dt, 2)
    print(f"{label:42s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages-only", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    args = ap.parse_args()
    iters = args.iters
    global B, H, W, STAGES
    if args.tiny:
        B, (H, W), STAGES = 2, (96, 128), TINY_STAGES
    key = jax.random.PRNGKey(0)
    results = {}

    print(f"device: {jax.devices()[0]}  batch {B}  {H}x{W}  bf16")

    # patch embed (x2 streams)
    img = jax.random.normal(key, (B, H, W, 3), DT)
    pe = PatchEmbed(STAGES[0][2], 4, dtype=DT)
    v = jax.jit(lambda: pe.init({"params": key}, img))()
    timeit(lambda i, v: pe.apply(v, i), (img, v), iters, "patch_embed (x1 stream)", results)

    total_stages = 0.0
    for si, (th, tw, c, heads, depth) in enumerate(STAGES):
        x = jax.random.normal(key, (B, th, tw, c), DT)
        stage = SwinStage(
            dim=c, depth=depth, num_heads=heads, ffn_dim=4 * c,
            window_size=12, drop_rate=0.0,
            drop_path_rates=tuple([0.0] * depth),
            downsample=si < 3, dtype=DT,
        )
        v = jax.jit(lambda stage=stage, x=x: stage.init({"params": key}, x, "rgb"))()
        dt = timeit(
            lambda x, v, stage=stage: stage.apply(v, x, "rgb", True)[0],
            (x, v), iters, f"stage{si + 1} ({th}x{tw} c{c} d{depth}) x1 stream",
            results,
        )
        total_stages += 2 * dt  # two streams

        if not args.stages_only:
            # subdivide: attention vs FFN at this stage's shapes
            attn = ShiftWindowMSA(dim=c, num_heads=heads, window_size=12,
                                  shift_size=0, dtype=DT)
            va = jax.jit(lambda attn=attn, x=x: attn.init({"params": key}, x))()
            timeit(lambda x, v, attn=attn: attn.apply(v, x),
                   (x, va), iters, f"  s{si+1} W-MSA  x1", results)
            attn_s = ShiftWindowMSA(dim=c, num_heads=heads, window_size=12,
                                    shift_size=6, dtype=DT)
            vs = jax.jit(lambda a=attn_s, x=x: a.init({"params": key}, x))()
            timeit(lambda x, v, a=attn_s: a.apply(v, x),
                   (x, vs), iters, f"  s{si+1} SW-MSA x1", results)
            mlp = Mlp(hidden_dim=4 * c, dtype=DT)
            xt = x.reshape(B, th * tw, c)
            vm = jax.jit(lambda mlp=mlp, xt=xt: mlp.init({"params": key}, xt))()
            timeit(lambda x, v, mlp=mlp: mlp.apply(v, x),
                   (xt, vm), iters, f"  s{si+1} FFN    x1", results)

    # MPG per stage
    for si, (th, tw, c, _, _) in enumerate(STAGES):
        xr = jax.random.normal(key, (B // 2, th, tw, c), DT)
        mpg = MPGBlock(ratio=0.125, dtype=DT)
        v = jax.jit(lambda mpg=mpg, xr=xr: mpg.init({"params": key}, xr, xr))()
        timeit(lambda x, v, mpg=mpg: mpg.apply(v, x, x),
               (xr, v), iters, f"mpg stage{si + 1}", results)

    # DSCF fusion per out level
    for si, (th, tw, c, _, _) in enumerate(STAGES):
        stride, groups, heads = DSCF[si]
        xr = jax.random.normal(key, (B, th, tw, c), DT)
        d = DeformMPGBlock(dim=c, stride=stride, n_groups=groups,
                           n_heads=heads, level=si, ratio=0.125, dtype=DT)
        v = jax.jit(lambda d=d, xr=xr: d.init({"params": key}, xr, xr, False))()
        timeit(lambda x, v, d=d: d.apply(v, x, x, False),
               (xr, v), iters, f"dscf level{si + 1}", results)

    # decode heads (3x SegFormer over the fused/rgb/dte pyramids)
    feats = [
        jax.random.normal(key, (B, th, tw, c), DT)
        for (th, tw, c, _, _) in STAGES
    ]
    head = SegFormerHead(embed_dim=768, num_classes=40, dtype=DT)
    vh = jax.jit(lambda: head.init({"params": key}, feats))()
    timeit(lambda f0, rest, v: head.apply(v, [f0] + list(rest)),
           (feats[0], feats[1:], vh), iters, "segformer head x1", results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

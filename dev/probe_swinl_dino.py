#!/usr/bin/env python
"""Swin-L eval + DINO-R50 2000-query TPU timings (VERDICT r2 item 8).

Two BENCH-detail numbers nothing had measured on TPU yet:
  * CMNeXt Swin-L (embed 192, remat+scan deep stages — where train-mode
    regressions hide; reference ships it first-class, base.py:46-51)
    B=4 480x640 bf16 eval forward.
  * DINO-R50 4-scale 2000-query (reference vCLR recipe,
    deformable_train_voc_eval_nonvoc.py:97-158) forward + train step —
    first TPU timing of MSDeformAttn's XLA-gather sampling at production
    query counts.

One process, chained-scan timing (relay-honest).  Usage:
  python dev/probe_swinl_dino.py [swinl|dino|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

# production kernel config (bench r5)
os.environ.setdefault("IR_ADS_SWIN_ATTN", "pallas4,pallas4,pallas6,pallas6")
os.environ.setdefault("IR_ADS_DSCF_ATTN", "pallas3,pallas3,pallas3,xla")
os.environ.setdefault("IR_ADS_FFN", "fused")
os.environ.setdefault("IR_ADS_SWIN_PACKED", "1")
os.environ.setdefault("IR_ADS_DSCF_PACKED", "1,1,1,0")


def _slope(fn, variables, *arrs, n_long=10):
    """Two-point chained-scan slope in seconds per iteration.

    Every ARRAY input is threaded through the scan carry — a loop-invariant
    input lets XLA hoist everything that depends only on it out of the loop
    (the round-2 "mpg saves 33 ms" artifact).  ``variables`` stays
    invariant (weights are genuinely reused across iterations)."""
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, v, *a):
        def body(carry, _):
            cur = carry[:-1]
            out = fn(v, *cur)
            z = out * 0.0
            new = tuple(x + z.astype(x.dtype) for x in a)
            return (*new, out), None

        carry, _ = jax.lax.scan(
            body, (*a, jnp.float32(0)), None, length=n
        )
        return carry[-1]

    float(many(2, variables, *arrs))
    float(many(n_long, variables, *arrs))
    t0 = time.time()
    float(many(2, variables, *arrs))
    ts = time.time() - t0
    t0 = time.time()
    float(many(n_long, variables, *arrs))
    tl = time.time() - t0
    return (tl - ts) / (n_long - 2)


def probe_swinl():
    from ir_ads_tpu.models.cmnext import CMNeXt

    model = CMNeXt(
        backbone="SwinTransformer-L", num_classes=40, dtype=jnp.bfloat16,
        mmst_mask=False,
    )
    b = 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    rgb = jax.random.normal(k1, (b, 480, 640, 3), jnp.bfloat16)
    dte = jax.random.normal(k2, (b, 480, 640, 3), jnp.bfloat16)
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    def fwd(v, r, d):
        return jnp.sum(model.apply(v, r, d, train=False)[0]).astype(
            jnp.float32
        )

    t0 = time.time()
    dt = _slope(fwd, variables, rgb, dte)
    print(json.dumps({
        "metric": "swinl_eval_forward",
        "batch": b, "ms": round(1000 * dt, 1),
        "img_s": round(b / dt, 1),
        "init_s": round(init_s, 1),
        "wall_incl_compile_s": round(time.time() - t0, 1),
    }), flush=True)


def probe_dino(train=True):
    from ir_ads_tpu.detection.dino import DINODetector

    m = DINODetector(
        num_classes=20, num_queries=2000, embed_dim=256,
        num_encoder_layers=6, num_decoder_layers=6, num_levels=4,
        backbone_arch="resnet50", dn_number=100, max_gt=60,
        # round-4: scan enc+dec stacks (6x smaller HLO) + Pallas
        # deformable-gather sampling (IR_ADS_MSDEFORM auto->pallas on TPU)
        scan_layers=os.environ.get("IR_ADS_DINO_SCAN", "1") == "1",
    )
    b, h, w = 1, 800, 1216
    imgs = jnp.ones((b, h, w, 3), jnp.float32) * 127.0
    labels = jnp.zeros((b, 60), jnp.int32)
    boxes = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (b, 60, 4)) * 0.4 + 0.3,
        0.1, 0.9,
    )
    valid = jnp.zeros((b, 60), bool).at[:, :10].set(True)

    t0 = time.time()
    variables = jax.jit(
        lambda: m.init(
            {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
            imgs, labels, boxes, valid, train=True,
        )
    )()
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    def fwd(v, x):
        out = m.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x, train=False,
        )
        return jnp.sum(out["pred_logits"]).astype(jnp.float32)

    t0 = time.time()
    dt = _slope(fwd, variables, imgs, n_long=6)
    print(json.dumps({
        "metric": "dino_r50_2000q_eval_forward",
        "image": [h, w], "ms": round(1000 * dt, 1),
        "init_s": round(init_s, 1),
        "wall_incl_compile_s": round(time.time() - t0, 1),
    }), flush=True)

    if not train:
        return
    from ir_ads_tpu.detection.train import (
        DetTrainState,
        detection_optimizer,
        make_detection_train_step,
    )

    tx = detection_optimizer(variables["params"], total_steps=1000)
    state = DetTrainState.create(
        m.apply, variables["params"], variables["batch_stats"], tx
    )
    step = jax.jit(make_detection_train_step(use_teacher=False))
    masks = jnp.zeros((b, 60, 16, 16), jnp.float32)
    batch = (imgs, imgs, labels, boxes, valid, masks)

    # chained-scan over train steps (state threads the dependency)
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, st):
        def body(carry, i):
            st = carry
            st, met = step(st, batch, jax.random.fold_in(
                jax.random.PRNGKey(7), i))
            return st, met["loss"]

        st, losses = jax.lax.scan(body, st, jnp.arange(n))
        return losses[-1]

    t0 = time.time()
    float(many(2, state))
    float(many(6, state))
    t0 = time.time()
    float(many(2, state))
    ts = time.time() - t0
    t0 = time.time()
    float(many(6, state))
    tl = time.time() - t0
    print(json.dumps({
        "metric": "dino_r50_2000q_train_step",
        "image": [h, w], "ms": round(1000 * (tl - ts) / 4, 1),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "swinl"):
        probe_swinl()
    if which in ("all", "dino"):
        try:
            probe_dino()
        except Exception as e:
            print(json.dumps({
                "metric": "dino_r50_2000q",
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)
    print("SWINL_DINO_DONE", flush=True)

#!/usr/bin/env python
"""Isolate what kills the remote compile helper in the DINO train step.

Round-4: the xla4 deformable sampling brought the DINO-R50 2000-query
forward to 248.7 ms, but the TRAIN step still crashes the relay's
tpu_compile_helper (HTTP 500) — the class of failure that cannot be
debugged from the error string.  This ladder compiles ONE train-step
variant per process (a helper crash kills the process) so the failing
ingredient can be bracketed:

  full      production step (expected: crash — the baseline claim)
  sumloss   grad of sum(outputs) — model fwd+bwd WITHOUT the criterion
  msd_xla   full criterion, IR_ADS_MSDEFORM=xla (plain gather sampling)
  nomask    full criterion minus the point-sampled mask loss
  nocdn     dn_number=0 — CDN denoising branch + dn_criterion out
  vmapcrit  full criterion with the per-layer loop vmapped (one HLO
            criterion instance instead of 7) — the candidate fix
  small     full at 512x640 (program-size scaling control)

Usage: python dev/probe_dino_train_ladder.py <variant>
Prints one JSON line; exit 0 even on failure (the error is the datum).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "sumloss"

if VARIANT == "msd_xla":
    os.environ["IR_ADS_MSDEFORM"] = "xla"
if VARIANT == "vmapcrit":
    os.environ["IR_ADS_DET_CRIT"] = "vmap"

import functools
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()


def main():
    from ir_ads_tpu.detection.dino import DINODetector
    from ir_ads_tpu.detection.train import (
        DetTrainState,
        detection_optimizer,
        make_detection_train_step,
    )

    small = VARIANT == "small" or os.environ.get("DINO_LADDER_SMALL") == "1"
    h, w = (512, 640) if small else (800, 1216)
    dn = 0 if VARIANT == "nocdn" else 100
    m = DINODetector(
        num_classes=20, num_queries=2000, embed_dim=256,
        num_encoder_layers=6, num_decoder_layers=6, num_levels=4,
        backbone_arch="resnet50", dn_number=dn, max_gt=60,
        scan_layers=True,
        # remat the scanned layers: the backward then recomputes inside
        # the scan body instead of unrolling saved activations — smaller
        # HLO and less compile-helper memory (DINO_LADDER_REMAT=0 to A/B)
        use_remat=os.environ.get("DINO_LADDER_REMAT", "1") == "1",
    )
    b = 1
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

    if VARIANT == "sumloss":
        # model fwd+bwd only: is the criterion or the model the killer?
        def loss_fn(params, k):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, labels, boxes, valid,
                train=True, rngs={"cdn": k}, mutable=["batch_stats"],
            )
            masks_term = (
                jnp.sum(out["pred_mask_embeds"].astype(jnp.float32) ** 2)
                + jnp.sum(out["seg_feat"].astype(jnp.float32) ** 2)
                if "pred_mask_embeds" in out
                else jnp.sum(out["pred_masks"].astype(jnp.float32) ** 2)
            )
            return (
                jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2)
                + jnp.sum(out["pred_boxes"].astype(jnp.float32))
                + masks_term
            )

        grad = jax.jit(jax.grad(loss_fn))
        t0 = time.time()
        g = grad(variables["params"], jax.random.PRNGKey(2))
        jax.block_until_ready(g)
        compile_s = time.time() - t0
        t0 = time.time()
        g = grad(variables["params"], jax.random.PRNGKey(3))
        jax.block_until_ready(g)
        print(json.dumps({
            "variant": VARIANT, "ok": True, "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "step2_s": round(time.time() - t0, 2),
        }), flush=True)
        return

    tx = detection_optimizer(variables["params"], total_steps=1000)
    state = DetTrainState.create(
        m.apply, variables["params"], variables["batch_stats"], tx
    )
    step = jax.jit(make_detection_train_step(use_teacher=False))
    masks = (
        None if VARIANT == "nomask"
        else jnp.zeros((b, 60, 16, 16), jnp.float32)
    )
    batch = (imgs, imgs, labels, boxes, valid, masks)

    t0 = time.time()
    state2, met = step(state, batch, jax.random.PRNGKey(7))
    loss0 = float(met["loss"])  # scalar fetch: block_until_ready lies
    compile_s = time.time() - t0
    # honest steady-state: chain 3 steps, fetch the last loss (the state
    # data dependency serializes the steps; one ~25 ms RTT amortized over 3)
    t0 = time.time()
    s = state2
    for k in (8, 9, 10):
        s, met = step(s, batch, jax.random.PRNGKey(k))
    loss = float(met["loss"])
    step_ms = (time.time() - t0) / 3.0 * 1000.0
    print(json.dumps({
        "variant": VARIANT, "ok": True, "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 1),
        "loss": loss, "loss_first": loss0,
    }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the error IS the datum
        print(json.dumps({
            "variant": VARIANT, "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:8000]}",
        }), flush=True)

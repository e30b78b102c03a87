#!/usr/bin/env python
"""Per-fusion TPU profile of the DINO full train step (VERDICT r5 item 2).

Round 4 got the full step (R50 + 2000q + CDN + criterion + AdamW) to
compile and run; round 5 opens it up: where do the milliseconds go —
the xla4 deformable-sampling backward scatter, the remat recompute of the
scanned enc/dec stacks, the 2000-query criterion, or the ResNet backward?

Runs the REAL jitted detection train step (make_detection_train_step,
ir_ads_tpu/detection/train.py) at the requested resolution under
jax.profiler and prints the aggregated XLA-op table via dev/xplane_parse.

Usage: python dev/probe_profile_dino_train.py [small|full] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dino_train_trace"

from ir_ads_tpu.detection.dino import DINODetector  # noqa: E402
from ir_ads_tpu.detection.train import (  # noqa: E402
    DetTrainState,
    detection_optimizer,
    make_detection_train_step,
)

h, w = (512, 640) if VARIANT == "small" else (800, 1216)
b = 1
m = DINODetector(
    num_classes=20, num_queries=2000, embed_dim=256,
    num_encoder_layers=6, num_decoder_layers=6, num_levels=4,
    backbone_arch="resnet50", dn_number=100, max_gt=60,
    scan_layers=True, use_remat=True,
)
imgs = jnp.ones((b, h, w, 3), jnp.float32) * 127.0
labels = jnp.zeros((b, 60), jnp.int32)
boxes = jnp.clip(
    jax.random.uniform(jax.random.PRNGKey(0), (b, 60, 4)) * 0.4 + 0.3,
    0.1, 0.9,
)
valid = jnp.zeros((b, 60), bool).at[:, :10].set(True)
masks = jnp.zeros((b, 60, 16, 16), jnp.float32)
batch = (imgs, imgs, labels, boxes, valid, masks)

t0 = time.time()
variables = jax.jit(
    lambda: m.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
        imgs, labels, boxes, valid, train=True,
    )
)()
jax.block_until_ready(variables)
print(f"init {time.time() - t0:.1f}s", flush=True)

tx = detection_optimizer(variables["params"], total_steps=1000)
state = DetTrainState.create(
    m.apply, variables["params"], variables["batch_stats"], tx
)
step = jax.jit(make_detection_train_step(use_teacher=False))

t0 = time.time()
state, met = step(state, batch, jax.random.PRNGKey(7))
float(met["loss"])
print(f"compile {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
s = state
for k in (8, 9, 10):
    s, met = step(s, batch, jax.random.PRNGKey(k))
loss = float(met["loss"])
step_ms = (time.time() - t0) / 3.0 * 1000.0
print(json.dumps({
    "variant": VARIANT, "step_ms": round(step_ms, 1), "loss": round(loss, 2),
}), flush=True)

with jax.profiler.trace(out_dir):
    s, met = step(s, batch, jax.random.PRNGKey(11))
    float(met["loss"])

xp = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))
print("trace:", xp, flush=True)
if xp:
    from dev.xplane_parse import summarize

    summarize(xp[-1], top_n=100)
print("DINOTRAINPROFILE_DONE", flush=True)

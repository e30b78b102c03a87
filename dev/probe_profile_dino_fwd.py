#!/usr/bin/env python
"""Per-fusion TPU profile of the DINO-R50 2000q forward at 800x1216
(VERDICT r5 item 3: reach or retire the 200 ms target).

The xla4 sampling formulation's floor can be derived from the measured
gather-engine rates (dev/probe_msd2.py); this profile shows where the
measured 248.7 ms actually goes so the gap to that floor is attributable
(sampling gathers vs one-hot dots vs attention/FFN MXU vs glue).

Usage: python dev/probe_profile_dino_fwd.py [out_dir]
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

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dino_fwd_trace"

from ir_ads_tpu.detection.dino import DINODetector  # noqa: E402

h, w = 800, 1216
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

t0 = time.time()
variables = jax.jit(
    lambda: m.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
        imgs, labels, boxes, valid, train=True,
    )
)()
jax.block_until_ready(variables)
print(f"init {time.time() - t0:.1f}s", flush=True)


@jax.jit
def fwd(v, x):
    return m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        x, train=False,
    )


t0 = time.time()
out = fwd(variables, imgs)
s0 = float(jnp.sum(out["pred_logits"]))
print(f"compile {time.time() - t0:.1f}s checksum {s0:.3f}", flush=True)

# honest chained timing: fetch a scalar per iter (28 ms RTT amortized)
t0 = time.time()
for _ in range(5):
    out = fwd(variables, imgs)
    s = float(jnp.sum(out["pred_logits"]))
fwd_ms = (time.time() - t0) / 5.0 * 1000.0 - 28.0
print(json.dumps({"fwd_ms_approx": round(fwd_ms, 1)}), flush=True)

with jax.profiler.trace(out_dir):
    out = fwd(variables, imgs)
    float(jnp.sum(out["pred_logits"]))

xp = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))
print("trace:", xp, flush=True)
if xp:
    from dev.xplane_parse import summarize

    summarize(xp[-1], top_n=100)
print("DINOFWDPROFILE_DONE", flush=True)

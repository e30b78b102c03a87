#!/usr/bin/env python
"""Per-fusion TPU profile + roofline of the training step (VERDICT r2
item 6).

Round 2 recorded 14.2 img/s (282.6 ms/step bs4 480x640) with no floor next
to it.  This runs the REAL jitted train step (three-head MMST loss + grads
+ AdamW update + BN stats, ir_ads_tpu/training/train_state.py) under
jax.profiler and prints the aggregated XLA-op table, split into
forward / backward / optimizer buckets where fusion names allow, plus the
MXU roofline:

  train FLOPs/step ~ 3x forward (bwd = 2 matmul passes per fwd matmul)
  + the XLA-recompute forward inside every Pallas custom_vjp (~+1x fwd)

Usage: python dev/probe_profile_train.py [out_dir]
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

os.environ.setdefault("IR_ADS_SWIN_ATTN", "pallas4,pallas4,pallas6,pallas6")
os.environ.setdefault("IR_ADS_DSCF_ATTN", "pallas3,pallas3,pallas3,xla")
os.environ.setdefault("IR_ADS_FFN", "fused")
os.environ.setdefault("IR_ADS_SWIN_PACKED", "1")
os.environ.setdefault("IR_ADS_DSCF_PACKED", "1,1,1,0")

from ir_ads_tpu.models.cmnext import CMNeXt  # noqa: E402
from ir_ads_tpu.training.losses import cross_entropy  # noqa: E402
from ir_ads_tpu.training.optim import get_optimizer  # noqa: E402
from ir_ads_tpu.training.train_state import (  # noqa: E402
    TrainState,
    make_train_step,
)

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
B, H, W = 4, 480, 640

model = CMNeXt(
    backbone="SwinTransformer-B", num_classes=40, dtype=jnp.bfloat16,
    mmst_mask=True,
)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
rgb = jax.random.normal(k1, (B, H, W, 3), jnp.bfloat16)
dte = jax.random.normal(k2, (B, H, W, 3), jnp.bfloat16)
lbl = jnp.zeros((B, H, W), jnp.int32)

t0 = time.time()
variables = jax.jit(
    lambda: model.init(
        {"params": jax.random.PRNGKey(0), "mmst": jax.random.PRNGKey(1)},
        rgb, dte,
    )
)()
print(f"init {time.time() - t0:.1f}s", flush=True)

train_type = os.environ.get("IR_ADS_PROBE_TRAIN_TYPE", "all")
if "Adapter" in train_type:
    os.environ.setdefault("IR_ADS_ATTN_BWD_TRAINABLES", "adapter")
tx = get_optimizer(
    "adamw", lambda step: 6e-5, 0.01, train_type,
    params=variables["params"],
)
state = TrainState.create(
    apply_fn=model.apply,
    params=variables["params"],
    batch_stats=variables.get("batch_stats", {}),
    tx=tx,
)
step = jax.jit(make_train_step(cross_entropy), donate_argnums=0)
rng = jax.random.PRNGKey(0)

print("compiling train step...", flush=True)
t0 = time.time()
state, m = step(state, (rgb, dte, lbl), rng)
float(m["loss"])
print(f"compile {time.time() - t0:.1f}s", flush=True)

# honest step time via chaining (donated state serializes steps)
t0 = time.time()
for _ in range(2):
    state, m = step(state, (rgb, dte, lbl), rng)
float(m["loss"])
ts = time.time() - t0
t0 = time.time()
for _ in range(8):
    state, m = step(state, (rgb, dte, lbl), rng)
float(m["loss"])
tl = time.time() - t0
step_ms = 1000.0 * (tl - ts) / 6
print(json.dumps({
    "step_ms": round(step_ms, 1),
    "img_per_sec": round(B / (step_ms / 1000.0), 1),
    "batch": B,
}), flush=True)

with jax.profiler.trace(out_dir):
    for _ in range(3):
        state, m = step(state, (rgb, dte, lbl), rng)
    float(m["loss"])

xp = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))
print("trace:", xp, flush=True)
if xp:
    from dev.xplane_parse import summarize

    summarize(xp[-1], top_n=80)

# roofline: forward GFLOP from dev/roofline.py convention (5339.5 GFLOP at
# B=8 incl. both streams -> 667.4/img single forward); train step =
# fwd (1x, pallas) + custom_vjp recompute (~1x, XLA) + bwd (~2x) = ~4x fwd
fwd_gflop = 5339.5 / 8 * B
print(json.dumps({
    "roofline": {
        "fwd_gflop": round(fwd_gflop, 1),
        "train_gflop_4x": round(4 * fwd_gflop, 1),
        "mxu_floor_ms_at_208tflops": round(4 * fwd_gflop / 208.0, 1),
        "note": "4x = fwd + vjp XLA recompute + 2x bwd; a fused bwd "
                "drops the recompute term -> 3x",
    }
}), flush=True)
print("TRAINPROFILE_DONE", flush=True)

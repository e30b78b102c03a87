#!/usr/bin/env python
"""Headline benchmark: Swin-B RGB-D sliding-window eval frames/sec/chip.

Matches BASELINE.md's driver-set target metric: CMNeXt with the dual-stream
Swin-B backbone (embed 128, depths (2,2,18,2), window 12), 480x640 RGB-D
frames, tiled sliding-window inference with 1/3 overlap + horizontal-flip
ensembling (reference val_mm.py:30-62 semantics), bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": r}

vs_baseline: the reference publishes no hard numbers (BASELINE.json
"published" is empty).  We use an estimated A100 PyTorch fp16 throughput for
the same workload as denominator: ~880 GFLOPs/frame (2 tiles x flip x
~220 GFLOPs dual-stream forward) at an assumed 50 TFLOP/s effective
=> ~57 fps.  vs_baseline = measured_fps / 57.0.  Revisit when a measured
baseline exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.evaluation.semseg_eval import make_sliding_window_fn
from ir_ads_tpu.models.cmnext import CMNeXt

EST_A100_PYTORCH_FPS = 57.0

IMAGE = (480, 640)
TILE = (480, 640)  # reference sliding_predict uses tile = image size (val_mm.py:33)
NUM_CLASSES = 40  # NYU
BATCH = 4  # throughput batching across frames (metric is frames/sec/chip)
WARMUP = 2
ITERS = 10


def main():
    model = CMNeXt(
        backbone="SwinTransformer-B",
        num_classes=NUM_CLASSES,
        dtype=jnp.bfloat16,
        mmst_mask=False,
    )
    rgb = jnp.zeros((BATCH, *IMAGE, 3), jnp.bfloat16)
    dte = jnp.zeros((BATCH, *IMAGE, 3), jnp.bfloat16)
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    init_s = time.time() - t0

    @jax.jit
    def _forward(v, r, d):
        y, _, _ = model.apply(v, r, d, train=False)
        return y

    def forward(r, d):
        # params as runtime args: a closure would embed ~180M params as
        # HLO constants (hundreds of MB -> remote-compile 413)
        return _forward(variables, r, d)

    predict = make_sliding_window_fn(
        forward, IMAGE, TILE, NUM_CLASSES, overlap=1.0 / 3.0, flip=True,
        fuse=False,  # compile-service payload cap: keep programs small
    )

    key = jax.random.PRNGKey(1)
    rgb = jax.random.normal(key, (BATCH, *IMAGE, 3), jnp.bfloat16)
    dte = jax.random.normal(key, (BATCH, *IMAGE, 3), jnp.bfloat16)

    t0 = time.time()
    out = predict(rgb, dte)
    checksum = float(jnp.sum(out))  # full device->host sync
    compile_s = time.time() - t0
    for _ in range(WARMUP - 1):
        float(jnp.sum(predict(rgb, dte)))

    # honest timing without per-iteration host RTT: chain iterations through
    # a data dependency (device must finish frame i before starting i+1) and
    # fetch once at the end.  (block_until_ready alone can report early
    # through the remote-execution relay; per-iter fetches add ~20ms RTT.)
    @jax.jit
    def chain_input(rgb, out):
        return rgb + (jnp.sum(out) * 0.0).astype(rgb.dtype)

    t0 = time.time()
    r = rgb
    for _ in range(ITERS):
        out = predict(r, dte)
        r = chain_input(rgb, out)
    final = float(jnp.sum(out))
    dt = time.time() - t0
    assert abs(final - checksum) < abs(checksum) * 1e-2 + 1e-3
    fps = ITERS * BATCH / dt

    print(
        json.dumps(
            {
                "metric": "swinb_rgbd_sliding_window_eval_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / EST_A100_PYTORCH_FPS, 3),
                "detail": {
                    "image": IMAGE,
                    "tile": TILE,
                    "flip": True,
                    "overlap": 0.333,
                    "dtype": "bfloat16",
                    "init_s": round(init_s, 1),
                    "compile_s": round(compile_s, 1),
                    "p50_latency_ms": round(1000.0 * dt / ITERS, 1),
                    "device": str(jax.devices()[0]),
                    "baseline_note": "est. A100 PyTorch fp16 ~57 fps (no published number)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()

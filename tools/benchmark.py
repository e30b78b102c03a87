#!/usr/bin/env python
"""Train / eval / dataloader throughput benchmarking
(reference tools/benchmark.py:35-192).

Usage:
  python tools/benchmark.py --task eval  --cfg configs/nyu_rgbd.yaml
  python tools/benchmark.py --task train --cfg configs/synthetic_smoke.yaml
  python tools/benchmark.py --task data  --cfg configs/synthetic_smoke.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def bench_eval(cfg, iters, batch):
    from ir_ads_tpu.models.cmnext import CMNeXt

    h, w = cfg["EVAL"]["IMAGE_SIZE"]
    model = CMNeXt(
        backbone=cfg["MODEL"]["BACKBONE"],
        num_classes=40,
        dtype=jnp.bfloat16 if jax.devices()[0].platform == "tpu" else None,
        backbone_kwargs=cfg["MODEL"].get("BACKBONE_KWARGS"),
        mmst_mask=False,
    )
    rgb = jnp.zeros((batch, h, w, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, rgb)
    )()

    @jax.jit
    def _fwd(v, r, d):
        return model.apply(v, r, d, train=False)[0]

    def fwd(r, d):
        return _fwd(variables, r, d)

    fwd(rgb, rgb).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = fwd(rgb, rgb)
    out.block_until_ready()
    dt = time.time() - t0
    return {"task": "eval", "img_per_sec": iters * batch / dt,
            "latency_ms": 1000 * dt / iters, "rss_mb": _rss_mb()}


def bench_train(cfg, iters, batch):
    from train_mm import build_model_and_state
    from ir_ads_tpu.training.losses import cross_entropy
    from ir_ads_tpu.training.train_state import make_train_step

    h, w = cfg["TRAIN"]["IMAGE_SIZE"]
    cfg["_iters_per_epoch"] = 100
    model, state = build_model_and_state(cfg, 40, sample_hw=(h, w))
    step = jax.jit(make_train_step(cross_entropy), donate_argnums=0)
    rgb = jnp.zeros((batch, h, w, 3))
    lbl = jnp.zeros((batch, h, w), jnp.int32)
    rng = jax.random.PRNGKey(0)
    state, m = step(state, (rgb, rgb, lbl), rng)
    # fetch a scalar, not block_until_ready: through remote-execution
    # relays block_until_ready returns early, a scalar fetch is honest
    # (see bench.py timing notes); steps serialize via the donated state.
    float(m["loss"])
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, (rgb, rgb, lbl), rng)
    float(m["loss"])
    dt = time.time() - t0
    return {"task": "train", "img_per_sec": iters * batch / dt,
            "step_ms": 1000 * dt / iters, "rss_mb": _rss_mb()}


def bench_data(cfg, iters, batch):
    from ir_ads_tpu.data.augmentations import get_train_augmentation
    from ir_ads_tpu.data.datasets import get_dataset
    from ir_ads_tpu.data.loader import DataLoader

    ds_cls = get_dataset(cfg["DATASET"]["NAME"])
    tf = get_train_augmentation(cfg["TRAIN"]["IMAGE_SIZE"], 255)
    ds = ds_cls(cfg["DATASET"]["ROOT"], "train", tf, cfg["DATASET"]["MODALS"])
    loader = DataLoader(ds, batch, shuffle=True)
    n = 0
    t0 = time.time()
    for b in loader:
        n += 1
        if n >= iters:
            break
    dt = time.time() - t0
    return {"task": "data", "img_per_sec": n * batch / dt, "rss_mb": _rss_mb()}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["train", "eval", "data"], default="eval")
    p.add_argument("--cfg", default="configs/synthetic_smoke.yaml")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()
    from ir_ads_tpu.utils.config import load_config

    cfg = load_config(args.cfg)
    fn = {"train": bench_train, "eval": bench_eval, "data": bench_data}[args.task]
    print(json.dumps(fn(cfg, args.iters, args.batch)))

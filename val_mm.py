#!/usr/bin/env python
"""Segmentation evaluation driver (reference val_mm.py).

Usage: python val_mm.py --cfg configs/nyu_rgbd.yaml

Supports single-scale, multi-scale+flip (MSF), and tiled sliding-window
evaluation; all compute paths are jit-compiled with on-device accumulation
(see ir_ads_tpu/evaluation/semseg_eval.py).

Divergence from the reference, documented: val_mm.py:80-82 reports acc and
f1 as copies of IoU; here the real pixel-accuracy and F1 are computed.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import jax.numpy as jnp

from ir_ads_tpu.data.augmentations import get_val_augmentation
from ir_ads_tpu.data.datasets import get_dataset
from ir_ads_tpu.data.loader import DataLoader
from ir_ads_tpu.evaluation.semseg_eval import (
    evaluate,
    make_forward_fn,
    make_sliding_window_fn,
)
from ir_ads_tpu.models import build_model
from ir_ads_tpu.training.metrics import Metrics
from ir_ads_tpu.utils.checkpoint import load_weights
from ir_ads_tpu.utils.config import load_config
from ir_ads_tpu.utils.logging import get_logger
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

import jax


def build_eval_model(cfg, num_classes, image_hw):
    model_cfg = cfg["MODEL"]
    dtype = jnp.bfloat16 if cfg["TRAIN"].get("AMP", True) else None
    model = build_model(
        model_cfg.get("NAME", "CMNeXt"),
        model_cfg["BACKBONE"],
        num_classes=num_classes,
        dtype=dtype,
        backbone_kwargs=model_cfg.get("BACKBONE_KWARGS"),
    )
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, dummy)

    model_path = cfg["EVAL"]["MODEL_PATH"]
    if model_path:
        wpath = (
            os.path.join(model_path, "weights.msgpack")
            if os.path.isdir(model_path)
            else model_path
        )
        variables = load_weights(
            wpath,
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )
    return model, variables


def main(cfg):
    logger = get_logger()
    eval_cfg, dataset_cfg = cfg["EVAL"], cfg["DATASET"]
    transform = get_val_augmentation(eval_cfg["IMAGE_SIZE"])
    ds_cls = get_dataset(dataset_cfg["NAME"])
    dataset = ds_cls(dataset_cfg["ROOT"], "val", transform, dataset_cfg["MODALS"])
    cache_dir = eval_cfg.get("CACHE_DIR", "")
    device_norm = bool(cache_dir)
    if cache_dir:
        # decode-once raw cache + on-device Normalize: turns the host work
        # per image into a memcpy + uint8 batch assembly (data/cache.py)
        from ir_ads_tpu.data.augmentations import (
            get_val_augmentation_device_norm,
        )
        from ir_ads_tpu.data.cache import RawCache

        src = dataset
        dataset = RawCache.build(
            src,
            cache_dir,
            transform=get_val_augmentation_device_norm(eval_cfg["IMAGE_SIZE"]),
        )
        dataset.n_classes = src.n_classes
        dataset.CLASSES = src.CLASSES
        dataset.modals = src.modals
    model, variables = build_eval_model(
        cfg, dataset.n_classes, eval_cfg["IMAGE_SIZE"]
    )
    forward = make_forward_fn(model, variables, device_norm=device_norm)

    loader = DataLoader(
        dataset, eval_cfg["BATCH_SIZE"], shuffle=False, drop_last=False
    )
    metrics = Metrics(dataset.n_classes, dataset_cfg["IGNORE_LABEL"])

    sliding_cfg = eval_cfg.get("SLIDING", {}) or {}
    spatial_cfg = eval_cfg.get("SPATIAL_SHARD", {}) or {}
    t0 = time.time()
    if spatial_cfg.get("ENABLE", False):
        # huge-image mode: H-shard one monolithic forward over the mesh's
        # `space` axis with halo exchange (SURVEY.md §5; parallel/halo.py)
        from ir_ads_tpu.evaluation.semseg_eval import (
            make_spatial_sharded_forward,
        )
        from ir_ads_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, space=len(jax.devices()))
        halo = int(spatial_cfg.get("HALO", 96))

        def packed_forward(packed):
            rgb, dte = jnp.split(packed, 2, axis=-1)
            if device_norm:
                from ir_ads_tpu.data.augmentations import device_normalize

                rgb = device_normalize(rgb, "img")
                dte = device_normalize(dte, "depth")
            y, _, _ = model.apply(variables, rgb, dte, train=False)
            return y

        predict = make_spatial_sharded_forward(packed_forward, mesh, halo)
        for b in loader:
            rgb, dte, lbl = b[0], b[1 % (len(b) - 1)], b[-1]
            logits = predict(jnp.asarray(rgb), jnp.asarray(dte))
            metrics.update(jnp.argmax(logits, -1), jnp.asarray(lbl))
    elif sliding_cfg.get("ENABLE", False):
        th, tw = sliding_cfg.get("TILE_SIZE", eval_cfg["IMAGE_SIZE"])
        predict = make_sliding_window_fn(
            forward,
            tuple(eval_cfg["IMAGE_SIZE"]),
            (th, tw),
            dataset.n_classes,
            overlap=sliding_cfg.get("OVERLAP", 1.0 / 3.0),
            flip=sliding_cfg.get("FLIP", True),
        )
        for b in loader:
            rgb, dte, lbl = b[0], b[1 % (len(b) - 1)], b[-1]
            logits = predict(jnp.asarray(rgb), jnp.asarray(dte))
            metrics.update(jnp.argmax(logits, -1), jnp.asarray(lbl))
    else:
        def batches():
            for b in loader:
                yield (
                    jnp.asarray(b[0]),
                    jnp.asarray(b[1 % (len(b) - 1)]),
                    jnp.asarray(b[-1]),
                )

        evaluate(
            forward,
            batches(),
            metrics,
            msf=eval_cfg["MSF"]["ENABLE"],
            scales=tuple(eval_cfg["MSF"]["SCALES"]),
            flip=eval_cfg["MSF"]["FLIP"],
        )
    elapsed = time.time() - t0

    ious, miou = metrics.compute_iou()
    f1, mf1 = metrics.compute_f1()
    acc, macc = metrics.compute_pixel_acc()
    logger.info(f"mIoU {miou}  mF1 {mf1}  mAcc {macc}")
    logger.info(f"eval of {len(dataset)} images in {elapsed:.1f}s "
                f"({len(dataset) / elapsed:.2f} img/s)")

    # per-class report (reference writes eval_<timestamp>.txt)
    if eval_cfg.get("MODEL_PATH"):
        out_dir = os.path.dirname(eval_cfg["MODEL_PATH"]) or "."
        report = os.path.join(out_dir, f"eval_{time.strftime('%Y%m%d_%H%M%S')}.txt")
        with open(report, "w") as f:
            f.write(f"{'Class':24s} {'IoU':>8s} {'F1':>8s} {'Acc':>8s}\n")
            for name, i, ff, a in zip(dataset.CLASSES, ious, f1, acc):
                f.write(f"{name:24s} {i * 100:8.2f} {ff:8.2f} {a:8.2f}\n")
            f.write(f"{'Mean':24s} {miou:8.2f} {mf1:8.2f} {macc:8.2f}\n")
        logger.info(f"report written to {report}")
    return miou


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default="configs/nyu_rgbd.yaml")
    args = parser.parse_args()
    main(load_config(args.cfg))

#!/usr/bin/env python
"""Input-pipeline throughput with REAL image decode (VERDICT r1 item 9).

Generates an NYU-format tree of 480x640 JPEG (rgb) + PNG (depth/label)
files in a temp dir, then measures DataLoader img/s through the full
train-augmentation pipeline for thread and process workers.

The eval device rate is ~40-150 fps; the loader must sustain >= 2x that.

Usage: python dev/bench_data_real.py [--n 64] [--batch 4] [--workers 8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import tempfile
import time

import numpy as np
from PIL import Image


def _photo_like(rng, h, w):
    """Image with photographic statistics (smooth regions + edges + mild
    noise).  Uniform NOISE images are the JPEG worst case — they decode
    ~6x slower than real photos (measured: 13.5 ms noise vs 2.7 ms smooth
    at 480x640 q90) and made the round-2 loader numbers unrepresentative
    of any real dataset."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            127 + 100 * np.sin(yy / 97.0 + rng.rand() * 6),
            127 + 100 * np.sin(xx / 83.0 + rng.rand() * 6),
            127 + 100 * np.sin((xx + yy) / 121.0 + rng.rand() * 6),
        ],
        axis=-1,
    )
    for _ in range(12):  # rectangles = object edges
        y0, x0 = rng.randint(0, h - 40), rng.randint(0, w - 40)
        dy, dx = rng.randint(20, h - y0), rng.randint(20, w - x0)
        base[y0 : y0 + dy, x0 : x0 + dx] += rng.uniform(-60, 60, 3)
    base += rng.randn(h, w, 3) * 4  # sensor noise
    return np.clip(base, 0, 255).astype(np.uint8)


def _label_like(rng, h, w, n_cls=40):
    """Piecewise-constant label map (real annotation statistics)."""
    lbl = np.full((h, w), rng.randint(0, n_cls), np.uint8)
    for _ in range(18):
        y0, x0 = rng.randint(0, h - 20), rng.randint(0, w - 20)
        dy, dx = rng.randint(10, h - y0), rng.randint(10, w - x0)
        lbl[y0 : y0 + dy, x0 : x0 + dx] = rng.randint(0, n_cls)
    return lbl


def make_dataset_tree(root: str, n: int, hw=(480, 640)) -> None:
    h, w = hw
    rng = np.random.RandomState(0)
    os.makedirs(f"{root}/RGB", exist_ok=True)
    os.makedirs(f"{root}/HHA", exist_ok=True)
    os.makedirs(f"{root}/Label", exist_ok=True)
    for split in ("train.txt", "val.txt"):
        with open(f"{root}/{split}", "w") as f:
            for i in range(n):
                f.write(f"{i:06d}\n")
    for i in range(n):
        Image.fromarray(_photo_like(rng, h, w)).save(
            f"{root}/RGB/{i:06d}.jpg", quality=90
        )
        Image.fromarray(_photo_like(rng, h, w)).save(
            f"{root}/HHA/{i:06d}.jpg", quality=90
        )
        Image.fromarray(_label_like(rng, h, w)).save(
            f"{root}/Label/{i:06d}.png"
        )


def measure(
    root: str, batch: int, workers: int, mode: str, epochs: int = 2,
    pipeline: str = "train",
):
    """img/s through the full pipeline.  pipeline='train' = random-crop/
    jitter/blur float augs; 'eval' = the uncached eval feed (decode +
    val-resize, uint8 out, normalization on device — what actually feeds
    the headline sliding-window eval when the raw cache is cold)."""
    from ir_ads_tpu.data.augmentations import (
        get_train_augmentation,
        get_val_augmentation_device_norm,
    )
    from ir_ads_tpu.data.datasets import get_dataset
    from ir_ads_tpu.data.loader import DataLoader

    ds_cls = get_dataset("NYU")
    if pipeline == "eval":
        tf = get_val_augmentation_device_norm((480, 640))
    else:
        tf = get_train_augmentation((480, 640), 255)
    ds = ds_cls(root, "train", tf, ["img", "depth"])
    loader = DataLoader(
        ds, batch, shuffle=True, num_workers=workers, workers=mode
    )
    # warmup epoch (page cache, pool spawn), then timed epoch
    n_img = 0
    for e in range(epochs):
        loader.set_epoch(e)
        if e == epochs - 1:
            t0 = time.time()
        for b in loader:
            if e == epochs - 1:
                n_img += b[0].shape[0]
    dt = time.time() - t0
    return n_img / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    with tempfile.TemporaryDirectory() as root:
        make_dataset_tree(root, args.n)
        out = {}
        for mode in ("thread", "process"):
            out[f"{mode}_img_per_sec"] = round(
                measure(root, args.batch, args.workers, mode), 1
            )
        print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Single-image / folder inference driver (reference infer_mm.py).

Usage: python infer_mm.py --cfg configs/nyu_rgbd.yaml --input path/to/img.jpg

Loads modalities following the dataset's path conventions, runs the fused
head, and writes a palette-colored prediction (optionally overlaid on the
RGB input).  The reference's latent tuple-vs-tensor postprocess bug
(infer_mm.py:51 expects one logit tensor from a 3-tuple model) is fixed:
we explicitly take the fused head.
"""

from __future__ import annotations

import argparse
import math
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ir_ads_tpu.data.augmentations import IMAGENET_MEAN, IMAGENET_STD, resize_sample
from ir_ads_tpu.data.datasets import get_dataset
from ir_ads_tpu.utils.config import load_config
from ir_ads_tpu.utils.logging import get_logger
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()
from val_mm import build_eval_model


def default_palette(n: int) -> np.ndarray:
    rng = np.random.RandomState(42)
    pal = rng.randint(0, 255, (n, 3))
    pal[0] = [0, 0, 0]
    return pal


class SemSeg:
    """Inference wrapper (reference infer_mm.py SemSeg class)."""

    def __init__(self, cfg):
        self.cfg = cfg
        ds_cls = get_dataset(cfg["DATASET"]["NAME"])
        self.classes = ds_cls.CLASSES
        self.palette = (
            ds_cls.PALETTE
            if ds_cls.PALETTE is not None
            else default_palette(len(ds_cls.CLASSES))
        )
        self.size = cfg["EVAL"]["IMAGE_SIZE"]
        self.modals = cfg["DATASET"]["MODALS"]
        self.model, self.variables = build_eval_model(
            cfg, len(self.classes), self.size
        )

        @jax.jit
        def forward(variables, rgb, dte):
            y, _, _ = self.model.apply(variables, rgb, dte, train=False)
            return y

        # params as jit args (closure would embed them as HLO constants)
        self._forward = lambda rgb, dte: forward(self.variables, rgb, dte)

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        scale = self.size[0] / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        nh, nw = math.ceil(nh / 32) * 32, math.ceil(nw / 32) * 32
        img = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
        ).astype(np.float32)
        return img

    def predict(self, rgb_path: str, dte_path=None, overlay: bool = False):
        rgb = np.asarray(Image.open(rgb_path).convert("RGB"))
        orig_hw = rgb.shape[:2]
        dte = (
            np.asarray(Image.open(dte_path).convert("RGB"))
            if dte_path
            else rgb.copy()
        )
        x_rgb = self.preprocess(rgb)
        x_dte = self.preprocess(dte)
        x_rgb = (x_rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        x_dte = x_dte / 255.0
        t0 = time.time()
        logits = self._forward(x_rgb[None], x_dte[None])
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        dt = time.time() - t0
        pred_img = Image.fromarray(pred.astype(np.uint8)).resize(
            (orig_hw[1], orig_hw[0]), Image.NEAREST
        )
        pred = np.asarray(pred_img)
        color = np.asarray(self.palette)[pred].astype(np.uint8)
        if overlay:
            color = (0.4 * rgb + 0.6 * color).astype(np.uint8)
        return color, dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default="configs/nyu_rgbd.yaml")
    parser.add_argument("--input", type=str, required=True, help="image or dir")
    parser.add_argument("--dte", type=str, default=None, help="second modality image/dir")
    parser.add_argument("--output", type=str, default="output/inference")
    parser.add_argument("--overlay", action="store_true")
    args = parser.parse_args()
    logger = get_logger()

    cfg = load_config(args.cfg)
    seg = SemSeg(cfg)
    os.makedirs(args.output, exist_ok=True)

    inputs = (
        sorted(Path(args.input).glob("*"))
        if os.path.isdir(args.input)
        else [Path(args.input)]
    )
    for p in inputs:
        if p.suffix.lower() not in {".jpg", ".jpeg", ".png", ".bmp"}:
            continue
        dte_path = None
        if args.dte:
            dte_path = (
                os.path.join(args.dte, p.name) if os.path.isdir(args.dte) else args.dte
            )
        color, dt = seg.predict(str(p), dte_path, args.overlay)
        out = Path(args.output) / f"{p.stem}_pred.png"
        Image.fromarray(color).save(out)
        logger.info(f"{p.name}: {dt * 1000:.1f} ms -> {out}")


if __name__ == "__main__":
    main()

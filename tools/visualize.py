#!/usr/bin/env python
"""Dataset / prediction visualization (reference tools/visualize_data.py,
visualize_json_results.py, semseg/utils/visualize.py).

Usage:
  python tools/visualize.py --cfg configs/nyu_rgbd.yaml --mode data  --n 8
  python tools/visualize.py --cfg ... --mode pred --ckpt out/best --n 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def default_palette(n: int) -> np.ndarray:
    rng = np.random.RandomState(42)
    pal = rng.randint(0, 255, (max(n, 1), 3))
    pal[0] = [0, 0, 0]
    return pal


def colorize(label: np.ndarray, palette: np.ndarray, ignore=255) -> np.ndarray:
    safe = np.where(label == ignore, 0, label)
    out = palette[safe].astype(np.uint8)
    out[label == ignore] = 255
    return out


def denorm(img: np.ndarray) -> np.ndarray:
    mean = np.asarray([0.485, 0.456, 0.406])
    std = np.asarray([0.229, 0.224, 0.225])
    return np.clip((img * std + mean) * 255, 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--mode", choices=["data", "pred"], default="data")
    p.add_argument("--ckpt", default="")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--out", default="output/vis")
    args = p.parse_args()

    from ir_ads_tpu.data.augmentations import get_val_augmentation
    from ir_ads_tpu.data.datasets import get_dataset
    from ir_ads_tpu.utils.config import load_config

    cfg = load_config(args.cfg)
    ds_cls = get_dataset(cfg["DATASET"]["NAME"])
    tf = get_val_augmentation(cfg["EVAL"]["IMAGE_SIZE"])
    ds = ds_cls(cfg["DATASET"]["ROOT"], "val", tf, cfg["DATASET"]["MODALS"])
    palette = (
        np.asarray(ds.PALETTE)
        if ds.PALETTE is not None
        else default_palette(ds.n_classes)
    )
    os.makedirs(args.out, exist_ok=True)

    predict = None
    if args.mode == "pred":
        import jax
        import jax.numpy as jnp
        from val_mm import build_eval_model

        cfg["EVAL"]["MODEL_PATH"] = args.ckpt
        model, variables = build_eval_model(
            cfg, ds.n_classes, cfg["EVAL"]["IMAGE_SIZE"]
        )

        @jax.jit
        def predict(rgb, dte):
            y, _, _ = model.apply(variables, rgb, dte, train=False)
            return jnp.argmax(y, -1)

    for i in range(min(args.n, len(ds))):
        sample, label = ds[i]
        modal_imgs = [denorm(sample["img"])]
        for k, v in sample.items():
            if k != "img":
                modal_imgs.append(np.clip(v * 255, 0, 255).astype(np.uint8))
        panels = modal_imgs + [colorize(label, palette)]
        if predict is not None:
            import jax.numpy as jnp

            rgb = jnp.asarray(sample["img"][None], jnp.float32)
            dte_key = next(k for k in sample if k != "img")
            dte = jnp.asarray(sample[dte_key][None], jnp.float32)
            pred = np.asarray(predict(rgb, dte))[0]
            panels.append(colorize(pred, palette))
        strip = np.concatenate(panels, axis=1)
        Image.fromarray(strip).save(os.path.join(args.out, f"{i:04d}.png"))
    print(f"wrote {min(args.n, len(ds))} visualizations to {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Anomaly-dataset converters -> MVTec-AD directory layout.

One parametrized script replacing the reference's eight copies
(data/convert_{AITEX,SDD,elpv,optical,BrainMRI,HeadCT,MastCam,hyperkvasir}.py):
every converter reads a source-specific layout and writes

    <out>/<classname>/train/good/*.png
    <out>/<classname>/test/good/*.png
    <out>/<classname>/test/<defect_class>/*.png

Usage: python tools/convert_ad_datasets.py --dataset aitex \\
           --src /path/to/AITEX --out data/mvtec_style --train-rate 0.75

numpy + PIL only (the reference uses cv2/sklearn, neither guaranteed here).
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
from PIL import Image


def _save(img: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


def _split(items, train_rate: float, seed: int = 42):
    items = sorted(items)
    rng = random.Random(seed)
    rng.shuffle(items)
    k = int(len(items) * train_rate)
    return items[:k], items[k:]


def _load(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"))


def convert_aitex(src: str, out: str, train_rate: float) -> None:
    """AITEX fabric: 4096-wide strips tiled into 16 x 256 crops
    (reference convert_AITEX.py:11-30); defect crops classed by the 3-digit
    code in the filename."""
    defect_class = {
        "002": "Broken_end", "006": "Broken_yarn", "010": "Broken_pick",
        "016": "Weft_curling", "019": "Fuzzyball", "022": "Cut_selvage",
        "023": "Crease", "025": "Warp_ball", "027": "Knots",
        "029": "Contamination", "030": "Nep", "036": "Weft_crack",
    }
    cls = "aitex"
    normal = []
    normal_root = os.path.join(src, "NODefect_images")
    for d in sorted(os.listdir(normal_root)):
        for f in sorted(os.listdir(os.path.join(normal_root, d))):
            img = _load(os.path.join(normal_root, d, f))
            n_tiles = img.shape[1] // 256
            for i in range(n_tiles):
                normal.append((f"{d}_{os.path.splitext(f)[0]}_{i}",
                               img[:, i * 256 : (i + 1) * 256]))
    train, test = _split([n for n, _ in normal], train_rate)
    by_name = dict(normal)
    for name in train:
        _save(by_name[name], os.path.join(out, cls, "train", "good", name + ".png"))
    for name in test:
        _save(by_name[name], os.path.join(out, cls, "test", "good", name + ".png"))

    outlier_root = os.path.join(src, "Defect_images", "Defect_images")
    mask_root = os.path.join(src, "Mask_images", "Mask_images")
    for f in sorted(os.listdir(outlier_root)):
        name = os.path.splitext(f)[0]
        code = name.split("_")[1] if "_" in name else ""
        defect = defect_class.get(code, "defect")
        img = _load(os.path.join(outlier_root, f))
        mask_path = os.path.join(mask_root, name + "_mask.png")
        mask = (
            np.asarray(Image.open(mask_path).convert("L"))
            if os.path.exists(mask_path) else None
        )
        n_tiles = img.shape[1] // 256
        for i in range(n_tiles):
            tile = img[:, i * 256 : (i + 1) * 256]
            has_defect = (
                mask is None or mask[:, i * 256 : (i + 1) * 256].sum() > 0
            )
            dest = defect if has_defect else "good-from-defect-strip"
            if has_defect:
                _save(tile, os.path.join(out, cls, "test", dest, f"{name}_{i}.png"))


def convert_binary_folders(
    src: str, out: str, train_rate: float, classname: str,
    normal_dir: str, defect_dirs,
) -> None:
    """Generic converter for datasets laid out as class folders
    (SDD / elpv / optical / BrainMRI / HeadCT / MastCam / hyperkvasir)."""
    normals = [
        os.path.join(src, normal_dir, f)
        for f in sorted(os.listdir(os.path.join(src, normal_dir)))
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif"))
    ]
    train, test = _split(normals, train_rate)
    for p in train:
        _save(_load(p), os.path.join(out, classname, "train", "good",
                                     os.path.basename(p) + ".png"))
    for p in test:
        _save(_load(p), os.path.join(out, classname, "test", "good",
                                     os.path.basename(p) + ".png"))
    for d in defect_dirs:
        dd = os.path.join(src, d)
        if not os.path.isdir(dd):
            continue
        for f in sorted(os.listdir(dd)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif")):
                _save(_load(os.path.join(dd, f)),
                      os.path.join(out, classname, "test",
                                   d.replace("/", "_"), f + ".png"))


CONVERTERS = {
    "aitex": convert_aitex,
    "sdd": lambda s, o, r: convert_binary_folders(s, o, r, "SDD", "normal", ["defect"]),
    "elpv": lambda s, o, r: convert_binary_folders(s, o, r, "elpv", "normal", ["defect"]),
    "optical": lambda s, o, r: convert_binary_folders(s, o, r, "optical", "normal", ["defect"]),
    "brainmri": lambda s, o, r: convert_binary_folders(s, o, r, "BrainMRI", "no", ["yes"]),
    "headct": lambda s, o, r: convert_binary_folders(s, o, r, "HeadCT", "normal", ["hemorrhage"]),
    "mastcam": lambda s, o, r: convert_binary_folders(s, o, r, "MastCam", "typical", ["novel"]),
    "hyperkvasir": lambda s, o, r: convert_binary_folders(
        s, o, r, "hyperkvasir", "normal", ["abnormal"]),
}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=sorted(CONVERTERS))
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--train-rate", type=float, default=0.75)
    a = p.parse_args()
    CONVERTERS[a.dataset](a.src, a.out, a.train_rate)
    print(f"converted {a.dataset} -> {a.out}")

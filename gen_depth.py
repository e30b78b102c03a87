#!/usr/bin/env python
"""Depth-map generation for RGB datasets (reference gen_depth.py:1-24, which
pulls ZoeDepth via torch.hub and writes per-image .npy depth for COCO
val2017 — used to build the vCLR depth-view training data).

This environment has no network egress, so torch.hub is gated: pass a local
ZoeDepth checkpoint/hubdir if available, otherwise fall back to a
luminance-gradient proxy depth (clearly marked) so the depth-view pipeline
stays exercisable end-to-end.

Usage:
  python gen_depth.py --input imgs/ --output depth/ [--hub-dir ~/.cache/torch/hub]
  python gen_depth.py --input imgs/ --output depth/ --proxy   # no-model mode
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def proxy_depth(img: np.ndarray) -> np.ndarray:
    """Cheap monocular-depth stand-in: smoothed inverse luminance + vertical
    gradient prior (floors are near, sky is far).  NOT a real depth model —
    only to keep downstream plumbing (colormap views, HHA-ish encodings)
    runnable without network access."""
    gray = img.astype(np.float32).mean(-1) / 255.0
    h, w = gray.shape
    vert = np.linspace(1.0, 0.2, h)[:, None]
    d = (1.2 - gray) * vert
    # box blur
    k = max(h // 32, 1)
    pad = np.pad(d, k, mode="edge")
    c = np.cumsum(np.cumsum(pad, 0), 1)
    d = (
        c[2 * k :, 2 * k :] - c[: -2 * k, 2 * k :] - c[2 * k :, : -2 * k]
        + c[: -2 * k, : -2 * k]
    ) / float((2 * k) ** 2)
    return d[: h, : w].astype(np.float32)


def depth_to_cmap(depth: np.ndarray) -> np.ndarray:
    """Normalized depth -> 3-channel colormap PNG (reference
    gen_depthmap.ipynb writes colormapped PNGs for the depth view)."""
    d = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-6)
    r = np.clip(1.5 - np.abs(4 * d - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * d - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * d - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--hub-dir", default=None, help="local torch.hub cache with ZoeDepth")
    p.add_argument("--proxy", action="store_true", help="use the proxy depth")
    p.add_argument("--cmap", action="store_true", help="also write colormap PNGs")
    args = p.parse_args()

    model = None
    if not args.proxy:
        try:
            import torch

            if args.hub_dir:
                torch.hub.set_dir(args.hub_dir)
            model = torch.hub.load(
                "isl-org/ZoeDepth", "ZoeD_NK", pretrained=True
            )
            model.eval()
        except Exception as e:  # zero-egress environments land here
            raise SystemExit(
                f"ZoeDepth unavailable ({e}); re-run with --proxy or provide "
                "--hub-dir with a local checkout."
            )

    os.makedirs(args.output, exist_ok=True)
    if args.cmap:
        os.makedirs(args.output + "_cmap", exist_ok=True)
    for path in sorted(Path(args.input).glob("*")):
        if path.suffix.lower() not in {".jpg", ".jpeg", ".png"}:
            continue
        img = np.asarray(Image.open(path).convert("RGB"))
        if model is None:
            depth = proxy_depth(img)
        else:
            import torch

            with torch.no_grad():
                t = torch.from_numpy(img).permute(2, 0, 1)[None].float() / 255
                depth = model.infer(t)[0, 0].cpu().numpy()
        np.save(os.path.join(args.output, path.stem + ".npy"), depth)
        if args.cmap:
            Image.fromarray(depth_to_cmap(depth)).save(
                os.path.join(args.output + "_cmap", path.stem + ".png")
            )
    print(f"depth written to {args.output}")


if __name__ == "__main__":
    main()

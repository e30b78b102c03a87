#!/usr/bin/env python
"""Model export for deployment (reference export/ subpackage: caffe2 /
torchscript / onnx; SURVEY.md §2.4, plus the torchscript C++ deploy demo).

TPU-native deployment story: serialize the jitted forward with jax.export —
a self-contained StableHLO artifact loadable from any JAX (or PJRT C++)
runtime without the python model code.

Usage:
  python tools/export_model.py --cfg configs/nyu_rgbd.yaml \\
      --ckpt out/best --out model.stablehlo [--height 480 --width 640]

Round-trip check (deserialize + compare outputs) runs automatically.
"""

from __future__ import annotations

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--num-classes", type=int, default=40)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    from jax import export as jexport

    from ir_ads_tpu.utils.config import load_config
    from val_mm import build_eval_model

    cfg = load_config(args.cfg)
    if args.ckpt:
        cfg["EVAL"]["MODEL_PATH"] = args.ckpt
    h = args.height or cfg["EVAL"]["IMAGE_SIZE"][0]
    w = args.width or cfg["EVAL"]["IMAGE_SIZE"][1]
    model, variables = build_eval_model(cfg, args.num_classes, (h, w))

    def forward(rgb, dte):
        y, _, _ = model.apply(variables, rgb, dte, train=False)
        return y

    spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.float32)
    exported = jexport.export(jax.jit(forward))(spec, spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.2f} MB -> {args.out}")

    # round-trip verification
    restored = jexport.deserialize(blob)
    rgb = np.random.RandomState(0).randn(args.batch, h, w, 3).astype(np.float32)
    ref = forward(jnp.asarray(rgb), jnp.asarray(rgb))
    out = restored.call(jnp.asarray(rgb), jnp.asarray(rgb))
    err = float(jnp.abs(ref - out).max())
    print(f"round-trip max abs err: {err:.2e}")
    assert err < 1e-3


if __name__ == "__main__":
    main()

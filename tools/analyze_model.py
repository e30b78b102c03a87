#!/usr/bin/env python
"""Model analysis: parameters, FLOPs, per-submodule breakdown
(reference tools/analyze_model.py:31-131 + semseg cal_flops, fvcore-based).

FLOPs come from XLA's own cost analysis of the compiled forward — more
faithful than op-counting since it reflects what actually runs.

Usage: python tools/analyze_model.py --cfg configs/nyu_rgbd.yaml
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> dict:
    flat = jax.tree_util.tree_leaves_with_path(params)
    by_top = {}
    total = 0
    for path, x in flat:
        top = str(getattr(path[0], "key", path[0]))
        by_top[top] = by_top.get(top, 0) + x.size
        total += x.size
    return {"total": total, "by_module": by_top}


def xla_flops(fn, *args) -> float:
    """FLOPs of the compiled fn from XLA cost analysis (per invocation)."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", float("nan")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="configs/nyu_rgbd.yaml")
    p.add_argument("--num-classes", type=int, default=40)
    args = p.parse_args()

    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.utils.config import load_config

    cfg = load_config(args.cfg)
    h, w = cfg["EVAL"]["IMAGE_SIZE"]
    model = CMNeXt(
        backbone=cfg["MODEL"]["BACKBONE"],
        num_classes=args.num_classes,
        backbone_kwargs=cfg["MODEL"].get("BACKBONE_KWARGS"),
        mmst_mask=False,
    )
    rgb = jnp.zeros((1, h, w, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, rgb)

    stats = count_params(variables["params"])
    print(f"parameters: {stats['total'] / 1e6:.2f} M")
    for k, v in sorted(stats["by_module"].items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / 1e6:10.2f} M")

    flops = xla_flops(
        lambda r, d: model.apply(variables, r, d, train=False)[0], rgb, rgb
    )
    print(f"forward FLOPs @ {h}x{w}: {flops / 1e9:.1f} G")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Checkpoint conversion CLI (reference convert_pth.py, which bridges mmlab
.pth -> detectron2 .pkl; here: torch .pth <-> ir_ads_tpu msgpack).

Import (reference -> this framework):
  python convert_pth.py import --pth model.pth --out weights_dir/ \\
      [--pretrained-swin]   # raw upstream Swin ckpt w/ dual-stream surgery

Export (this framework -> reference-named torch state_dict):
  python convert_pth.py export --weights weights_dir/weights.msgpack --out model.pth
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def do_import(args):
    import torch

    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.utils.checkpoint import save_weights
    from ir_ads_tpu.utils.torch_import import (
        import_cmnext_state_dict,
        import_pretrained_swin,
    )

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    sd = {k: v.numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}

    model = CMNeXt(backbone=args.backbone, num_classes=args.num_classes)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, dummy)
    importer = import_pretrained_swin if args.pretrained_swin else import_cmnext_state_dict
    variables, warnings = importer(sd, variables)
    for w in warnings[:20]:
        print("warn:", w)
    if len(warnings) > 20:
        print(f"... {len(warnings) - 20} more warnings")
    os.makedirs(args.out, exist_ok=True)
    save_weights(
        os.path.join(args.out, "weights.msgpack"),
        variables["params"], variables["batch_stats"],
    )
    print(f"imported {len(sd)} tensors -> {args.out}/weights.msgpack")


def do_export(args):
    import torch

    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.utils.checkpoint import load_weights

    model = CMNeXt(backbone=args.backbone, num_classes=args.num_classes)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, dummy)
    variables = load_weights(
        args.weights,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    # flatten to reference-style dotted names (flax tree paths; layout left
    # in flax convention — consumers should use ir_ads_tpu.utils.torch_import
    # mappings for exact reference-module names)
    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        sd["params." + name] = torch.from_numpy(np.asarray(leaf))
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables["batch_stats"]):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        sd["batch_stats." + name] = torch.from_numpy(np.asarray(leaf))
    torch.save(sd, args.out)
    print(f"exported {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("import")
    pi.add_argument("--pth", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--backbone", default="SwinTransformer-B")
    pi.add_argument("--num-classes", type=int, default=40)
    pi.add_argument("--pretrained-swin", action="store_true")
    pe = sub.add_parser("export")
    pe.add_argument("--weights", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--backbone", default="SwinTransformer-B")
    pe.add_argument("--num-classes", type=int, default=40)
    args = p.parse_args()
    {"import": do_import, "export": do_export}[args.cmd](args)

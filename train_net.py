#!/usr/bin/env python
"""Open-set detection training driver (reference projects/train_net.py).

Trains the vCLR deformable-mask DINO: EMA teacher on weak views, CDN
denoising, Hungarian + mask + consistency losses, and evaluates with the
COCO AP / AR@{1..900} suite (class-agnostic option for open-set proposal
evaluation, as in deformable_train_voc_eval_nonvoc.py).

Usage:
  python train_net.py --train-json ann.json --train-root imgs/ \\
      --val-json val.json --val-root val_imgs/ --max-iter 60000
  python train_net.py --synthetic --max-iter 5        # smoke run
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.detection.coco_eval import COCOEvaluator
from ir_ads_tpu.detection.data import CocoDetection, ViewSamplingMapper, detection_batches
from ir_ads_tpu.detection.dino import DINODetector, nms_topk
from ir_ads_tpu.detection.train import (
    DetTrainState,
    detection_optimizer,
    make_detection_train_step,
)
from ir_ads_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ir_ads_tpu.utils.checkpoint import save_weights, load_weights
from ir_ads_tpu.utils.logging import ScalarWriter, get_logger
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()


def make_synthetic_coco(root: str, n_images=8, size=96, n_classes=4, seed=0):
    """Write a tiny random COCO dataset for smoke tests."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        fname = f"{i:04d}.jpg"
        arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", fname))
        images.append(
            {"id": i, "file_name": fname, "height": size, "width": size}
        )
        for _ in range(rng.randint(1, 4)):
            w, h = (int(v) for v in rng.randint(10, 40, 2))
            x = int(rng.randint(0, size - w))
            y = int(rng.randint(0, size - h))
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": int(rng.randint(1, n_classes + 1)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                    "segmentation": [
                        [x, y, x + w, y, x + w, y + h, x, y + h]
                    ],
                }
            )
            ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(n_classes)],
    }
    path = os.path.join(root, "annotations.json")
    with open(path, "w") as f:
        json.dump(coco, f)
    return path, os.path.join(root, "images")


def evaluate_detector(model, variables, mapper, logger, topk=300,
                      score_thresh=0.0, class_agnostic=False,
                      evaluator="coco"):
    """Run inference over the dataset and summarize COCO metrics."""

    @jax.jit
    def _infer(variables, imgs):
        out = model.apply(variables, imgs, train=False)
        logits = out["pred_logits"][-1].astype(jnp.float32)
        boxes = out["pred_boxes"][-1]
        masks = out["pred_masks"][-1]  # (B, Q, h0, w0) logits
        scores = jax.nn.sigmoid(logits)
        # mask-scored ranking (reference dino.py:924-931): sqrt(cls * mask)
        mask_prob = jax.nn.sigmoid(masks.astype(jnp.float32))
        mask_fg = (masks > 0).astype(jnp.float32)
        mask_score = (mask_fg * mask_prob).sum((-2, -1)) / (
            mask_fg.sum((-2, -1)) + 1e-10
        )
        cls_scores = jnp.sqrt(scores.max(-1) * jnp.maximum(mask_score, 1e-6))
        cls_ids = scores.argmax(-1)
        s, xyxy, keep = nms_topk(cls_scores, boxes, topk=min(topk, boxes.shape[1]))
        order = jnp.argsort(
            -jnp.where(keep, s, -1.0), axis=1
        )
        return s, xyxy, keep, cls_ids, order, masks

    def infer(imgs):
        return _infer(variables, imgs)


    if evaluator == "lvis":
        # federated LVIS semantics (ir_ads_tpu/detection/lvis_eval.py);
        # per-image neg/not-exhaustive ids come from the dataset when the
        # annotations carry them (LVIS json), else default to exhaustive
        from ir_ads_tpu.detection.lvis_eval import LVISEvaluator

        ev = LVISEvaluator()
    else:
        ev = COCOEvaluator(class_agnostic=class_agnostic)
    rng = np.random.default_rng(0)
    n = len(mapper.ds)
    th, tw = mapper.image_size
    for i in range(n):
        sample = mapper(i, rng)
        imgs = jnp.asarray(sample.weak_image[None], jnp.float32)
        s, xyxy, keep, cls_ids, order = infer(imgs)[:5]
        s, xyxy, keep = np.asarray(s[0]), np.asarray(xyxy[0]), np.asarray(keep[0])
        oh, ow = sample.orig_size
        sel = keep & (s > score_thresh)
        boxes = xyxy[sel]
        # normalized xyxy -> original-pixel xywh
        boxes = np.stack(
            [boxes[:, 0] * ow, boxes[:, 1] * oh,
             (boxes[:, 2] - boxes[:, 0]) * ow,
             (boxes[:, 3] - boxes[:, 1]) * oh], axis=-1,
        )
        # top-scoring class ids at kept slots (nms_topk sorted by score)
        gt_valid = sample.valid
        gt_cxcywh = sample.boxes[gt_valid]
        gt_boxes = np.stack(
            [(gt_cxcywh[:, 0] - gt_cxcywh[:, 2] / 2) * ow,
             (gt_cxcywh[:, 1] - gt_cxcywh[:, 3] / 2) * oh,
             gt_cxcywh[:, 2] * ow, gt_cxcywh[:, 3] * oh], axis=-1,
        )
        extra = {}
        if evaluator == "lvis":
            extra = dict(
                neg_category_ids=getattr(sample, "neg_category_ids", ()),
                not_exhaustive_category_ids=getattr(
                    sample, "not_exhaustive_category_ids", ()
                ),
            )
        ev.add_image(
            boxes, s[sel], np.zeros(sel.sum(), int) if class_agnostic
            else np.asarray(cls_ids[0])[: len(xyxy)][sel],
            gt_boxes, sample.labels[gt_valid], **extra,
        )
    stats = ev.summarize()
    logger.info(
        "eval: " + "  ".join(f"{k}={v:.4f}" for k, v in stats.items())
    )
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-json")
    p.add_argument("--train-root")
    p.add_argument("--val-json")
    p.add_argument("--val-root")
    p.add_argument("--style-root", default=None)
    p.add_argument("--depth-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--num-queries", type=int, default=900)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--enc-layers", type=int, default=6)
    p.add_argument("--dec-layers", type=int, default=6)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--max-gt", type=int, default=20)
    p.add_argument("--dn-number", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-iter", type=int, default=60000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--eval-period", type=int, default=5000)
    p.add_argument("--class-agnostic-eval", action="store_true")
    p.add_argument("--no-teacher", action="store_true")
    p.add_argument("--evaluator", default="coco", choices=["coco", "lvis"],
                   help="COCO AP or LVIS federated evaluation")
    p.add_argument("--output", default="output/detection")
    p.add_argument("--resume", default="")
    args = p.parse_args()
    logger = get_logger(os.path.join(args.output, "train.log"))
    writer = ScalarWriter(args.output)

    if args.synthetic:
        args.train_json, args.train_root = make_synthetic_coco("/tmp/synth_coco")
        args.val_json, args.val_root = args.train_json, args.train_root
        args.image_size = 96
        args.num_queries = 20
        args.embed_dim = 32
        args.enc_layers = args.dec_layers = 1
        args.backbone = "resnet18"
        args.max_gt = 4
        args.dn_number = 8
        args.batch_size = 2
        args.eval_period = max(args.eval_period, args.max_iter)

    train_ds = CocoDetection(
        args.train_json, args.train_root, args.style_root, args.depth_root
    )
    mapper = ViewSamplingMapper(
        train_ds, (args.image_size, args.image_size), args.max_gt, train=True
    )
    logger.info(f"train images: {len(train_ds)}, classes: {train_ds.num_classes}")

    mesh = make_mesh()
    model = DINODetector(
        num_classes=train_ds.num_classes,
        num_queries=args.num_queries,
        embed_dim=args.embed_dim,
        num_encoder_layers=args.enc_layers,
        num_decoder_layers=args.dec_layers,
        backbone_arch=args.backbone,
        dn_number=args.dn_number,
        max_gt=args.max_gt,
        dtype=jnp.bfloat16 if jax.devices()[0].platform == "tpu" else None,
    )
    s = args.image_size
    dummy = jnp.zeros((1, s, s, 3))
    d_lbl = jnp.zeros((1, args.max_gt), jnp.int32)
    d_box = jnp.full((1, args.max_gt, 4), 0.5)
    d_val = jnp.zeros((1, args.max_gt), bool)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
        dummy, d_lbl, d_box, d_val, train=True,
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"model: {n_params / 1e6:.1f}M params")

    tx = detection_optimizer(
        variables["params"], base_lr=args.lr, total_steps=args.max_iter
    )
    state = DetTrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    if args.resume and os.path.isdir(args.resume):
        w = load_weights(
            os.path.join(args.resume, "weights.msgpack"),
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(params=w["params"], batch_stats=w["batch_stats"])
        logger.info(f"resumed weights from {args.resume}")
    state = replicate(state, mesh)

    step = jax.jit(
        make_detection_train_step(
            ema_decay=args.ema_decay, use_teacher=not args.no_teacher
        ),
        donate_argnums=0,
    )
    rng = jax.random.PRNGKey(3407)

    batches = detection_batches(mapper, args.batch_size, shuffle=True)
    t0 = time.time()
    for it, batch in enumerate(batches):
        if it >= args.max_iter:
            break
        arrs = (
            batch["image"], batch["weak_image"], batch["labels"],
            batch["boxes"], batch["valid"], batch.get("masks"),
        )
        arrs = shard_batch(arrs, mesh)
        state, metrics = step(state, arrs, rng)
        if (it + 1) % 20 == 0 or it + 1 == args.max_iter:
            loss = float(metrics["loss"])
            ips = args.batch_size * (it + 1) / (time.time() - t0)
            writer.add_scalar("train/loss", loss, it)
            logger.info(f"iter {it + 1}/{args.max_iter} loss {loss:.4f} ({ips:.2f} img/s)")
        if (it + 1) % args.eval_period == 0 and args.val_json:
            val_ds = CocoDetection(args.val_json, args.val_root)
            val_mapper = ViewSamplingMapper(
                val_ds, (args.image_size, args.image_size), args.max_gt,
                train=False,
            )
            variables_eval = {
                "params": state.ema_params, "batch_stats": state.batch_stats
            }
            stats = evaluate_detector(
                model, variables_eval, val_mapper, logger,
                class_agnostic=args.class_agnostic_eval,
                evaluator=args.evaluator,
            )
            writer.add_scalar("val/AP", stats["AP"], it)

    os.makedirs(args.output, exist_ok=True)
    save_weights(
        os.path.join(args.output, "weights.msgpack"),
        state.params, state.batch_stats,
    )
    save_weights(
        os.path.join(args.output, "ema_weights.msgpack"),
        state.ema_params, state.batch_stats,
    )
    logger.info(f"saved weights to {args.output}")

    if args.val_json:
        val_ds = CocoDetection(args.val_json, args.val_root)
        val_mapper = ViewSamplingMapper(
            val_ds, (args.image_size, args.image_size), args.max_gt, train=False
        )
        stats = evaluate_detector(
            model,
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            val_mapper, logger, class_agnostic=args.class_agnostic_eval,
            evaluator=args.evaluator,
        )
        return stats
    writer.close()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Detection demo: image / folder / video inference with visualization
(reference demo/demo.py + VisualizationDemo/DefaultPredictor, demo/predictors.py).

Usage:
  python demo/demo.py --weights out/ema_weights.msgpack --num-classes 20 \\
      --input img.jpg --output out_vis/ --score-thresh 0.4
  python demo/demo.py --input frames_dir/ --track hungarian   # MOT over a
      frame sequence (reference demo/mot_demo.py)

The reference's AsyncPredictor (multi-GPU queue) maps to simple host-side
pipelining here: JAX dispatch is already async; decode of frame N+1 overlaps
device compute of frame N.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw

from ir_ads_tpu.detection.dino import DINODetector, nms_topk
from ir_ads_tpu.utils.checkpoint import load_weights


def build(args):
    model = DINODetector(
        num_classes=args.num_classes,
        num_queries=args.num_queries,
        embed_dim=args.embed_dim,
        num_encoder_layers=args.enc_layers,
        num_decoder_layers=args.dec_layers,
        backbone_arch=args.backbone,
        max_gt=1,
        dn_number=0,
    )
    s = args.image_size
    dummy = jnp.zeros((1, s, s, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)}, dummy
    )
    if args.weights:
        variables = load_weights(
            args.weights,
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )

    @jax.jit
    def _infer(variables, img):
        out = model.apply(variables, img, train=False)
        scores = jax.nn.sigmoid(out["pred_logits"][-1].astype(jnp.float32))
        cls = scores.argmax(-1)
        s, xyxy, keep = nms_topk(
            scores.max(-1), out["pred_boxes"][-1],
            topk=min(100, args.num_queries),
        )
        return s, xyxy, keep, cls

    return lambda img: _infer(variables, img)


def draw(img: np.ndarray, boxes, scores, keep, thresh) -> np.ndarray:
    im = Image.fromarray(img)
    d = ImageDraw.Draw(im)
    h, w = img.shape[:2]
    for box, score, k in zip(boxes, scores, keep):
        if not k or score < thresh:
            continue
        x1, y1, x2, y2 = box[0] * w, box[1] * h, box[2] * w, box[3] * h
        d.rectangle([x1, y1, x2, y2], outline=(0, 255, 0), width=2)
        d.text((x1 + 2, y1 + 2), f"{score:.2f}", fill=(255, 255, 0))
    return np.asarray(im)


VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


def run_video(args, infer, tracker):
    """Video-file / webcam inference (reference demo/demo.py --video-input /
    --webcam + predictors.py AsyncPredictor): a host thread decodes and
    preprocesses ahead while the chip runs inference on earlier frames
    (bounded in-flight window; see demo/predictors.py)."""
    import cv2

    from demo.predictors import AsyncPredictor, video_frames, webcam_frames

    if args.input == "webcam":
        frames = webcam_frames(args.camera, args.max_frames)
        fps, stem = 25.0, "webcam"
    else:
        cap = cv2.VideoCapture(args.input)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
        cap.release()
        frames = video_frames(args.input)
        stem = Path(args.input).stem
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, stem + "_det.mp4")
    writer = None
    s = args.image_size
    n, t0 = 0, time.time()

    def preprocess(img):
        return np.asarray(
            Image.fromarray(img).resize((s, s))
        ).astype(np.float32)[None]

    def fetch(dev):
        scores, boxes, keep, cls = dev
        return (np.asarray(scores[0]), np.asarray(boxes[0]),
                np.asarray(keep[0]), np.asarray(cls[0]))

    pipeline = AsyncPredictor(preprocess, infer, fetch)
    for img, (s_, b, k_, cls0) in pipeline(frames):
        cls = [cls0]
        if tracker is not None:
            sel = k_ & (s_ > args.score_thresh)
            tracks = tracker.update(
                b[sel], np.asarray(cls[0])[: len(b)][sel], s_[sel]
            )
            b = np.stack([t.box for t in tracks]) if tracks else np.zeros((0, 4))
            s_ = np.asarray([t.track_id + t.score / 10 for t in tracks])
            k_ = np.ones(len(b), bool)
        vis = draw(np.ascontiguousarray(img), b, s_, k_,
                   0.0 if tracker else args.score_thresh)
        if writer is None:
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (vis.shape[1], vis.shape[0]),
            )
        writer.write(vis[..., ::-1])
        n += 1
    if writer is not None:
        writer.release()
    dt = time.time() - t0
    print(f"{n} frames in {dt:.1f}s ({n / max(dt, 1e-6):.1f} fps) -> {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="image file, directory, or video file")
    p.add_argument("--output", default="output/demo")
    p.add_argument("--weights", default="")
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--num-queries", type=int, default=900)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--enc-layers", type=int, default=6)
    p.add_argument("--dec-layers", type=int, default=6)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--score-thresh", type=float, default=0.4)
    p.add_argument("--track", choices=["iou", "hungarian"], default=None,
                   help="treat input dir as a frame sequence and track")
    p.add_argument("--camera", type=int, default=0,
                   help="camera index for --input webcam")
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop webcam capture after N frames")
    args = p.parse_args()

    tracker = None
    if args.track:
        from ir_ads_tpu.detection.tracking import TRACKERS

        tracker = TRACKERS[args.track]()

    if args.input != "webcam" and not os.path.exists(args.input):
        raise SystemExit(f"input not found: {args.input}")
    infer = build(args)
    if args.input == "webcam" or (
        os.path.isfile(args.input)
        and Path(args.input).suffix.lower() in VIDEO_EXTS
    ):
        run_video(args, infer, tracker)
        return
    os.makedirs(args.output, exist_ok=True)
    paths = (
        sorted(Path(args.input).glob("*"))
        if os.path.isdir(args.input)
        else [Path(args.input)]
    )
    for path in paths:
        if path.suffix.lower() not in {".jpg", ".jpeg", ".png", ".bmp"}:
            continue
        img = np.asarray(Image.open(path).convert("RGB"))
        s = args.image_size
        inp = np.asarray(Image.fromarray(img).resize((s, s))).astype(np.float32)
        t0 = time.time()
        scores, boxes, keep, cls = infer(inp[None])
        scores.block_until_ready()
        dt = (time.time() - t0) * 1000
        b, s_, k_ = np.asarray(boxes[0]), np.asarray(scores[0]), np.asarray(keep[0])
        if tracker is not None:
            sel = k_ & (s_ > args.score_thresh)
            tracks = tracker.update(
                b[sel], np.asarray(cls[0])[: len(b)][sel], s_[sel]
            )
            b = np.stack([t.box for t in tracks]) if tracks else np.zeros((0, 4))
            s_ = np.asarray([t.score for t in tracks])
            k_ = np.ones(len(b), bool)
            # annotate track ids via score text (id.score)
            s_ = np.asarray([t.track_id + t.score / 10 for t in tracks])
        vis = draw(img, b, s_, k_, 0.0 if tracker else args.score_thresh)
        out = Path(args.output) / f"{path.stem}_det.png"
        Image.fromarray(vis).save(out)
        print(f"{path.name}: {dt:.0f} ms -> {out}")


if __name__ == "__main__":
    main()

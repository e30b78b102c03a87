"""Classic detection meta-architectures: RetinaNet, FCOS, Faster R-CNN.

TPU-native rebuilds of detectron2's modeling/meta_arch family
(GeneralizedRCNN, RetinaNet, FCOS + proposal_generator/RPN + roi_heads;
SURVEY.md §2.4) on the shared ResNet/FPN/roi_align/box primitives.

Static-shape discipline throughout: GT padded to max_gt; RPN keeps a fixed
top-k proposal set per image (no dynamic NMS-filtered lists); losses mask
padded slots.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.detection.box_ops import box_iou
from ir_ads_tpu.detection.criterion import optax_sigmoid_ce, sigmoid_focal_loss
from ir_ads_tpu.detection.rotated_boxes import roi_align
from ir_ads_tpu.models.backbones.resnet import ResNet

Dtype = Any


class FPN(nn.Module):
    """d2-style FPN: lateral 1x1 + output 3x3, P6/P7 extras."""

    out_channels: int = 256
    num_extra: int = 2  # P6, P7
    extra_from_p5: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in reversed(range(len(laterals) - 1)):
            up = jax.image.resize(
                laterals[i + 1],
                laterals[i].shape[:1] + laterals[i].shape[1:3]
                + laterals[i + 1].shape[3:],
                method="nearest",
            )
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"output_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        extra_src = outs[-1] if self.extra_from_p5 else feats[-1]
        for i in range(self.num_extra):
            extra_src = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1,
                dtype=self.dtype, name=f"extra_{i}",
            )(nn.relu(extra_src) if i > 0 else extra_src)
            outs.append(extra_src)
        return outs


def make_anchors(
    spatial_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes: Sequence[float],
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
) -> np.ndarray:
    """All anchors xyxy in input pixels, (sum_l H*W*A, 4) — compile-time
    constant (d2 anchor_generator)."""
    all_anchors = []
    for (h, w), stride, size in zip(spatial_shapes, strides, sizes):
        base = []
        for s in scales:
            area = (size * s) ** 2
            for ar in aspect_ratios:
                bw = math.sqrt(area / ar)
                bh = bw * ar
                base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = np.asarray(base)  # (A, 4)
        ys = (np.arange(h) + 0.5) * stride
        xs = (np.arange(w) + 0.5) * stride
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        ctr = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
        all_anchors.append((ctr + base[None]).reshape(-1, 4))
    return np.concatenate(all_anchors, 0).astype(np.float32)


def encode_deltas(anchors: jax.Array, boxes: jax.Array) -> jax.Array:
    """Box -> (dx, dy, dw, dh) deltas (d2 Box2BoxTransform)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack(
        [(bx - ax) / aw, (by - ay) / ah,
         jnp.log(jnp.maximum(bw, 1e-6) / aw),
         jnp.log(jnp.maximum(bh, 1e-6) / ah)], -1,
    )


def decode_deltas(anchors: jax.Array, deltas: jax.Array,
                  clip: float = math.log(1000.0 / 16)) -> jax.Array:
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    dx, dy, dw, dh = jnp.split(deltas, 4, -1)
    dw = jnp.clip(dw, None, clip)
    dh = jnp.clip(dh, None, clip)
    cx = dx[..., 0] * aw + ax
    cy = dy[..., 0] * ah + ay
    w = jnp.exp(dw[..., 0]) * aw
    h = jnp.exp(dh[..., 0]) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def match_anchors(
    anchors: jax.Array,  # (N, 4) xyxy
    gt_boxes: jax.Array,  # (G, 4) xyxy
    gt_valid: jax.Array,  # (G,)
    pos_thresh: float = 0.5,
    neg_thresh: float = 0.4,
) -> Tuple[jax.Array, jax.Array]:
    """d2 Matcher with allow_low_quality_matches: returns (matched_gt_idx,
    label) where label in {1 pos, 0 neg, -1 ignore}."""
    iou = box_iou(anchors, gt_boxes)[0]
    iou = jnp.where(gt_valid[None], iou, -1.0)
    best_iou = iou.max(-1)
    matched = iou.argmax(-1)
    label = jnp.where(best_iou >= pos_thresh, 1,
                      jnp.where(best_iou < neg_thresh, 0, -1))
    # low-quality: the best anchor for each gt becomes positive
    best_anchor_per_gt = jnp.where(gt_valid, iou.argmax(0), -1)
    is_best = jnp.zeros(anchors.shape[0], bool).at[
        jnp.where(best_anchor_per_gt >= 0, best_anchor_per_gt, 0)
    ].set(gt_valid.any() & True)
    label = jnp.where(is_best & gt_valid.any(), 1, label)
    return matched, label


def smooth_l1(x: jax.Array, beta: float = 0.1) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax**2 / beta, ax - 0.5 * beta)


class RetinaNet(nn.Module):
    """RetinaNet (d2 meta_arch/retinanet.py): FPN P3-P7, shared 4-conv
    class/box towers, focal + smooth-L1 losses."""

    num_classes: int = 80
    backbone_arch: str = "resnet50"
    channels: int = 256
    max_gt: int = 20
    dtype: Optional[Dtype] = None

    STRIDES = (8, 16, 32, 64, 128)
    SIZES = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 train: bool = False):
        feats = ResNet(arch=self.backbone_arch, frozen_bn=True,
                       out_features=("res3", "res4", "res5"),
                       dtype=self.dtype, name="backbone")(images, train)
        levels = FPN(self.channels, dtype=self.dtype, name="fpn")(
            [feats["res3"], feats["res4"], feats["res5"]]
        )
        a_per_loc = 9
        cls_outs, box_outs = [], []
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"cls_tower_{i}") for i in range(4)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"box_tower_{i}") for i in range(4)
        ]
        prior = -math.log((1 - 0.01) / 0.01)
        cls_head = nn.Conv(
            a_per_loc * self.num_classes, (3, 3), padding=1,
            bias_init=nn.initializers.constant(prior),
            dtype=self.dtype, name="cls_head",
        )
        box_head = nn.Conv(a_per_loc * 4, (3, 3), padding=1,
                           dtype=self.dtype, name="box_head")
        for f in levels:
            c = b = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in box_tower:
                b = nn.relu(conv(b))
            n = f.shape[0]
            cls_outs.append(cls_head(c).reshape(n, -1, self.num_classes))
            box_outs.append(box_head(b).reshape(n, -1, 4))
        logits = jnp.concatenate(cls_outs, 1)
        deltas = jnp.concatenate(box_outs, 1)

        shapes = tuple((f.shape[1], f.shape[2]) for f in levels)
        anchors = jnp.asarray(make_anchors(shapes, self.STRIDES, self.SIZES))

        out = {"logits": logits, "deltas": deltas, "anchors": anchors,
               "boxes": decode_deltas(anchors[None], deltas)}
        if train and gt_boxes is not None:
            out["losses"] = self.losses(
                logits, deltas, anchors, gt_boxes, gt_labels, gt_valid
            )
        return out

    def losses(self, logits, deltas, anchors, gt_boxes, gt_labels, gt_valid):
        def per_image(lg, dl, gb, gl, gv):
            matched, label = match_anchors(anchors, gb, gv)
            onehot = jax.nn.one_hot(gl[matched], self.num_classes)
            onehot = onehot * (label == 1)[:, None]
            valid = label >= 0
            cls = sigmoid_focal_loss(lg.astype(jnp.float32), onehot)
            cls = (cls * valid[:, None]).sum()
            target = encode_deltas(anchors, gb[matched])
            reg = smooth_l1(dl - target).sum(-1)
            reg = (reg * (label == 1)).sum()
            return cls, reg, jnp.maximum((label == 1).sum(), 1)

        cls, reg, npos = jax.vmap(per_image)(
            logits, deltas, gt_boxes, gt_labels, gt_valid
        )
        n = jnp.maximum(npos.sum(), 1.0)
        return {"loss_cls": cls.sum() / n, "loss_box_reg": reg.sum() / n}


class FCOS(nn.Module):
    """FCOS (d2 meta_arch/fcos.py): anchor-free per-location l/t/r/b
    regression + centerness."""

    num_classes: int = 80
    backbone_arch: str = "resnet50"
    channels: int = 256
    max_gt: int = 20
    dtype: Optional[Dtype] = None

    STRIDES = (8, 16, 32, 64, 128)
    # per-level regression ranges
    RANGES = ((0, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))

    @nn.compact
    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 train: bool = False):
        feats = ResNet(arch=self.backbone_arch, frozen_bn=True,
                       out_features=("res3", "res4", "res5"),
                       dtype=self.dtype, name="backbone")(images, train)
        levels = FPN(self.channels, dtype=self.dtype, name="fpn")(
            [feats["res3"], feats["res4"], feats["res5"]]
        )
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"cls_tower_{i}") for i in range(4)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"box_tower_{i}") for i in range(4)
        ]
        prior = -math.log((1 - 0.01) / 0.01)
        cls_head = nn.Conv(self.num_classes, (3, 3), padding=1,
                           bias_init=nn.initializers.constant(prior),
                           dtype=self.dtype, name="cls_head")
        box_head = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           name="box_head")
        ctr_head = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           name="ctr_head")

        logits, ltrb, ctr, centers, ranges = [], [], [], [], []
        for lvl, f in enumerate(levels):
            c = b = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in box_tower:
                b = nn.relu(conv(b))
            n, h, w, _ = f.shape
            scale = self.param(f"scale_{lvl}", nn.initializers.ones, ())
            logits.append(cls_head(c).reshape(n, -1, self.num_classes))
            reg = jnp.exp(box_head(b) * scale) * self.STRIDES[lvl]
            ltrb.append(reg.reshape(n, -1, 4))
            ctr.append(ctr_head(b).reshape(n, -1))
            ys = (jnp.arange(h) + 0.5) * self.STRIDES[lvl]
            xs = (jnp.arange(w) + 0.5) * self.STRIDES[lvl]
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            centers.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
            ranges.append(
                jnp.broadcast_to(jnp.asarray(self.RANGES[lvl]), (h * w, 2))
            )
        logits = jnp.concatenate(logits, 1)
        ltrb = jnp.concatenate(ltrb, 1)
        ctr = jnp.concatenate(ctr, 1)
        centers = jnp.concatenate(centers, 0)  # (N, 2)
        ranges = jnp.concatenate(ranges, 0)

        boxes = jnp.stack(
            [centers[None, :, 0] - ltrb[..., 0],
             centers[None, :, 1] - ltrb[..., 1],
             centers[None, :, 0] + ltrb[..., 2],
             centers[None, :, 1] + ltrb[..., 3]], -1,
        )
        out = {"logits": logits, "boxes": boxes, "centerness": ctr}
        if train and gt_boxes is not None:
            out["losses"] = self.losses(
                logits, ltrb, ctr, centers, ranges, gt_boxes, gt_labels, gt_valid
            )
        return out

    def losses(self, logits, ltrb, ctr, centers, ranges,
               gt_boxes, gt_labels, gt_valid):
        from ir_ads_tpu.detection.box_ops import elementwise_giou

        def per_image(lg, rg, ct, gb, gl, gv):
            # per-location l/t/r/b to every gt
            l = centers[:, None, 0] - gb[None, :, 0]
            t = centers[:, None, 1] - gb[None, :, 1]
            r = gb[None, :, 2] - centers[:, None, 0]
            b = gb[None, :, 3] - centers[:, None, 1]
            reg = jnp.stack([l, t, r, b], -1)  # (N, G, 4)
            inside = reg.min(-1) > 0
            maxreg = reg.max(-1)
            in_range = (maxreg >= ranges[:, None, 0]) & (
                maxreg <= ranges[:, None, 1]
            )
            area = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
            cand = inside & in_range & gv[None]
            area_m = jnp.where(cand, area[None], 1e12)
            gt_idx = area_m.argmin(-1)
            is_pos = cand.any(-1)
            tgt = jnp.take_along_axis(reg, gt_idx[:, None, None], 1)[:, 0]
            onehot = jax.nn.one_hot(gl[gt_idx], self.num_classes)
            onehot = onehot * is_pos[:, None]
            cls = sigmoid_focal_loss(lg.astype(jnp.float32), onehot).sum()
            pred_box = jnp.stack(
                [centers[:, 0] - rg[:, 0], centers[:, 1] - rg[:, 1],
                 centers[:, 0] + rg[:, 2], centers[:, 1] + rg[:, 3]], -1,
            )
            tgt_box = jnp.stack(
                [centers[:, 0] - tgt[:, 0], centers[:, 1] - tgt[:, 1],
                 centers[:, 0] + tgt[:, 2], centers[:, 1] + tgt[:, 3]], -1,
            )
            giou = (1 - elementwise_giou(pred_box, tgt_box)) * is_pos
            lr = tgt[:, [0, 2]]
            tb = tgt[:, [1, 3]]
            ctr_tgt = jnp.sqrt(
                jnp.clip(lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6), 0, 1)
                * jnp.clip(tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6), 0, 1)
            )
            ctr_loss = optax_sigmoid_ce(ct, ctr_tgt) * is_pos
            return cls, giou.sum(), ctr_loss.sum(), jnp.maximum(is_pos.sum(), 1)

        cls, giou, ctr_l, npos = jax.vmap(per_image)(
            logits, ltrb, ctr, gt_boxes, gt_labels, gt_valid
        )
        n = jnp.maximum(npos.sum(), 1.0)
        return {"loss_cls": cls.sum() / n, "loss_giou": giou.sum() / n,
                "loss_centerness": ctr_l.sum() / n}


class FasterRCNN(nn.Module):
    """Two-stage Faster R-CNN (d2 GeneralizedRCNN + RPN + StandardROIHeads,
    box branch): static top-k proposals instead of NMS-filtered lists.

    With ``with_mask=True`` this is Mask R-CNN (adds the
    MaskRCNNConvUpsampleHead branch, d2 roi_heads/mask_head.py); with
    ``num_keypoints>0`` it adds the Keypoint R-CNN branch
    (roi_heads/keypoint_head.py)."""

    num_classes: int = 80
    backbone_arch: str = "resnet50"
    channels: int = 256
    num_proposals: int = 256  # static per-image proposal count
    max_gt: int = 20
    with_mask: bool = False
    num_keypoints: int = 0  # e.g. 17 for COCO person keypoints
    mask_pool: int = 14  # ROI pool size for the mask branch (output 2x)
    dtype: Optional[Dtype] = None

    STRIDES = (4, 8, 16, 32)
    SIZES = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 train: bool = False, gt_masks=None, gt_keypoints=None):
        feats = ResNet(arch=self.backbone_arch, frozen_bn=True,
                       out_features=("res2", "res3", "res4", "res5"),
                       dtype=self.dtype, name="backbone")(images, train)
        levels = FPN(self.channels, num_extra=0, dtype=self.dtype,
                     name="fpn")(
            [feats["res2"], feats["res3"], feats["res4"], feats["res5"]]
        )
        b = images.shape[0]
        # RPN: 3 anchors (aspect ratios) per location, one size per level
        rpn_conv = nn.Conv(self.channels, (3, 3), padding=1,
                           dtype=self.dtype, name="rpn_conv")
        rpn_obj = nn.Conv(3, (1, 1), dtype=self.dtype, name="rpn_obj")
        rpn_delta = nn.Conv(12, (1, 1), dtype=self.dtype, name="rpn_delta")
        obj_all, delta_all = [], []
        for f in levels:
            h = nn.relu(rpn_conv(f))
            obj_all.append(rpn_obj(h).reshape(b, -1))
            delta_all.append(rpn_delta(h).reshape(b, -1, 4))
        obj = jnp.concatenate(obj_all, 1)
        deltas = jnp.concatenate(delta_all, 1)
        shapes = tuple((f.shape[1], f.shape[2]) for f in levels)
        anchors = jnp.asarray(
            make_anchors(shapes, self.STRIDES, self.SIZES, scales=(1.0,))
        )
        proposals = decode_deltas(anchors[None], deltas)
        # static top-k proposals by objectness
        k = min(self.num_proposals, obj.shape[1])
        top = jax.lax.top_k(obj, k)[1]
        prop_boxes = jax.lax.stop_gradient(
            jnp.take_along_axis(proposals, top[..., None], 1)
        )

        # ROI box head on P2 (single-level assignment for simplicity)
        batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k))
        rois = jnp.concatenate(
            [batch_idx.reshape(-1, 1).astype(jnp.float32),
             prop_boxes.reshape(-1, 4)], -1,
        )
        pooled = roi_align(levels[0], rois, (7, 7),
                           spatial_scale=1.0 / self.STRIDES[0])
        flat = pooled.reshape(b * k, -1)
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, name="box_fc1")(flat))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, name="box_fc2")(h))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name="cls_score")(h).reshape(b, k, -1)
        box_deltas = nn.Dense(4, dtype=self.dtype,
                              name="bbox_pred")(h).reshape(b, k, 4)
        det_boxes = decode_deltas(prop_boxes, box_deltas)

        out = {"rpn_obj": obj, "proposals": prop_boxes,
               "cls_logits": cls_logits, "boxes": det_boxes}

        if self.with_mask:
            from ir_ads_tpu.detection.roi_heads import MaskHead

            mp = self.mask_pool
            pooled_m = roi_align(levels[0], rois, (mp, mp),
                                 spatial_scale=1.0 / self.STRIDES[0])
            mask_logits = MaskHead(
                self.num_classes, dtype=self.dtype, name="mask_head"
            )(pooled_m)  # (B*k, 2mp, 2mp, num_classes)
            out["mask_logits"] = mask_logits.reshape(
                b, k, 2 * mp, 2 * mp, self.num_classes
            )
        if self.num_keypoints:
            from ir_ads_tpu.detection.roi_heads import KeypointHead

            mp = self.mask_pool
            pooled_k = roi_align(levels[0], rois, (mp, mp),
                                 spatial_scale=1.0 / self.STRIDES[0])
            kp_logits = KeypointHead(
                self.num_keypoints, dtype=self.dtype, name="keypoint_head"
            )(pooled_k)  # (B*k, 4mp, 4mp, K)
            out["keypoint_logits"] = kp_logits.reshape(
                b, k, 4 * mp, 4 * mp, self.num_keypoints
            )

        if train and gt_boxes is not None:
            out["losses"] = self.losses(
                obj, deltas, anchors, prop_boxes, cls_logits, box_deltas,
                gt_boxes, gt_labels, gt_valid,
                mask_logits=out.get("mask_logits"),
                keypoint_logits=out.get("keypoint_logits"),
                gt_masks=gt_masks, gt_keypoints=gt_keypoints,
            )
        return out

    def losses(self, obj, rpn_deltas, anchors, proposals, cls_logits,
               box_deltas, gt_boxes, gt_labels, gt_valid,
               mask_logits=None, keypoint_logits=None,
               gt_masks=None, gt_keypoints=None):
        def per_image(ob, rd, pb, cl, bd, gb, gl, gv):
            # RPN losses
            matched, label = match_anchors(anchors, gb, gv, 0.7, 0.3)
            valid = label >= 0
            obj_loss = (optax_sigmoid_ce(ob, (label == 1).astype(jnp.float32))
                        * valid).sum() / jnp.maximum(valid.sum(), 1)
            tgt = encode_deltas(anchors, gb[matched])
            rpn_reg = (smooth_l1(rd - tgt).sum(-1) * (label == 1)).sum() / (
                jnp.maximum((label == 1).sum(), 1)
            )
            # ROI losses
            m2, l2 = match_anchors(pb, gb, gv, 0.5, 0.5)
            cls_tgt = jnp.where(l2 == 1, gl[m2], self.num_classes)  # bg last
            ce = -jax.nn.log_softmax(cl.astype(jnp.float32), -1)
            cls_loss = jnp.take_along_axis(
                ce, cls_tgt[:, None], -1
            )[:, 0].mean()
            tgt2 = encode_deltas(pb, gb[m2])
            roi_reg = (smooth_l1(bd - tgt2).sum(-1) * (l2 == 1)).sum() / (
                jnp.maximum((l2 == 1).sum(), 1)
            )
            return obj_loss, rpn_reg, cls_loss, roi_reg

        o, r, c, rr = jax.vmap(per_image)(
            obj, rpn_deltas, proposals, cls_logits, box_deltas,
            gt_boxes, gt_labels, gt_valid,
        )
        losses = {"loss_rpn_obj": o.mean(), "loss_rpn_reg": r.mean(),
                  "loss_roi_cls": c.mean(), "loss_roi_reg": rr.mean()}

        if mask_logits is not None and gt_masks is not None:
            from ir_ads_tpu.detection.roi_heads import (
                crop_and_resize_masks,
                mask_rcnn_loss,
            )

            s = mask_logits.shape[2]

            def mask_per_image(ml, pb, gb, gl, gv, gm):
                m2, l2 = match_anchors(pb, gb, gv, 0.5, 0.5)
                fg = (l2 == 1).astype(jnp.float32)
                tgt = crop_and_resize_masks(gm, pb, m2, s)
                return mask_rcnn_loss(ml, gl[m2], tgt, fg)

            losses["loss_mask"] = jax.vmap(mask_per_image)(
                mask_logits, proposals, gt_boxes, gt_labels, gt_valid,
                gt_masks,
            ).mean()

        if keypoint_logits is not None and gt_keypoints is not None:
            from ir_ads_tpu.detection.roi_heads import keypoint_rcnn_loss

            def kp_per_image(kl, pb, gb, gv, gk):
                m2, l2 = match_anchors(pb, gb, gv, 0.5, 0.5)
                fg = (l2 == 1).astype(jnp.float32)
                return keypoint_rcnn_loss(kl, gk[m2], pb, fg)

            losses["loss_keypoint"] = jax.vmap(kp_per_image)(
                keypoint_logits, proposals, gt_boxes, gt_valid, gt_keypoints,
            ).mean()
        return losses


def MaskRCNN(**kw) -> FasterRCNN:
    """Mask R-CNN = Faster R-CNN + mask branch (d2 mask_rcnn_R_50_FPN)."""
    kw.setdefault("with_mask", True)
    return FasterRCNN(**kw)


def KeypointRCNN(**kw) -> FasterRCNN:
    """Keypoint R-CNN (d2 keypoint_rcnn_R_50_FPN): person keypoints."""
    kw.setdefault("num_keypoints", 17)
    kw.setdefault("num_classes", 1)
    return FasterRCNN(**kw)

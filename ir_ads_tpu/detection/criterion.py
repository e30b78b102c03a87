"""DINO training criterion: focal classification, L1+GIoU boxes,
point-sampled mask loss, CDN denoising losses, and the vCLR consistency
loss.

References: detrex/modeling/criterion/criterion.py,
projects/vCLR_deformable_mask/modeling/two_stage_criterion.py (point-sampled
mask CE+dice, 12544 pts, oversample 3.0, importance ratio 0.75 —
two_stage_criterion.py:147-149,366-415), dn_criterion.py, ConsisCriterion.py.

Everything is static-shape: GT is padded to MAX_GT with a validity mask;
matched losses are computed for all slots and masked.  num_boxes
normalization is a global sum over the (possibly data-sharded) batch — XLA
inserts the cross-device reduction, replacing the reference's explicit
all_reduce (two_stage_criterion.py:171-173).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ir_ads_tpu.detection.box_ops import (
    box_cxcywh_to_xyxy,
    elementwise_giou,
)
from ir_ads_tpu.detection.matcher import hungarian_match, match_cost
from ir_ads_tpu.ops.grid_sample import grid_sample


def sigmoid_focal_loss(
    logits: jax.Array, targets: jax.Array, alpha: float = 0.25, gamma: float = 2.0
) -> jax.Array:
    """Elementwise focal loss; targets one-hot float."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def class_loss(
    pred_logits: jax.Array,  # (B, Q, C)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
    match_q: jax.Array,  # (B, G) matched query index per gt
    num_boxes: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Focal classification: matched queries get their GT class, everything
    else background (all-zero one-hot)."""
    b, q, c = pred_logits.shape
    onehot = jnp.zeros((b, q, c), jnp.float32)
    updates = jax.nn.one_hot(gt_labels, c) * gt_valid[..., None]
    # scatter: onehot[b, match_q[b, g]] = one_hot(label) for valid g
    onehot = jax.vmap(
        lambda oh, idx, upd: oh.at[idx].add(upd)
    )(onehot, match_q, updates)
    onehot = jnp.clip(onehot, 0.0, 1.0)
    loss = sigmoid_focal_loss(
        pred_logits.astype(jnp.float32), onehot, alpha, gamma
    )
    # detrex: mean over queries, x num_queries, / num_boxes == sum / num_boxes
    return loss.sum() / num_boxes


def box_loss(
    pred_boxes: jax.Array,  # (B, Q, 4) cxcywh
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_valid: jax.Array,  # (B, G)
    match_q: jax.Array,  # (B, G)
    num_boxes: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    matched = jnp.take_along_axis(pred_boxes, match_q[..., None], axis=1)
    l1 = jnp.sum(jnp.abs(matched - gt_boxes), axis=-1) * gt_valid
    giou = (
        1.0
        - elementwise_giou(
            box_cxcywh_to_xyxy(matched), box_cxcywh_to_xyxy(gt_boxes)
        )
    ) * gt_valid
    return l1.sum() / num_boxes, giou.sum() / num_boxes


def _sample_points_bilinear_xla(
    masks: jax.Array, coords: jax.Array
) -> jax.Array:
    """masks (N, H, W), coords (N, P, 2) in [0,1] (x, y) -> (N, P).
    Equivalent to detectron2 point_sample (grid_sample align_corners=False)."""
    grid = coords[:, :, None, :] * 2.0 - 1.0  # (N, P, 1, 2)
    out = grid_sample(masks[..., None], grid, align_corners=False)
    return out[:, :, 0, 0]


@jax.custom_vjp
def _sample_points_bilinear_patch(masks, coords):
    """Same math as :func:`_sample_points_bilinear_xla` via ONE 2x2-patch
    slice gather per point (all 4 bilinear corners in-row) — ~4x fewer
    descriptors on the row-rate-bound TPU gather engine (dev/probe_msd2.py;
    the round-5 DINO train profile showed the mask-loss corner gathers in
    the 26 ms class per layer).  Backward recomputes through the
    grid_sample form (per-corner gathers/scatters, which the relay
    toolchain compiles; patch-slice scatters do not)."""
    from ir_ads_tpu.detection.msdeform_attn import (
        _gather_patch2x2, _patch_tables,
    )

    n, h, w = masks.shape
    p = coords.shape[1]
    gxy = jnp.stack(
        [
            coords[..., 0].astype(jnp.float32) * w - 0.5,
            coords[..., 1].astype(jnp.float32) * h - 0.5,
        ],
        axis=-1,
    )  # (N, P, 2) pixel coords, align_corners=False
    ys, xs, cellw = _patch_tables(h, w, gxy, jnp.ones((n, p), jnp.float32))
    patches = _gather_patch2x2(
        masks[..., None].astype(jnp.float32), ys, xs
    )  # (N, P, 2, 2, 1)
    return jnp.einsum(
        "npyxd,npyx->np", patches, cellw,
        preferred_element_type=jnp.float32,
    )


def _spbp_fwd(masks, coords):
    return _sample_points_bilinear_patch(masks, coords), (masks, coords)


def _spbp_bwd(res, g):
    masks, coords = res
    _, vjp = jax.vjp(_sample_points_bilinear_xla, masks, coords)
    return vjp(g)


_sample_points_bilinear_patch.defvjp(_spbp_fwd, _spbp_bwd)


def _sample_points_bilinear(masks: jax.Array, coords: jax.Array) -> jax.Array:
    import os

    # default xla: the patch-gather variant CRASHES the TPU worker
    # ("kernel fault") inside the 800x1216 DINO train step — isolated by
    # the dev/run_r5h.sh bisect (patch_only crashed, level_only ran;
    # dev/logs/r5h.log, 2026-08-21).  Kept opt-in for future toolchains.
    impl = os.environ.get("IR_ADS_MASK_SAMPLE", "xla")
    if impl == "auto":
        impl = "patch" if jax.default_backend() == "tpu" else "xla"
    if impl == "patch":
        return _sample_points_bilinear_patch(
            masks.astype(jnp.float32), coords
        )
    return _sample_points_bilinear_xla(masks, coords)


def point_sampled_mask_loss(
    pred_masks: jax.Array,  # (B, G, Hm, Wm) matched mask logits
    gt_masks: jax.Array,  # (B, G, H, W) float {0,1}
    gt_valid: jax.Array,  # (B, G)
    num_boxes: jax.Array,
    key: jax.Array,
    num_points: int = 12544,
    oversample: float = 3.0,
    importance_ratio: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """PointRend-style point-sampled sigmoid CE + dice
    (two_stage_criterion.py:366-415 via d2 point_sample +
    get_uncertain_point_coords_with_randomness)."""
    b, g = pred_masks.shape[:2]
    n = b * g
    pm = pred_masks.reshape(n, *pred_masks.shape[2:])
    gm = gt_masks.reshape(n, *gt_masks.shape[2:]).astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    n_sampled = int(num_points * oversample)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    logits_at = _sample_points_bilinear(pm.astype(jnp.float32), coords)
    uncertainty = -jnp.abs(logits_at)
    n_uncertain = int(importance_ratio * num_points)
    n_random = num_points - n_uncertain
    top_idx = jax.lax.top_k(uncertainty, n_uncertain)[1]  # (N, n_unc)
    certain_coords = jnp.take_along_axis(coords, top_idx[..., None], axis=1)
    rand_coords = jax.random.uniform(k2, (n, n_random, 2))
    pts = jnp.concatenate([certain_coords, rand_coords], axis=1)

    pred_pts = _sample_points_bilinear(pm.astype(jnp.float32), pts)
    gt_pts = _sample_points_bilinear(gm, pts)

    valid = gt_valid.reshape(n, 1).astype(jnp.float32)
    ce = optax_sigmoid_ce(pred_pts, gt_pts) * valid
    loss_ce = ce.mean(-1).sum() / num_boxes

    prob = jax.nn.sigmoid(pred_pts) * valid
    gt_v = gt_pts * valid
    num = 2 * (prob * gt_v).sum(-1)
    den = prob.sum(-1) + gt_v.sum(-1)
    dice = 1 - (num + 1) / (den + 1)
    dice = dice * valid[:, 0]
    return loss_ce, dice.sum() / num_boxes


def match_predictions(
    pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, **cost_kw
):
    cost = match_cost(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, **cost_kw
    )
    match_q, _ = hungarian_match(cost)
    return match_q


def num_boxes_of(gt_valid: jax.Array) -> jax.Array:
    return jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)


def set_criterion(
    pred_logits: jax.Array,  # (B, Q, C)
    pred_boxes: jax.Array,  # (B, Q, 4)
    gt_labels: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    pred_masks: Optional[jax.Array] = None,  # (B, Q, Hm, Wm)
    gt_masks: Optional[jax.Array] = None,  # (B, G, H, W)
    mask_key: Optional[jax.Array] = None,
    weights: Optional[Dict[str, float]] = None,
    num_points: int = 12544,
    mask_embeds: Optional[jax.Array] = None,  # (B, Q, D) alternative to
    seg_feat: Optional[jax.Array] = None,     # pred_masks: matched masks
    seg_hw: Optional[Tuple[int, int]] = None,  # are computed post-match
) -> Dict[str, jax.Array]:
    """One decoder level's Hungarian-matched losses
    (TwoStageCriterion semantics)."""
    w = {
        "loss_class": 1.0,
        "loss_bbox": 5.0,
        "loss_giou": 2.0,
        "loss_mask": 1.0,
        "loss_dice": 1.0,
        **(weights or {}),
    }
    num_boxes = num_boxes_of(gt_valid)
    match_q = match_predictions(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid
    )
    losses = {}
    losses["loss_class"] = w["loss_class"] * class_loss(
        pred_logits, gt_labels, gt_valid, match_q, num_boxes
    )
    l1, giou = box_loss(pred_boxes, gt_boxes, gt_valid, match_q, num_boxes)
    losses["loss_bbox"] = w["loss_bbox"] * l1
    losses["loss_giou"] = w["loss_giou"] * giou
    if mask_embeds is not None and gt_masks is not None:
        # matched-queries-only mask product (round-5 memory fix): gather
        # the G matched embeddings FIRST, then one small einsum against
        # the seg features — bitwise the gather of the full (Q, Hm*Wm)
        # product (same per-query dot), but never materializes it
        # (~0.8 GB/layer at production shapes -> host-spill copies,
        # dev/logs/r5a_profile.log).
        h0, w0 = seg_hw
        matched_emb = jnp.take_along_axis(
            mask_embeds, match_q[..., None], axis=1
        )  # (B, G, D)
        matched_masks = jnp.einsum(
            "bgd,bsd->bgs", matched_emb, seg_feat,
            preferred_element_type=jnp.float32,
        ).reshape(*match_q.shape, h0, w0)
        ce, dice = point_sampled_mask_loss(
            matched_masks, gt_masks, gt_valid, num_boxes, mask_key,
            num_points=num_points,
        )
        losses["loss_mask"] = w["loss_mask"] * ce
        losses["loss_dice"] = w["loss_dice"] * dice
    elif pred_masks is not None and gt_masks is not None:
        matched_masks = jnp.take_along_axis(
            pred_masks, match_q[..., None, None], axis=1
        )
        ce, dice = point_sampled_mask_loss(
            matched_masks, gt_masks, gt_valid, num_boxes, mask_key,
            num_points=num_points,
        )
        losses["loss_mask"] = w["loss_mask"] * ce
        losses["loss_dice"] = w["loss_dice"] * dice
    return losses


def dn_criterion(
    pred_logits: jax.Array,  # (B, n_dn, C) CDN part
    pred_boxes: jax.Array,  # (B, n_dn, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    n_groups: int,
    weights: Optional[Dict[str, float]] = None,
) -> Dict[str, jax.Array]:
    """CDN losses (dn_criterion.py:23-137): within each group, query i is
    assigned GT i (positive half) and background (negative half)."""
    w = {"loss_class_dn": 1.0, "loss_bbox_dn": 5.0, "loss_giou_dn": 2.0,
         **(weights or {})}
    b, n_dn, c = pred_logits.shape
    g = gt_valid.shape[1]
    assert n_dn == 2 * g * n_groups, (n_dn, g, n_groups)
    num_boxes = num_boxes_of(gt_valid) * n_groups

    logits = pred_logits.reshape(b, n_groups, 2, g, c)
    boxes = pred_boxes.reshape(b, n_groups, 2, g, 4)
    pos_logits = logits[:, :, 0]
    neg_logits = logits[:, :, 1]
    pos_boxes = boxes[:, :, 0]

    valid = gt_valid[:, None, :].astype(jnp.float32)
    onehot_pos = (
        jax.nn.one_hot(gt_labels, c)[:, None] * valid[..., None]
    )
    loss_cls = (
        sigmoid_focal_loss(pos_logits.astype(jnp.float32), onehot_pos).sum()
        + sigmoid_focal_loss(
            neg_logits.astype(jnp.float32), jnp.zeros_like(onehot_pos)
        ).sum()
    ) / num_boxes

    l1 = jnp.sum(jnp.abs(pos_boxes - gt_boxes[:, None]), -1) * valid
    giou = (
        1.0
        - elementwise_giou(
            box_cxcywh_to_xyxy(pos_boxes),
            box_cxcywh_to_xyxy(jnp.broadcast_to(gt_boxes[:, None], pos_boxes.shape)),
        )
    ) * valid
    return {
        "loss_class_dn": w["loss_class_dn"] * loss_cls,
        "loss_bbox_dn": w["loss_bbox_dn"] * l1.sum() / num_boxes,
        "loss_giou_dn": w["loss_giou_dn"] * giou.sum() / num_boxes,
    }


def consistency_loss(
    student_queries: jax.Array,  # (B, Q, D) student pred query embeddings
    teacher_queries: jax.Array,  # (B, Qt, D) teacher query embeddings
    teacher_boxes: jax.Array,  # (B, Qt, 4) teacher boxes (for matching)
    student_boxes: jax.Array,  # (B, Q, 4)
    teacher_valid: jax.Array,  # (B, Qt) bool — teacher detections kept
) -> jax.Array:
    """vCLR consistency (ConsisCriterion.py:43-106): Hungarian-match student
    queries to teacher detections by box L1+GIoU, then 1 - cosine similarity
    between the matched embedding pairs."""
    bbox_cost = jnp.sum(
        jnp.abs(student_boxes[:, :, None] - teacher_boxes[:, None]), -1
    )
    giou_cost = -jax.vmap(
        lambda a, b: elementwise_giou(
            box_cxcywh_to_xyxy(a[:, None].repeat(b.shape[0], 1)),
            box_cxcywh_to_xyxy(jnp.broadcast_to(b[None], (a.shape[0],) + b.shape)),
        )
    )(student_boxes, teacher_boxes)
    cost = 5.0 * bbox_cost + 2.0 * giou_cost
    cost = jnp.where(teacher_valid[:, None, :], cost, 1e8)
    match_q, _ = hungarian_match(cost)
    matched = jnp.take_along_axis(student_queries, match_q[..., None], axis=1)
    s = matched / (jnp.linalg.norm(matched, axis=-1, keepdims=True) + 1e-8)
    t = teacher_queries / (
        jnp.linalg.norm(teacher_queries, axis=-1, keepdims=True) + 1e-8
    )
    cos = jnp.sum(s * t, -1)
    valid = teacher_valid.astype(jnp.float32)
    return ((1.0 - cos) * valid).sum() / jnp.maximum(valid.sum(), 1.0)

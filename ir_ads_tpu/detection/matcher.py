"""Hungarian matcher with focal class cost (reference detrex
modeling/matcher/matcher.py:37-164).

The assignment itself runs on host via jax.pure_callback to
scipy.optimize.linear_sum_assignment — the cost matrix is tiny
(queries x MAX_GT) and the solve is O(n^3) serial work the MXU can't help
with; everything before/after stays on device.  Padded GT slots carry +inf
cost and are assigned last; their matches are discarded by the validity
mask downstream.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from ir_ads_tpu.detection.box_ops import box_cxcywh_to_xyxy, generalized_box_iou


def _solve_batch(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """cost: (B, Q, G) -> row_idx, col_idx each (B, G)."""
    b, q, g = cost.shape
    rows = np.zeros((b, g), np.int32)
    cols = np.zeros((b, g), np.int32)
    for i in range(b):
        c = np.nan_to_num(cost[i], nan=1e8, posinf=1e8, neginf=-1e8)
        r, cl = linear_sum_assignment(c)
        rows[i, : len(r)] = r
        cols[i, : len(cl)] = cl
    return rows, cols


def hungarian_match(cost: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cost (B, Q, G) -> (query_idx (B, G), gt_idx (B, G)).

    Assumes G <= Q; every GT column is assigned one query row.
    """
    b, q, g = cost.shape
    out_shape = (
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        jax.ShapeDtypeStruct((b, g), jnp.int32),
    )
    # the assignment is non-differentiable (reference computes the cost
    # under no_grad, matcher.py:109); detach before the host callback
    cost = jax.lax.stop_gradient(cost)
    rows, cols = jax.pure_callback(_solve_batch, out_shape, cost)
    # reorder so entry j corresponds to gt j
    order = jnp.argsort(cols, axis=1)
    return jnp.take_along_axis(rows, order, axis=1), jnp.sort(cols, axis=1)


def match_cost(
    pred_logits: jax.Array,  # (B, Q, C)
    pred_boxes: jax.Array,  # (B, Q, 4) cxcywh in [0,1]
    gt_labels: jax.Array,  # (B, G) int (padded slots arbitrary)
    gt_boxes: jax.Array,  # (B, G, 4) cxcywh
    gt_valid: jax.Array,  # (B, G) bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Focal-class + L1 + GIoU matching cost (matcher.py:109-164).
    Invalid GT slots get a large constant cost."""
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    neg_cost = (1 - alpha) * prob**gamma * (-jnp.log(1 - prob + 1e-8))
    pos_cost = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    # (B, Q, G): gather per-gt class column
    cls_cost = jnp.take_along_axis(
        pos_cost - neg_cost, gt_labels[:, None, :], axis=2
    )

    bbox_cost = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1
    )
    giou_cost = -jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )
    cost = cost_class * cls_cost + cost_bbox * bbox_cost + cost_giou * giou_cost
    return jnp.where(gt_valid[:, None, :], cost, 1e8)


def dynamic_k_match(
    cost: jax.Array,  # (B, Q, G)
    ious: jax.Array,  # (B, Q, G) pred-gt IoUs
    gt_valid: jax.Array,  # (B, G)
    max_k: int = 10,
) -> jax.Array:
    """SimOTA-style dynamic-k assignment (reference
    HungarianMatcherDynamicK, DynamicKMatcher.py:6-204, unused there but
    shipped).  Each GT takes its dynamic_k = clip(round(sum of its top-10
    IoUs)) lowest-cost queries; query conflicts resolve to the
    lowest-cost GT.  Returns a (B, Q, G) bool assignment matrix."""

    def per_image(c, iou, gv):
        q, g = c.shape
        topk_iou = jax.lax.top_k(iou.T, min(max_k, q))[0]  # (G, k)
        dynamic_k = jnp.clip(
            jnp.round(topk_iou.sum(-1)).astype(jnp.int32), 1, max_k
        )
        # rank queries per gt by ascending cost
        order = jnp.argsort(c.T, axis=-1)  # (G, Q)
        ranks = jnp.argsort(order, axis=-1)  # rank of each query per gt
        assign = (ranks < dynamic_k[:, None]) & gv[:, None]  # (G, Q)
        assign = assign.T  # (Q, G)
        # resolve conflicts: a query matched to >1 gt keeps the cheapest
        best_gt = jnp.argmin(jnp.where(assign, c, 1e9), axis=-1)
        only_best = jax.nn.one_hot(best_gt, g, dtype=bool)
        return assign & only_best

    return jax.vmap(per_image)(cost, ious, gt_valid)

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
    """cost: (..., Q, G) -> row_idx, col_idx each (..., G).

    Rank-agnostic over leading dims so the callback vmaps (pure_callback
    with vmap_method='expand_dims' hands it an extra leading axis when
    the criterion is batched over decoder levels)."""
    lead, (q, g) = cost.shape[:-2], cost.shape[-2:]
    flat = np.asarray(cost).reshape(-1, q, g)
    b = flat.shape[0]
    rows = np.zeros((b, g), np.int32)
    cols = np.zeros((b, g), np.int32)
    for i in range(b):
        c = np.nan_to_num(flat[i], nan=1e8, posinf=1e8, neginf=-1e8)
        r, cl = linear_sum_assignment(c)
        rows[i, : len(r)] = r
        cols[i, : len(cl)] = cl
    return rows.reshape(*lead, g), cols.reshape(*lead, g)


def auction_match(
    cost: jax.Array, eps: float = 1e-3, max_iters: int = 200
) -> jax.Array:
    """Device-native assignment via the parallel Bertsekas auction.

    cost (B, Q, G), G <= Q; returns query index per gt (B, G).  eps-optimal:
    total cost within G*eps of the Hungarian optimum — indistinguishable for
    DETR matching, and it runs entirely on device (the host-callback
    Hungarian is unavailable on some TPU runtimes, e.g. relay-executed
    chips reject send/recv callbacks).
    """
    b, q, g = cost.shape
    benefit = -jax.lax.stop_gradient(cost).astype(jnp.float32)  # maximize

    gt_ids = jnp.arange(g)
    q_ids = jnp.arange(q)

    def solve_one(ben):  # ben: (Q, G) benefit
        val_t = ben.T  # (G, Q)

        def cond(state):
            _, assigned, it = state
            return (assigned < 0).any() & (it < max_iters)

        def body(state):
            prices, assigned, it = state
            value = val_t - prices[None, :]  # (G, Q)
            best = jnp.argmax(value, axis=1)  # (G,)
            top2 = jax.lax.top_k(value, 2)[0]
            bid = top2[:, 0] - top2[:, 1] + eps  # (G,)
            unassigned = assigned < 0

            # (G, Q) bid matrix: each unassigned gt bids on its best query
            bids = jnp.where(
                unassigned[:, None] & (q_ids[None, :] == best[:, None]),
                bid[:, None],
                -jnp.inf,
            )
            win_bid = bids.max(axis=0)  # (Q,)
            is_win = jnp.isfinite(bids) & (bids >= win_bid[None, :])
            # tie-break: lowest gt index
            first = jnp.argmax(is_win, axis=0)  # (Q,)
            winner = is_win & (gt_ids[:, None] == first[None, :])  # (G, Q)
            won_q = winner.any(axis=0)  # (Q,)

            # evict current holders of contested queries
            holds = assigned[:, None] == q_ids[None, :]
            evicted = (holds & won_q[None, :]).any(axis=1)
            assigned = jnp.where(evicted, -1, assigned)
            # record winners
            won_gt = winner.any(axis=1)
            new_q = (winner * q_ids[None, :]).sum(axis=1)
            assigned = jnp.where(won_gt, new_q, assigned)
            prices = prices + jnp.where(
                won_q, (winner * bid[:, None]).sum(axis=0), 0.0
            )
            return prices, assigned, it + 1

        _, assigned, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((q,), jnp.float32),
                         jnp.full((g,), -1, jnp.int32), 0)
        )
        # safety net for max_iters exhaustion: greedy over free queries
        taken = (assigned[:, None] == q_ids[None, :]).any(axis=0)
        fallback = jnp.argmax(
            jnp.where(taken[None, :], -jnp.inf, val_t), axis=1
        ).astype(jnp.int32)
        return jnp.where(assigned >= 0, assigned, fallback)

    return jax.vmap(solve_one)(benefit)


def hungarian_match(
    cost: jax.Array, impl: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """cost (B, Q, G) -> (query_idx (B, G), gt_idx (B, G)).

    Assumes G <= Q; every GT column is assigned one query row.
    impl: 'callback' (exact scipy on host), 'auction' (on-device
    eps-optimal), or 'auto' (callback on CPU, auction on accelerators —
    some TPU runtimes don't support host callbacks).
    """
    b, q, g = cost.shape
    if impl == "auto":
        impl = "callback" if jax.default_backend() == "cpu" else "auction"
    if impl == "auction":
        rows = auction_match(cost)
        cols = jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32), (b, g))
        return rows, cols
    out_shape = (
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        jax.ShapeDtypeStruct((b, g), jnp.int32),
    )
    # the assignment is non-differentiable (reference computes the cost
    # under no_grad, matcher.py:109); detach before the host callback
    cost = jax.lax.stop_gradient(cost)
    rows, cols = jax.pure_callback(
        _solve_batch, out_shape, cost, vmap_method="expand_dims"
    )
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

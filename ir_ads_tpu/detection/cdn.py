"""Contrastive denoising (CDN) query generation, static-shape.

Reference: prepare_for_cdn (projects/.../modeling/dino.py:983-1127).  The
torch version sizes the DN groups from the batch's max GT count at runtime;
under XLA we pad GT to a static MAX_GT and fix
``n_groups = max(1, dn_number // MAX_GT)`` (dn_number counts positive
queries as in the reference's `dn_number * 2 // (2 * max_gt)`), so the
query layout is [group_0 pos | group_0 neg | group_1 pos | ...] with padded
slots zeroed and masked out of the loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.detection.box_ops import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh
from ir_ads_tpu.detection.transformer import inverse_sigmoid


def cdn_groups(dn_number: int, max_gt: int) -> int:
    return max(1, dn_number // max(max_gt, 1))


def make_cdn_attn_mask(max_gt: int, n_groups: int, num_queries: int) -> np.ndarray:
    """(tgt, tgt) bool, True = masked (dino.py:1102-1127): matching queries
    can't see DN queries; DN groups can't see each other."""
    pad = 2 * max_gt * n_groups
    tgt = pad + num_queries
    mask = np.zeros((tgt, tgt), bool)
    mask[pad:, :pad] = True
    gs = 2 * max_gt
    for i in range(n_groups):
        mask[gs * i : gs * (i + 1), gs * (i + 1) : pad] = True
        mask[gs * i : gs * (i + 1), : gs * i] = True
    return mask


def generate_cdn_queries(
    gt_labels: jax.Array,  # (B, G)
    gt_boxes: jax.Array,  # (B, G, 4) cxcywh in [0,1]
    gt_valid: jax.Array,  # (B, G)
    label_embed: jax.Array,  # (num_classes, C) label encoder table
    key: jax.Array,
    n_groups: int,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
    num_classes: int = 80,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (dn_query_embeds (B, 2*G*n_groups, C),
    dn_ref_boxes_unsigmoided (B, 2*G*n_groups, 4)).

    Layout per group: [G positives | G negatives]."""
    b, g = gt_labels.shape
    k_label, k_sign, k_part = jax.random.split(key, 3)

    # tile GT across groups x {pos, neg}
    labels = jnp.tile(gt_labels[:, None, None, :], (1, n_groups, 2, 1))
    boxes = jnp.tile(gt_boxes[:, None, None, :, :], (1, n_groups, 2, 1, 1))

    # label noise: flip to a random class with prob ratio/2 (dino.py:1036-1044)
    p = jax.random.uniform(k_label, labels.shape)
    rand_label = jax.random.randint(k_label, labels.shape, 0, num_classes)
    noised_labels = jnp.where(p < label_noise_ratio * 0.5, rand_label, labels)

    # box noise in xyxy corners; negatives get shift in [1, 2) x half-extent
    xyxy = box_cxcywh_to_xyxy(boxes)
    half = jnp.concatenate([boxes[..., 2:] / 2, boxes[..., 2:] / 2], axis=-1)
    sign = jax.random.randint(k_sign, xyxy.shape, 0, 2).astype(jnp.float32) * 2 - 1
    part = jax.random.uniform(k_part, xyxy.shape)
    is_neg = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 1].set(1.0)
    part = part + is_neg
    noised = jnp.clip(xyxy + sign * part * half * box_noise_scale, 0.0, 1.0)
    noised_boxes = box_xyxy_to_cxcywh(noised)

    query = label_embed[noised_labels]  # (B, groups, 2, G, C)
    refs = inverse_sigmoid(noised_boxes)

    # zero out padded GT slots
    v = gt_valid[:, None, None, :, None].astype(query.dtype)
    query = query * v
    refs = jnp.where(v > 0, refs, 0.0)

    c = query.shape[-1]
    return (
        query.reshape(b, n_groups * 2 * g, c),
        refs.reshape(b, n_groups * 2 * g, 4),
    )

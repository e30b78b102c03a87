"""PointSup: point-supervised instance segmentation loss.

Reference: detectron2/projects/PointSup/point_sup/point_utils.py
(get_point_coords_from_point_annotation :7-52, get_point_coords_wrt_box
:55-78) and mask_head.py (MaskRCNNConvUpsamplePointSupHead.forward :31-68:
sample mask logits at annotated points, BCE only on labeled points).

Point labels: 0 = background, 1 = object, -1 = ignored (outside the
proposal box).  Reuses the PointRend bilinear point sampler already in
ir_ads_tpu/detection/criterion.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ir_ads_tpu.detection.criterion import _sample_points_bilinear


def get_point_coords_wrt_box(
    boxes: jax.Array, point_coords: jax.Array
) -> jax.Array:
    """Image-absolute (R, P, 2) (x, y) points -> box-normalized [0,1]^2
    (point_utils.py:55-78).  boxes: (R, 4) xyxy."""
    x0, y0, x1, y1 = (boxes[:, i : i + 1] for i in range(4))
    px = (point_coords[..., 0] - x0) / jnp.maximum(x1 - x0, 1e-6)
    py = (point_coords[..., 1] - y0) / jnp.maximum(y1 - y0, 1e-6)
    return jnp.stack([px, py], axis=-1)


def annotation_points_to_labels(
    boxes: jax.Array, point_coords: jax.Array, point_labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Convert image-space annotated points to box space and mark points
    falling outside the box as ignored (-1)
    (point_utils.py get_point_coords_from_point_annotation :7-52)."""
    coords = get_point_coords_wrt_box(boxes, point_coords)
    outside = (
        (coords[..., 0] < 0) | (coords[..., 0] > 1)
        | (coords[..., 1] < 0) | (coords[..., 1] > 1)
    )
    labels = jnp.where(outside, -1.0, point_labels.astype(jnp.float32))
    return coords, labels


def point_sup_mask_loss(
    mask_logits: jax.Array,
    point_coords: jax.Array,
    point_labels: jax.Array,
) -> jax.Array:
    """BCE between mask logits sampled at the annotated points and the point
    labels, ignoring label -1 (mask_head.py:31-68 `roi_mask_point_loss`).

    mask_logits: (R, Hm, Wm) per-instance mask logits (box space),
    point_coords: (R, P, 2) in [0, 1]^2 (x, y), point_labels: (R, P).
    """
    logits = _sample_points_bilinear(
        mask_logits.astype(jnp.float32), point_coords
    )
    labels = point_labels.astype(jnp.float32)
    weight = (labels >= 0).astype(jnp.float32)
    tgt = jnp.clip(labels, 0.0, 1.0)
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * tgt
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(bce * weight) / jnp.maximum(jnp.sum(weight), 1.0)

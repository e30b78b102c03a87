"""Box utilities (reference detrex/layers/box_ops.py:28-145)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jax.Array) -> jax.Array:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a: jax.Array, b: jax.Array):
    """Pairwise IoU: a (N, 4), b (M, 4) xyxy -> (iou (N, M), union (N, M))."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise GIoU, xyxy."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def elementwise_giou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise GIoU for matched pairs, xyxy (..., 4)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt_c = jnp.minimum(a[..., :2], b[..., :2])
    rb_c = jnp.maximum(a[..., 2:], b[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-9)


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """(N, H, W) bool -> (N, 4) xyxy (reference modeling/misc.py)."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    empty = m.sum((1, 2)) == 0
    out = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(empty[:, None], 0.0, out)

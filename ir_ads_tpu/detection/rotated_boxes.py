"""Rotated-box ops + ROI align: TPU-native equivalents of detectron2's CUDA
kernels (reference detectron2/.../csrc/{box_iou_rotated,nms_rotated,
ROIAlignRotated}/ — SURVEY.md §2.6).

Boxes are (cx, cy, w, h, angle_degrees) with d2's convention: angle is CCW.
Rotated IoU uses exact convex-polygon clipping (Sutherland–Hodgman) with
static vertex counts — quad∩quad has at most 8 vertices, so everything is
fixed-shape and jit/vmap-friendly.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ir_ads_tpu.ops.grid_sample import grid_sample

MAX_VERTS = 16  # >= 8; padded polygon buffer


def box_to_corners(boxes: jax.Array) -> jax.Array:
    """(N, 5) -> (N, 4, 2) corner points (CCW)."""
    cx, cy, w, h, ang = jnp.split(boxes, 5, axis=-1)
    theta = ang * (math.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = jnp.concatenate([-w, w, w, -w], -1) * 0.5  # (N, 4)
    dy = jnp.concatenate([-h, -h, h, h], -1) * 0.5
    x = cx + dx * c - dy * s
    y = cy + dx * s + dy * c
    return jnp.stack([x, y], axis=-1)


def _polygon_area(verts: jax.Array, valid: jax.Array) -> jax.Array:
    """Shoelace over the valid prefix; verts (MAX, 2), valid (MAX,)."""
    n = valid.sum()
    idx = jnp.arange(MAX_VERTS)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    x, y = verts[:, 0], verts[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    cross = jnp.where(idx < n, cross, 0.0)
    return 0.5 * jnp.abs(cross.sum())


def _clip_halfplane(verts, n, a, b):
    """Clip polygon (verts, n valid) by the half-plane left of edge a->b."""
    edge = b - a
    idx = jnp.arange(MAX_VERTS)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    cur = verts
    nx = verts[nxt]

    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_nxt = side(nx)
    inside_cur = s_cur >= 0
    inside_nxt = s_nxt >= 0

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nx - cur)

    # per input edge emit up to 2 points: cur (if inside), inter (if crossing)
    emit_cur = inside_cur & (idx < n)
    emit_int = (inside_cur != inside_nxt) & (idx < n)

    pts = jnp.concatenate([cur, inter], axis=0)  # (2*MAX, 2)
    emit = jnp.concatenate([emit_cur, emit_int], axis=0)
    order = jnp.concatenate([2 * idx, 2 * idx + 1], axis=0)  # interleave

    # compact: stable sort by (not emitted, order)
    key = jnp.where(emit, order, 10_000 + order)
    perm = jnp.argsort(key)
    pts = pts[perm][:MAX_VERTS]
    new_n = jnp.minimum(emit.sum(), MAX_VERTS)
    return pts, new_n


def _pair_intersection_area(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Intersection area of two quads given corners (4, 2) each."""
    verts = jnp.zeros((MAX_VERTS, 2)).at[:4].set(c1)
    n = jnp.asarray(4)

    def body(i, carry):
        verts, n = carry
        a = c2[i]
        b = c2[(i + 1) % 4]
        return _clip_halfplane(verts, n, a, b)

    for i in range(4):
        verts, n = body(i, (verts, n))
    valid = jnp.arange(MAX_VERTS) < n
    return jnp.where(n >= 3, _polygon_area(verts, valid), 0.0)


def box_iou_rotated(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise rotated IoU: (N, 5) x (M, 5) -> (N, M)."""
    c1 = box_to_corners(boxes1)
    c2 = box_to_corners(boxes2)
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]
    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(c2)
    )(c1)
    union = area1[:, None] + area2[None] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_rotated(
    boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5
) -> jax.Array:
    """Greedy rotated NMS; returns keep mask ordered by original index
    (reference csrc/nms_rotated)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = box_iou_rotated(sorted_boxes, sorted_boxes)

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & keep[i] & (jnp.arange(n) > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def roi_align(
    features: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (R, 5): (batch_idx, x1, y1, x2, y2) in input coords
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """ROIAlign (d2 layers/roi_align.py semantics, aligned=True)."""
    oh, ow = output_size
    b, h, w, c = features.shape
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 1] * spatial_scale - offset
    y1 = boxes[:, 2] * spatial_scale - offset
    x2 = boxes[:, 3] * spatial_scale - offset
    y2 = boxes[:, 4] * spatial_scale - offset
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)

    sr = sampling_ratio
    # sample grid: oh*sr x ow*sr points per roi
    ys = (jnp.arange(oh * sr) + 0.5) / sr  # bin-relative
    xs = (jnp.arange(ow * sr) + 0.5) / sr
    gy = y1[:, None] + roi_h[:, None] * ys[None] / oh  # (R, oh*sr)
    gx = x1[:, None] + roi_w[:, None] * xs[None] / ow

    # normalize to [-1, 1] (align_corners=True on pixel centers)
    ny = gy / jnp.maximum(h - 1, 1) * 2 - 1
    nx = gx / jnp.maximum(w - 1, 1) * 2 - 1
    grid = jnp.stack(
        [jnp.broadcast_to(nx[:, None, :], (nx.shape[0], ny.shape[1], nx.shape[1])),
         jnp.broadcast_to(ny[:, :, None], (ny.shape[0], ny.shape[1], nx.shape[1]))],
        axis=-1,
    )  # (R, oh*sr, ow*sr, 2) as (x, y)

    batch_idx = boxes[:, 0].astype(jnp.int32)
    per_roi_feats = features[batch_idx]  # (R, H, W, C)
    sampled = grid_sample(per_roi_feats, grid, align_corners=True)
    sampled = sampled.reshape(-1, oh, sr, ow, sr, c)
    return sampled.mean((2, 4))


def roi_align_rotated(
    features: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (R, 6): (batch_idx, cx, cy, w, h, angle_deg)
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jax.Array:
    """ROIAlignRotated (reference csrc/ROIAlignRotated)."""
    oh, ow = output_size
    b, h, w, c = features.shape
    cx = boxes[:, 1] * spatial_scale - 0.5
    cy = boxes[:, 2] * spatial_scale - 0.5
    rw = boxes[:, 3] * spatial_scale
    rh = boxes[:, 4] * spatial_scale
    theta = boxes[:, 5] * (math.pi / 180.0)

    sr = sampling_ratio
    ys = ((jnp.arange(oh * sr) + 0.5) / (oh * sr) - 0.5)  # [-.5, .5)
    xs = ((jnp.arange(ow * sr) + 0.5) / (ow * sr) - 0.5)
    ly = rh[:, None, None] * ys[None, :, None]
    lx = rw[:, None, None] * xs[None, None, :]
    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]
    gx = cx[:, None, None] + lx * cos_t - ly * sin_t
    gy = cy[:, None, None] + lx * sin_t + ly * cos_t

    nx = gx / jnp.maximum(w - 1, 1) * 2 - 1
    ny = gy / jnp.maximum(h - 1, 1) * 2 - 1
    grid = jnp.stack([nx, ny], axis=-1)
    batch_idx = boxes[:, 0].astype(jnp.int32)
    sampled = grid_sample(features[batch_idx], grid, align_corners=True)
    return sampled.reshape(-1, oh, sr, ow, sr, features.shape[-1]).mean((2, 4))

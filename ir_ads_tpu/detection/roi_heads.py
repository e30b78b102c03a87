"""Mask R-CNN family ROI heads: mask head, keypoint head, mask pasting.

TPU-native forms of the detectron2 ROI-head components:
  * MaskHead      == MaskRCNNConvUpsampleHead
                     (detectron2/modeling/roi_heads/mask_head.py:215-291)
  * mask_rcnn_loss / mask_rcnn_inference (mask_head.py:33-142)
  * KeypointHead  == KRCNNConvDeconvUpsampleHead
                     (detectron2/modeling/roi_heads/keypoint_head.py:218-271)
  * keypoints_to_heatmap (structures/keypoints.py:105-162)
  * keypoint_rcnn_loss (keypoint_head.py:40-97)
  * heatmaps_to_keypoints (structures/keypoints.py:165-239) — TPU redesign:
    the reference bicubically resizes each ROI heatmap to its own pixel size
    before the argmax (dynamic shapes); here the argmax runs on the SxS grid
    and is mapped to image coordinates with the same Heckbert half-pixel
    convention.  Sub-heatmap-cell localization refinement is intentionally
    not replicated (documented deviation; scores use the same
    pool-resolution softmax normalization as the reference).
  * paste_masks_in_image (detectron2/layers/mask_ops.py:68-135) — vectorized
    static-shape version (every mask pasted via an affine sampling grid).

Everything is static-shape: R proposals per image, invalid slots carried as
weight 0 — the reference's dynamic instance lists don't compile on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.detection.rotated_boxes import roi_align

Dtype = Any


# --------------------------------------------------------------------- masks
class MaskHead(nn.Module):
    """4x [conv3x3 + relu] -> deconv2x2 stride 2 + relu -> 1x1 predictor
    (MaskRCNNConvUpsampleHead, mask_head.py:215-291; default conv_dims
    [256]*5, class-specific predictor)."""

    num_classes: int
    conv_dim: int = 256
    num_conv: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (R, S, S, C) pooled ROI features -> (R, 2S, 2S, num_classes)."""
        for i in range(self.num_conv):
            x = nn.Conv(
                self.conv_dim, (3, 3), padding=1,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"
                ),
                dtype=self.dtype, name=f"mask_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.conv_dim, (2, 2), strides=(2, 2),
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            dtype=self.dtype, name="deconv",
        )(x)
        x = nn.relu(x)
        return nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="predictor",
        )(x)


def crop_and_resize_masks(
    gt_masks: jax.Array,  # (M, H, W) float/bool bitmasks, image resolution
    boxes: jax.Array,  # (R, 4) xyxy image coords
    matched_idx: jax.Array,  # (R,) int32 gt index per proposal
    mask_size: int,
) -> jax.Array:
    """BitMasks.crop_and_resize (structures/masks.py): crop each matched gt
    mask by its proposal box and resample to (mask_size, mask_size).
    Returns (R, S, S) float targets in [0, 1]."""
    m, h, w = gt_masks.shape
    r = boxes.shape[0]
    feats = gt_masks.astype(jnp.float32).transpose(1, 2, 0)[None]  # (1,H,W,M)
    rois = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.float32), boxes.astype(jnp.float32)], -1
    )
    pooled = roi_align(feats, rois, (mask_size, mask_size), 1.0)  # (R,S,S,M)
    return jnp.take_along_axis(
        pooled, matched_idx[:, None, None, None], axis=-1
    )[..., 0]


def mask_rcnn_loss(
    mask_logits: jax.Array,  # (R, S, S, num_classes)
    gt_classes: jax.Array,  # (R,) int32 foreground class per proposal
    mask_targets: jax.Array,  # (R, S, S) float in [0, 1]
    fg_weight: jax.Array,  # (R,) 1.0 for foreground proposals, else 0.0
) -> jax.Array:
    """Per-pixel BCE on the matched class channel, averaged over all pixels
    of foreground proposals (mask_rcnn_loss, mask_head.py:33-112)."""
    r, s, _, c = mask_logits.shape
    logits = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        gt_classes[:, None, None, None],
        axis=-1,
    )[..., 0]
    tgt = (mask_targets > 0.5).astype(jnp.float32)
    per_pix = jnp.maximum(logits, 0) - logits * tgt + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    per_roi = per_pix.mean((1, 2))
    denom = jnp.maximum(fg_weight.sum(), 1.0)
    return (per_roi * fg_weight).sum() / denom


def mask_rcnn_inference(
    mask_logits: jax.Array,  # (R, S, S, num_classes)
    pred_classes: jax.Array,  # (R,) int32
) -> jax.Array:
    """Sigmoid of the predicted class' channel (mask_head.py:115-142)."""
    sel = jnp.take_along_axis(
        mask_logits, pred_classes[:, None, None, None], axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel.astype(jnp.float32))


def paste_masks_in_image(
    masks: jax.Array,  # (R, S, S) probabilities
    boxes: jax.Array,  # (R, 4) xyxy image coords
    image_size: Tuple[int, int],
    threshold: float = 0.5,
) -> jax.Array:
    """Paste each SxS ROI mask into the image (mask_ops.py:68-135 semantics,
    _do_paste_mask grid-sampling).  Returns (R, H, W) bool."""
    h, w = image_size
    r, s, _ = masks.shape
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    img_x = jnp.arange(w, dtype=jnp.float32) + 0.5
    img_y = jnp.arange(h, dtype=jnp.float32) + 0.5
    # normalized coords of each image pixel inside the box, in [-1, 1]
    gx = (img_x[None] - x1[:, None]) / jnp.maximum(x2 - x1, 1e-6)[:, None] * 2 - 1
    gy = (img_y[None] - y1[:, None]) / jnp.maximum(y2 - y1, 1e-6)[:, None] * 2 - 1
    # bilinear sample mask at (gy, gx) — align_corners=False convention:
    # mask pixel centers at (i + 0.5) / S * 2 - 1
    fx = (gx + 1.0) * s / 2.0 - 0.5
    fy = (gy + 1.0) * s / 2.0 - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    iy0 = jnp.clip(y0, 0, s - 1).astype(jnp.int32)  # (R, H)
    iy1 = jnp.clip(y0 + 1, 0, s - 1).astype(jnp.int32)
    ix0 = jnp.clip(x0, 0, s - 1).astype(jnp.int32)  # (R, W)
    ix1 = jnp.clip(x0 + 1, 0, s - 1).astype(jnp.int32)

    def one(mask, a0, a1, b0, b1, wyi, wxi, fyi, fxi):
        m00 = mask[a0[:, None], b0[None, :]]
        m01 = mask[a0[:, None], b1[None, :]]
        m10 = mask[a1[:, None], b0[None, :]]
        m11 = mask[a1[:, None], b1[None, :]]
        top = m00 * (1 - wxi[None, :]) + m01 * wxi[None, :]
        bot = m10 * (1 - wxi[None, :]) + m11 * wxi[None, :]
        out = top * (1 - wyi[:, None]) + bot * wyi[:, None]
        valid = ((fyi >= -1.0) & (fyi <= s))[:, None] & (
            (fxi >= -1.0) & (fxi <= s)
        )[None, :]
        return jnp.where(valid, out, 0.0)

    pasted = jax.vmap(one)(masks, iy0, iy1, ix0, ix1, wy1, wx1, fy, fx)
    return pasted > threshold


# ----------------------------------------------------------------- keypoints
class KeypointHead(nn.Module):
    """8x [conv3x3(512) + relu] -> deconv4x4 stride 2 -> 2x bilinear upsample
    (KRCNNConvDeconvUpsampleHead, keypoint_head.py:218-271)."""

    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (R, S, S, C) -> (R, 4S, 4S, K) spatial logits."""
        kaiming = nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"
        )
        for i, d in enumerate(self.conv_dims, 1):
            x = nn.Conv(
                d, (3, 3), padding=1, kernel_init=kaiming,
                dtype=self.dtype, name=f"conv_fcn{i}",
            )(x)
            x = nn.relu(x)
        # torch ConvTranspose2d(k=4, s=2, p=1) == exact 2x upsample; flax
        # padding="SAME" gives the same in*stride output extent
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=kaiming, dtype=self.dtype, name="score_lowres",
        )(x)
        r, h, w, k = x.shape
        x = jax.image.resize(
            x.astype(jnp.float32), (r, 2 * h, 2 * w, k), method="bilinear"
        )
        return x


def keypoints_to_heatmap(
    keypoints: jax.Array,  # (R, K, 3) (x, y, vis)
    rois: jax.Array,  # (R, 4) xyxy
    heatmap_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """structures/keypoints.py:105-162 exactly (Heckbert convention)."""
    x1, y1, x2, y2 = (rois[:, i] for i in range(4))
    scale_x = heatmap_size / jnp.maximum(x2 - x1, 1e-6)
    scale_y = heatmap_size / jnp.maximum(y2 - y1, 1e-6)
    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = x == x2[:, None]
    y_boundary = y == y2[:, None]
    xi = jnp.floor((x - x1[:, None]) * scale_x[:, None]).astype(jnp.int32)
    yi = jnp.floor((y - y1[:, None]) * scale_y[:, None]).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)
    valid_loc = (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)
    lin = (yi * heatmap_size + xi) * valid
    return lin, valid


def keypoint_rcnn_loss(
    keypoint_logits: jax.Array,  # (R, S, S, K)
    gt_keypoints: jax.Array,  # (R, K, 3)
    rois: jax.Array,  # (R, 4)
    fg_weight: jax.Array,  # (R,)
    normalizer: Optional[float] = None,
) -> jax.Array:
    """Softmax CE over the S*S spatial positions per visible keypoint
    (keypoint_head.py:40-97)."""
    r, s, _, k = keypoint_logits.shape
    targets, valid = keypoints_to_heatmap(gt_keypoints, rois, s)
    valid = valid.astype(jnp.float32) * fg_weight[:, None]
    logits = keypoint_logits.astype(jnp.float32).transpose(0, 3, 1, 2)
    logits = logits.reshape(r * k, s * s)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets.reshape(r * k, 1), axis=-1)[:, 0]
    ce = ce * valid.reshape(r * k)
    denom = normalizer if normalizer is not None else jnp.maximum(
        valid.sum(), 1.0
    )
    return ce.sum() / denom


def heatmaps_to_keypoints(
    keypoint_logits: jax.Array,  # (R, S, S, K)
    rois: jax.Array,  # (R, 4)
) -> jax.Array:
    """(R, K, 4) of (x, y, logit, score).  Argmax at heatmap resolution (see
    module docstring for the documented deviation from the per-ROI bicubic
    resize in structures/keypoints.py:165-239)."""
    r, s, _, k = keypoint_logits.shape
    maps = keypoint_logits.astype(jnp.float32).transpose(0, 3, 1, 2)
    flat = maps.reshape(r, k, s * s)
    pos = jnp.argmax(flat, axis=-1)
    max_logit = jnp.max(flat, axis=-1)
    scores = jax.nn.softmax(flat, axis=-1)
    score = jnp.take_along_axis(scores, pos[..., None], axis=-1)[..., 0]
    xi = (pos % s).astype(jnp.float32)
    yi = (pos // s).astype(jnp.float32)
    x1, y1, x2, y2 = (rois[:, i] for i in range(4))
    wpr = jnp.maximum(x2 - x1, 1.0)
    hpr = jnp.maximum(y2 - y1, 1.0)
    x = x1[:, None] + (xi + 0.5) * wpr[:, None] / s
    y = y1[:, None] + (yi + 0.5) * hpr[:, None] / s
    return jnp.stack([x, y, max_logit, score], axis=-1)

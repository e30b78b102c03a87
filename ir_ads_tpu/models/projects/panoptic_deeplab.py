"""Panoptic-DeepLab heads + device-native panoptic post-processing.

Reference: detectron2/projects/Panoptic-DeepLab/panoptic_deeplab/
panoptic_seg.py (PanopticDeepLabSemSegHead :225-345,
PanopticDeepLabInsEmbedHead :370-520) and post_processing.py
(find_instance_center :9-41, group_pixels :44-77,
merge_semantic_and_instance :113-161, get_panoptic_segmentation :164-234).

TPU-native re-design: the reference post-processing is a host loop over
``torch.unique`` instance ids; here everything is static-shape device code —
centers are a fixed top-k with a validity mask, per-instance majority voting
is a one-hot matmul (K x HW @ HW x C on the MXU), and per-class instance
renumbering is a K x K comparison prefix-sum.  Results match the reference
pixel-for-pixel on the same inputs (tested).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.models.projects.deeplab import (
    DeepLabV3PlusHead,
    _conv_bn_relu,
    deeplab_ce_loss,
)
from ir_ads_tpu.ops.layers import resize_bilinear

Dtype = Any


class PanopticDeepLabSemSegHead(nn.Module):
    """DeepLabV3+ decoder + 2-conv head + predictor (panoptic_seg.py:225-345).
    Loss: hard-pixel-mining CE (loss_top_k, default 0.2) with optional
    per-pixel weights."""

    num_classes: int
    head_channels: int = 256
    project_channels: Sequence[int] = (32, 64)
    decoder_channels: Sequence[int] = (256, 256, 256)
    common_stride: int = 4
    use_depthwise_separable_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features, train: bool = False) -> jax.Array:
        y = DeepLabV3PlusHead(
            num_classes=None,
            project_channels=self.project_channels,
            decoder_channels=self.decoder_channels,
            use_depthwise_separable_conv=self.use_depthwise_separable_conv,
            dtype=self.dtype,
            name="decoder",
        )(features, train)
        y = _conv_bn_relu(y, y.shape[-1], 3, "head_a", self.dtype, train)
        y = _conv_bn_relu(y, self.head_channels, 3, "head_b", self.dtype, train)
        y = nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="predictor",
        )(y)
        if not train:
            h = y.shape[1] * self.common_stride
            w = y.shape[2] * self.common_stride
            y = resize_bilinear(y, (h, w), align_corners=False)
        return y


class PanopticDeepLabInsEmbedHead(nn.Module):
    """Instance embedding branch (panoptic_seg.py:370-520): shared DeepLabV3+
    decoder, then a center-heatmap head (1 ch) and an offset head (2 ch,
    (dy, dx) to the instance center)."""

    head_channels: int = 32
    project_channels: Sequence[int] = (32, 64)
    decoder_channels: Sequence[int] = (128, 128, 128)
    common_stride: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, features, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        y = DeepLabV3PlusHead(
            num_classes=None,
            project_channels=self.project_channels,
            decoder_channels=self.decoder_channels,
            dtype=self.dtype,
            name="decoder",
        )(features, train)
        c = _conv_bn_relu(y, y.shape[-1], 3, "center_a", self.dtype, train)
        c = _conv_bn_relu(c, self.head_channels, 3, "center_b", self.dtype, train)
        center = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="center_predictor",
        )(c)
        o = _conv_bn_relu(y, y.shape[-1], 3, "offset_a", self.dtype, train)
        o = _conv_bn_relu(o, self.head_channels, 3, "offset_b", self.dtype, train)
        offset = nn.Conv(
            2, (1, 1), kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="offset_predictor",
        )(o)
        if not train:
            h = center.shape[1] * self.common_stride
            w = center.shape[2] * self.common_stride
            center = resize_bilinear(center, (h, w), align_corners=False)
            # offsets are in pixels at the output stride: rescale magnitudes
            offset = resize_bilinear(offset, (h, w), align_corners=False)
            offset = offset * float(self.common_stride)
        return center, offset


def panoptic_deeplab_losses(
    sem_logits: jax.Array,
    center_pred: jax.Array,
    offset_pred: jax.Array,
    sem_target: jax.Array,
    center_target: jax.Array,
    offset_target: jax.Array,
    *,
    sem_weights: Optional[jax.Array] = None,
    center_weights: Optional[jax.Array] = None,
    offset_weights: Optional[jax.Array] = None,
    ignore_label: int = 255,
    loss_top_k: float = 0.2,
    sem_weight: float = 1.0,
    center_weight: float = 200.0,
    offset_weight: float = 0.01,
) -> dict:
    """The three Panoptic-DeepLab losses (panoptic_seg.py: sem = DeepLabCE,
    center = weighted MSE, offset = weighted L1; weights from train_net.py
    defaults 1.0 / 200.0 / 0.01)."""
    losses = {
        "loss_sem_seg": sem_weight
        * deeplab_ce_loss(
            sem_logits, sem_target, ignore_label, loss_top_k, sem_weights
        )
    }
    # reference normalization (panoptic_seg.py:551-571): divide by
    # weights.sum() (NOT the count of non-zero weights — they differ for
    # non-binary per-pixel weights), zero loss when the weights sum to 0.
    cw = jnp.ones_like(center_target) if center_weights is None else center_weights
    mse = (center_pred[..., 0].astype(jnp.float32) - center_target) ** 2 * cw
    cw_sum = jnp.sum(cw)
    losses["loss_center"] = center_weight * jnp.where(
        cw_sum > 0, jnp.sum(mse) / jnp.maximum(cw_sum, 1e-12), 0.0
    )
    ow = jnp.ones_like(offset_target[..., 0]) if offset_weights is None else offset_weights
    l1 = jnp.sum(
        jnp.abs(offset_pred.astype(jnp.float32) - offset_target), axis=-1
    ) * ow
    ow_sum = jnp.sum(ow)
    losses["loss_offset"] = offset_weight * jnp.where(
        ow_sum > 0, jnp.sum(l1) / jnp.maximum(ow_sum, 1e-12), 0.0
    )
    return losses


def find_instance_center(
    center_heatmap: jax.Array,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
) -> Tuple[jax.Array, jax.Array]:
    """Centers = local maxima of the heatmap (post_processing.py:9-41).

    center_heatmap: (H, W).  Returns ((top_k, 2) int32 (y, x), (top_k,) bool
    validity) — static shapes; invalid slots are masked downstream rather
    than dropped (the reference's dynamic ``torch.nonzero``)."""
    h, w = center_heatmap.shape
    x = jnp.where(center_heatmap > threshold, center_heatmap, -1.0)
    pad = (nms_kernel - 1) // 2
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (nms_kernel, nms_kernel), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    x = jnp.where(x == pooled, x, -1.0)
    flat = x.reshape(-1)
    scores, idx = jax.lax.top_k(flat, top_k)
    valid = scores > 0
    return jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.int32), valid


def group_pixels(
    centers: jax.Array, valid: jax.Array, offsets: jax.Array
) -> jax.Array:
    """Assign each pixel the id (1..K) of its nearest regressed center
    (post_processing.py:44-77).  offsets: (H, W, 2) with (dy, dx)."""
    h, w, _ = offsets.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    coord = jnp.stack([yy, xx], axis=-1).astype(jnp.float32) + offsets
    # (K, H, W) squared distances; mask invalid centers to +inf
    d2 = jnp.sum(
        (coord[None] - centers[:, None, None].astype(jnp.float32)) ** 2, axis=-1
    )
    d2 = jnp.where(valid[:, None, None], d2, jnp.inf)
    return jnp.argmin(d2, axis=0).astype(jnp.int32) + 1


def merge_semantic_and_instance(
    sem_seg: jax.Array,
    ins_seg: jax.Array,
    thing_seg: jax.Array,
    num_classes: int,
    num_instances: int,
    thing_mask_per_class: jax.Array,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = -1,
) -> jax.Array:
    """Static-shape merge (post_processing.py:113-161).

    Majority vote per instance via one-hot matmul; stuff pasted where no
    instance lives and area >= stuff_area.  ``thing_mask_per_class`` is a
    (num_classes,) bool marking thing categories."""
    h, w = sem_seg.shape
    is_thing = (ins_seg > 0) & (thing_seg > 0)
    ins_eff = jnp.where(is_thing, ins_seg, 0)

    # per-instance class histogram restricted to thing pixels: (K+1, C)
    ins_onehot = jax.nn.one_hot(
        ins_eff.reshape(-1), num_instances + 1, dtype=jnp.float32
    )
    sem_onehot = jax.nn.one_hot(
        sem_seg.reshape(-1), num_classes, dtype=jnp.float32
    )
    hist = ins_onehot.T @ sem_onehot  # MXU-friendly
    counts = hist[1:]  # drop id 0 (stuff)
    inst_class = jnp.argmax(counts, axis=-1)
    inst_alive = jnp.sum(counts, axis=-1) > 0
    # per-class instance renumbering (reference Counter semantics): id of
    # instance i within its class = 1 + #alive j<i with the same class
    same = (inst_class[:, None] == inst_class[None, :]) & inst_alive[None, :]
    lower = jnp.tril(jnp.ones((num_instances, num_instances), bool), k=-1)
    new_ids = jnp.sum(same & lower, axis=-1) + 1

    pan_thing = inst_class * label_divisor + new_ids
    # paste per-pixel: gather pan id via instance index
    pan = jnp.where(
        is_thing & jnp.take(inst_alive, jnp.maximum(ins_eff - 1, 0)),
        jnp.take(pan_thing, jnp.maximum(ins_eff - 1, 0)),
        void_label,
    )

    # stuff: area over unoccupied pixels, per class
    stuff_pix = ~is_thing
    areas = jnp.zeros((num_classes,), jnp.int32).at[sem_seg.reshape(-1)].add(
        stuff_pix.reshape(-1).astype(jnp.int32)
    )
    stuff_ok = (~thing_mask_per_class) & (areas >= stuff_area)
    pan = jnp.where(
        stuff_pix & jnp.take(stuff_ok, sem_seg),
        sem_seg * label_divisor,
        pan,
    )
    return pan.reshape(h, w)


def get_panoptic_segmentation(
    sem_seg: jax.Array,
    center_heatmap: jax.Array,
    offsets: jax.Array,
    thing_mask_per_class: jax.Array,
    *,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = -1,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
) -> Tuple[jax.Array, jax.Array]:
    """Full panoptic fusion (post_processing.py:164-234), jit-compatible.

    sem_seg (H,W) int class ids, center_heatmap (H,W), offsets (H,W,2)=(dy,dx),
    thing_mask_per_class (C,) bool.  Returns (panoptic (H,W) int32, centers
    (top_k, 2))."""
    num_classes = thing_mask_per_class.shape[0]
    thing_seg = jnp.take(thing_mask_per_class, sem_seg).astype(jnp.int32)
    centers, valid = find_instance_center(
        center_heatmap, threshold, nms_kernel, top_k
    )
    ins = group_pixels(centers, valid, offsets)
    ins = jnp.where(
        jnp.any(valid), ins * thing_seg, jnp.zeros_like(ins)
    )
    pan = merge_semantic_and_instance(
        sem_seg, ins, thing_seg, num_classes, top_k,
        thing_mask_per_class, label_divisor, stuff_area, void_label,
    )
    return pan, centers

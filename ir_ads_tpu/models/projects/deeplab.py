"""DeepLabV3 / DeepLabV3+ semantic-segmentation heads + hard-pixel-mining CE.

Reference: detectron2/projects/DeepLab/deeplab/semantic_seg.py (DeepLabV3Head
:264-348, DeepLabV3PlusHead :16-260) and loss.py (DeepLabCE :6-40).

TPU-native notes: NHWC layout; the ASPP image-pooling branch uses a global
mean (shape-static, fuses under jit) instead of the reference's train-size
AvgPool — the reference itself falls back to adaptive global pooling whenever
``train_size`` is unset.  Hard-pixel mining is a static top-k over the
flattened per-pixel loss (pixel count is static under XLA), matching
DeepLabCE's ``top_k_percent_pixels`` semantics exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import resize_bilinear

Dtype = Any


def _conv_bn_relu(x, features, kernel, name, dtype, train, dilation=1):
    pad = dilation * (kernel - 1) // 2
    x = nn.Conv(
        features,
        (kernel, kernel),
        padding=pad,
        kernel_dilation=dilation,
        use_bias=False,
        dtype=dtype,
        name=f"{name}_conv",
    )(x)
    x = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=f"{name}_bn",
    )(x)
    return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference detectron2/layers/aspp.py):
    1x1 conv + three dilated 3x3 convs + image pooling, concat, 1x1 project."""

    out_channels: int = 256
    dilations: Sequence[int] = (6, 12, 18)
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        branches = [_conv_bn_relu(x, self.out_channels, 1, "b0", self.dtype, train)]
        for i, d in enumerate(self.dilations):
            branches.append(
                _conv_bn_relu(
                    x, self.out_channels, 3, f"b{i + 1}", self.dtype, train,
                    dilation=d,
                )
            )
        # image pooling: global mean -> 1x1 conv -> broadcast back
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _conv_bn_relu(
            pooled, self.out_channels, 1, "pool", self.dtype, train
        )
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        y = _conv_bn_relu(y, self.out_channels, 1, "project", self.dtype, train)
        if train and self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=False)
        return y


def deeplab_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    top_k_percent_pixels: float = 1.0,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Hard-pixel-mining cross entropy (DeepLabCE, loss.py:6-40).

    logits (B,H,W,C) float, labels (B,H,W) int.  With top_k < 1.0 only the
    top-k% highest per-pixel losses contribute (hard example mining)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pix = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pix = jnp.where(valid, pix, 0.0)
    if weights is not None:
        pix = pix * weights
    flat = pix.reshape(-1)
    # Reference normalization (DeepLabCE loss.py:33-40): pixel_losses.mean()
    # divides by ALL pixels — ignored pixels contribute 0 to the numerator
    # but still count in the denominator; the top-k path divides by k.
    if top_k_percent_pixels >= 1.0:
        return jnp.sum(flat) / flat.shape[0]
    k = max(int(top_k_percent_pixels * flat.shape[0]), 1)
    top, _ = jax.lax.top_k(flat, k)
    return jnp.sum(top) / k


class DeepLabV3Head(nn.Module):
    """Single-scale ASPP head (semantic_seg.py:264-348): ASPP on the deepest
    feature, 1x1 predictor, upsample by ``common_stride`` at inference."""

    num_classes: int
    aspp_channels: int = 256
    dilations: Sequence[int] = (6, 12, 18)
    common_stride: int = 16
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = ASPP(
            self.aspp_channels, self.dilations, self.dropout,
            dtype=self.dtype, name="aspp",
        )(x, train)
        y = nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="predictor",
        )(y)
        if not train:
            h, w = y.shape[1] * self.common_stride, y.shape[2] * self.common_stride
            y = resize_bilinear(y, (h, w), align_corners=False)
        return y


class DeepLabV3PlusHead(nn.Module):
    """Encoder-decoder head (semantic_seg.py:16-260).

    ``features`` are ordered shallow→deep (stride ascending, e.g. res2..res5);
    the deepest goes through ASPP, shallower levels are 1x1-projected and
    fused top-down with two 3x3 convs (or one 5x5 depthwise-separable pair
    when ``use_depthwise_separable_conv``).

    ``num_classes=None`` gives the decoder-only form used by Panoptic-DeepLab.
    """

    num_classes: Optional[int] = None
    project_channels: Sequence[int] = (48,)
    decoder_channels: Sequence[int] = (256, 256)
    dilations: Sequence[int] = (6, 12, 18)
    common_stride: int = 4
    dropout: float = 0.1
    use_depthwise_separable_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, features: Sequence[jax.Array], train: bool = False
    ) -> jax.Array:
        assert len(self.project_channels) == len(features) - 1
        assert len(self.decoder_channels) == len(features)
        y = ASPP(
            self.decoder_channels[-1], self.dilations, self.dropout,
            dtype=self.dtype, name="aspp",
        )(features[-1], train)
        for idx in range(len(features) - 2, -1, -1):
            proj = _conv_bn_relu(
                features[idx], self.project_channels[idx], 1,
                f"project_{idx}", self.dtype, train,
            )
            y = resize_bilinear(y, proj.shape[1:3], align_corners=False)
            y = jnp.concatenate([proj, y], axis=-1)
            if self.use_depthwise_separable_conv:
                # 5x5 DW-separable pair == two 3x3 convs' receptive field
                # (Panoptic-DeepLab trick, semantic_seg.py:133-146)
                mid = y.shape[-1]
                y = nn.Conv(
                    mid, (5, 5), padding=2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name=f"fuse_{idx}_dw",
                )(y)
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"fuse_{idx}_dwbn",
                )(y)
                y = nn.relu(y)
                y = _conv_bn_relu(
                    y, self.decoder_channels[idx], 1,
                    f"fuse_{idx}_pw", self.dtype, train,
                )
            else:
                y = _conv_bn_relu(
                    y, self.decoder_channels[idx], 3,
                    f"fuse_{idx}_a", self.dtype, train,
                )
                y = _conv_bn_relu(
                    y, self.decoder_channels[idx], 3,
                    f"fuse_{idx}_b", self.dtype, train,
                )
        if self.num_classes is not None:
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

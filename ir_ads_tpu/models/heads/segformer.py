"""SegFormer all-MLP decode head (reference semseg/models/heads/segformer.py).

Reference compute order: per-scale linear projection → bilinear upsample to
the 1/4-scale grid → channel concat (c4..c1) → 1x1-conv fuse (BN+ReLU) →
dropout → 1x1 class prediction.

TPU re-association (exact algebra, same parameters): the 1x1 fuse conv over
the concat is a sum of per-level 512x512 blocks, and bilinear resize is
linear and channel-pointwise, so

    fuse(concat_i(resize(proj_i(f_i)))) == sum_i resize((W_ci @ W_fuse_i)(f_i))

Composing each level's projection with its fuse block collapses two matmuls
into one *executed at the level's own resolution*, eliminating the
(B, H/4, W/4, 4*embed) concat tensor (~630 MB at 480p batch 8) and cutting
the fuse matmul from 20.5 to 2.4 GMACs.  The parameter tree (linear_c{k},
linear_fuse, fuse_bn, linear_pred) is byte-identical to the naive module, so
torch-checkpoint import (utils/torch_import.py) and init distributions are
unchanged.  NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import resize_bilinear, trunc_normal_init


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree ({kernel, bias})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", trunc_normal_init(), (self.in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvKernel(nn.Module):
    """Parameter container matching a bias-free 1x1 nn.Conv ({kernel})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )


class SegFormerHead(nn.Module):
    embed_dim: int = 256
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        features: Sequence[jax.Array],
        train: bool = False,
    ) -> jax.Array:
        h, w = features[0].shape[1], features[0].shape[2]
        num_levels = len(features)
        e = self.embed_dim

        fuse_kernel = _ConvKernel(
            num_levels * e, e, name="linear_fuse"
        )().reshape(num_levels * e, e)

        acc = None
        for i, feat in enumerate(features):
            k, b = _DenseParams(
                feat.shape[-1], e, name=f"linear_c{i + 1}"
            )()
            # reference concatenates reversed (c4..c1): level i's fuse block
            blk = fuse_kernel[(num_levels - 1 - i) * e : (num_levels - i) * e]
            wc = k @ blk  # composed (C_i, e), computed in param dtype (f32)
            bc = b @ blk
            if self.dtype is not None:
                feat, wc, bc = (
                    feat.astype(self.dtype),
                    wc.astype(self.dtype),
                    bc.astype(self.dtype),
                )
            from ir_ads_tpu.ops.int8 import int8_enabled, quantized_matmul

            if int8_enabled():
                # int8 MXU eval path on the composed projection (exact same
                # folded weights, w8a8 dynamic quantization)
                y = (
                    quantized_matmul(feat, wc.astype(jnp.float32)).astype(
                        feat.dtype
                    )
                    + bc
                )
            else:
                y = feat @ wc + bc
            if i > 0:
                y = resize_bilinear(y, (h, w), align_corners=False)
            acc = y if acc is None else acc + y

        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="fuse_bn",
        )(acc)
        x = nn.relu(x)
        if train and self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=False)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="linear_pred")(
            x
        )
        return x

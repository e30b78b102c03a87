"""CMX fusion modules: Feature Rectify (FRM) + Feature Fusion (FFM).

Reference: semseg/models/modules/ffm.py:9-188 — channel+spatial rectify
weights exchanged between modalities, then a linear-attention cross path
with channel embedding.  NHWC flax.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import trunc_normal_init

Dtype = Any


class FeatureRectifyModule(nn.Module):
    """FRM (ffm.py:9-79): each modality is corrected by channel- and
    spatial-weighted contributions of the other."""

    reduction: int = 1
    lambda_c: float = 0.5
    lambda_s: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array):
        b, h, w, c = x1.shape
        x = jnp.concatenate([x1, x2], axis=-1)  # (B, H, W, 2C)
        avg = x.mean((1, 2))
        mx = x.max((1, 2))
        y = jnp.concatenate([avg, mx], axis=-1)  # (B, 4C)
        y = nn.Dense(4 * c // self.reduction, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="ch_fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(2 * c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="ch_fc2")(y)
        cw = jax.nn.sigmoid(y).reshape(b, 2, c)  # [0]=for x2, [1]=for x1

        s = nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype,
                    name="sp_conv1")(x)
        s = nn.relu(s)
        s = nn.Conv(2, (1, 1), dtype=self.dtype, name="sp_conv2")(s)
        sw = jax.nn.sigmoid(s)  # (B, H, W, 2)

        out1 = (
            x1
            + self.lambda_c * cw[:, 1][:, None, None, :] * x2
            + self.lambda_s * sw[..., 1:2] * x2
        )
        out2 = (
            x2
            + self.lambda_c * cw[:, 0][:, None, None, :] * x1
            + self.lambda_s * sw[..., 0:1] * x1
        )
        return out1, out2


class _CrossLinearAttention(nn.Module):
    """Linear cross attention (ffm.py:85-110): context = softmax(k^T v),
    queries read the OTHER modality's context."""

    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array):
        b, n, c = x1.shape
        hd = c // self.num_heads
        scale = hd**-0.5

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q1, q2 = heads(x1), heads(x2)
        kv1 = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="kv1")(x1)
        kv2 = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="kv2")(x2)
        k1, v1 = heads(kv1[..., :c]), heads(kv1[..., c:])
        k2, v2 = heads(kv2[..., :c]), heads(kv2[..., c:])

        def ctx(k, v):
            a = jnp.einsum("bhnd,bhne->bhde", k, v,
                           preferred_element_type=jnp.float32) * scale
            return jax.nn.softmax(a, axis=-2).astype(v.dtype)

        y1 = jnp.einsum("bhnd,bhde->bhne", q1, ctx(k2, v2),
                        preferred_element_type=jnp.float32).astype(x1.dtype)
        y2 = jnp.einsum("bhnd,bhde->bhne", q2, ctx(k1, v1),
                        preferred_element_type=jnp.float32).astype(x2.dtype)
        merge = lambda t: t.transpose(0, 2, 1, 3).reshape(b, n, c)
        return merge(y1), merge(y2)


class FeatureFusionModule(nn.Module):
    """FFM (ffm.py:113-188): cross path + channel embed -> fused map."""

    num_heads: int = 8
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False):
        b, h, w, c = x1.shape
        t1 = x1.reshape(b, h * w, c)
        t2 = x2.reshape(b, h * w, c)
        r = c // self.reduction

        p1 = nn.relu(nn.Dense(2 * r, dtype=self.dtype,
                              kernel_init=trunc_normal_init(),
                              name="channel_proj1")(t1))
        p2 = nn.relu(nn.Dense(2 * r, dtype=self.dtype,
                              kernel_init=trunc_normal_init(),
                              name="channel_proj2")(t2))
        y1, u1 = p1[..., :r], p1[..., r:]
        y2, u2 = p2[..., :r], p2[..., r:]
        v1, v2 = _CrossLinearAttention(self.num_heads, dtype=self.dtype,
                                       name="cross_attn")(u1, u2)
        o1 = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                      name="end_proj1")(jnp.concatenate([y1, v1], -1))
        o2 = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                      name="end_proj2")(jnp.concatenate([y2, v2], -1))
        t1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(t1 + o1)
        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(t2 + o2)

        merge = jnp.concatenate([t1, t2], axis=-1).reshape(b, h, w, 2 * c)
        residual = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                           name="residual")(merge)
        e = nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype,
                    name="embed_conv1")(merge)
        e = nn.Conv(c // self.reduction, (3, 3), padding=1,
                    feature_group_count=c // self.reduction,
                    dtype=self.dtype, name="embed_dw")(e)
        e = nn.relu(e)
        e = nn.Conv(c, (1, 1), dtype=self.dtype, name="embed_conv2")(e)
        e = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="embed_bn")(e)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="out_bn")(
            residual + e
        )
        return out
